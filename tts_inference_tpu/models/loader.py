"""Checkpoint import: released PyTorch/HF weights → JAX pytrees.

The reference loads third-party checkpoints directly into torch/TRT/vLLM
(`modal_audio_stream.py:106-129`, `build_engine.py:84-94`). Here the import
is an explicit conversion step: torch state dicts (SNAC) and HF safetensors
(Llama/Orpheus) become feature-last JAX pytrees, with weight-norm folded and
LoRA adapters merged in weight space at load time
(the analog of `pretrained_base/modal_merge_base.py:28-65`).

Works from plain numpy dicts — torch is only needed to *read* .pt files and
is imported lazily.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from tts_inference_tpu.config import ModelConfig, SnacConfig


def _np(x) -> np.ndarray:
    """torch tensor / array-like → float32-preserving numpy array."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


# ---------------------------------------------------------------------------
# Weight norm folding
# ---------------------------------------------------------------------------


def fold_weight_norm(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Fold torch weight_norm params into a plain weight.

    Handles both old-style (`weight_g`/`weight_v`) and parametrize-style
    (`parametrizations.weight.original0/1`) checkpoints, plus already-plain
    `weight`. Norm is per-dim-0 slice over all remaining dims (torch default).
    """
    if f"{prefix}.weight" in sd:
        return _np(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_v" in sd:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        raise KeyError(f"no weight found under {prefix}")
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
    return (g / np.maximum(norm, 1e-12)) * v


def _conv_w(sd, prefix) -> np.ndarray:
    """torch Conv1d weight (out, in/g, k) → jax (k, in/g, out)."""
    return fold_weight_norm(sd, prefix).transpose(2, 1, 0)


def _convT_w(sd, prefix) -> np.ndarray:
    """torch ConvTranspose1d weight (in, out, k) → jax (k, in, out)."""
    return fold_weight_norm(sd, prefix).transpose(2, 0, 1)


def _bias(sd, prefix) -> Optional[np.ndarray]:
    key = f"{prefix}.bias"
    return _np(sd[key]) if key in sd else None


def _alpha(sd, prefix) -> np.ndarray:
    """Snake1d alpha (1, dim, 1) → (dim,)."""
    return _np(sd[f"{prefix}.alpha"]).reshape(-1)


# ---------------------------------------------------------------------------
# SNAC decoder import
# ---------------------------------------------------------------------------


def load_snac_torch_state(
    sd: Mapping[str, Any], cfg: SnacConfig
) -> Dict:
    """Official snac-package state dict → our vocoder pytree.

    Decoder Sequential layout (snac/layers.py, depthwise variant):
      model.0 dw-conv7, model.1 pw-conv1, model.2..  DecoderBlock × len(rates),
      then Snake, out conv7, Tanh. DecoderBlock.block: 0 Snake, 1 ConvT,
      2 NoiseBlock(linear)/Identity, 3..5 ResidualUnit(block: Snake, conv7,
      Snake, conv1).
    """
    import jax.numpy as jnp

    def J(x):
        return jnp.asarray(x, dtype=jnp.float32) if x is not None else None

    quant = []
    for i in range(len(cfg.vq_strides)):
        q = f"quantizer.quantizers.{i}"
        quant.append(
            {
                "codebook": J(_np(sd[f"{q}.codebook.weight"])),
                "out_proj": {
                    "w": J(_conv_w(sd, f"{q}.out_proj")),
                    "b": J(_bias(sd, f"{q}.out_proj")),
                },
            }
        )

    base = "decoder.model"
    if cfg.depthwise:
        in_conv = {
            "dw": {"w": J(_conv_w(sd, f"{base}.0")), "b": J(_bias(sd, f"{base}.0"))},
            "pw": {"w": J(_conv_w(sd, f"{base}.1")), "b": J(_bias(sd, f"{base}.1"))},
        }
        block0 = 2
    else:
        in_conv = {
            "conv": {"w": J(_conv_w(sd, f"{base}.0")), "b": J(_bias(sd, f"{base}.0"))}
        }
        block0 = 1

    blocks = []
    for i in range(len(cfg.decoder_rates)):
        b = f"{base}.{block0 + i}.block"
        noise_lin = None
        if f"{b}.2.linear.weight_v" in sd or f"{b}.2.linear.weight" in sd or \
           f"{b}.2.linear.parametrizations.weight.original0" in sd:
            noise_lin = {"w": J(_conv_w(sd, f"{b}.2.linear"))}
        res = []
        for j in (3, 4, 5):
            r = f"{b}.{j}.block"
            res.append(
                {
                    "alpha1": J(_alpha(sd, f"{r}.0")),
                    "conv1": {"w": J(_conv_w(sd, f"{r}.1")), "b": J(_bias(sd, f"{r}.1"))},
                    "alpha2": J(_alpha(sd, f"{r}.2")),
                    "conv2": {"w": J(_conv_w(sd, f"{r}.3")), "b": J(_bias(sd, f"{r}.3"))},
                }
            )
        blocks.append(
            {
                "alpha": J(_alpha(sd, f"{b}.0")),
                "up": {"w": J(_convT_w(sd, f"{b}.1")), "b": J(_bias(sd, f"{b}.1"))},
                "noise_lin": noise_lin,
                "res": res,
            }
        )

    n_out = block0 + len(cfg.decoder_rates)
    return {
        "quantizer": quant,
        "decoder": {
            "in": in_conv,
            "blocks": blocks,
            "out_alpha": J(_alpha(sd, f"{base}.{n_out}")),
            "out_conv": {
                "w": J(_conv_w(sd, f"{base}.{n_out + 1}")),
                "b": J(_bias(sd, f"{base}.{n_out + 1}")),
            },
        },
    }


def load_snac_checkpoint(path: str, cfg: Optional[SnacConfig] = None) -> Tuple[Dict, SnacConfig]:
    """Load a SNAC dir (config.json + pytorch_model.bin) into our pytree."""
    cfg_path = os.path.join(path, "config.json")
    if cfg is None and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            d = json.load(f)
        enc_dim = d.get("encoder_dim", 48)
        enc_rates = d.get("encoder_rates", [2, 4, 8, 8])
        cfg = SnacConfig(
            sampling_rate=d.get("sampling_rate", 24000),
            latent_dim=d.get("latent_dim") or enc_dim * (2 ** len(enc_rates)),
            decoder_dim=d.get("decoder_dim", 1024),
            decoder_rates=tuple(d.get("decoder_rates", [8, 8, 4, 2])),
            codebook_size=d.get("codebook_size", 4096),
            codebook_dim=d.get("codebook_dim", 8),
            vq_strides=tuple(d.get("vq_strides", [4, 2, 1])),
            noise=d.get("noise", True),
            depthwise=d.get("depthwise", True),
        )
    cfg = cfg or SnacConfig()
    import torch  # lazy; only needed to read the pickle

    for name in ("pytorch_model.bin", "model.pt", "snac.pt"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            sd = torch.load(p, map_location="cpu", weights_only=True)
            break
    else:
        raise FileNotFoundError(f"no SNAC weights found under {path}")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return load_snac_torch_state(sd, cfg), cfg


# ---------------------------------------------------------------------------
# Llama / Orpheus import (HF safetensors) + LoRA weight-space merge
# ---------------------------------------------------------------------------


def _read_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors under `path` into one numpy dict."""
    try:
        from safetensors import safe_open
    except ImportError as e:  # pragma: no cover
        raise ImportError("safetensors required for HF checkpoint import") from e
    out: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors in {path}")
    for f in files:
        with safe_open(os.path.join(path, f), framework="np") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


def llama_params_from_hf_state(
    sd: Mapping[str, Any], cfg: ModelConfig, dtype=None
) -> Dict:
    """HF LlamaForCausalLM state dict → our decoder pytree.

    Layout notes: HF stores q/k/v/o as (out, in); we keep (in, out) so the
    matmuls are plain `x @ w` (feature-last, MXU-friendly).
    When dtype is None, the config's own dtype field decides (HF convention:
    config.json `torch_dtype`/`dtype` describes the stored weights).
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "float16": jnp.float16}[cfg.dtype]

    def W(key):  # linear weight (out,in) -> (in,out)
        return jnp.asarray(_np(sd[key]).T, dtype=dtype)

    def V(key):  # vector / embedding kept as-is
        return jnp.asarray(_np(sd[key]), dtype=dtype)

    p = {
        "embed": V("model.embed_tokens.weight"),
        "final_norm": V("model.norm.weight"),
        "layers": [],
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        p["lm_head"] = W("lm_head.weight")
    for i in range(cfg.num_hidden_layers):
        b = f"model.layers.{i}"
        p["layers"].append(
            {
                "input_norm": V(f"{b}.input_layernorm.weight"),
                "post_attn_norm": V(f"{b}.post_attention_layernorm.weight"),
                "wq": W(f"{b}.self_attn.q_proj.weight"),
                "wk": W(f"{b}.self_attn.k_proj.weight"),
                "wv": W(f"{b}.self_attn.v_proj.weight"),
                "wo": W(f"{b}.self_attn.o_proj.weight"),
                "w_gate": W(f"{b}.mlp.gate_proj.weight"),
                "w_up": W(f"{b}.mlp.up_proj.weight"),
                "w_down": W(f"{b}.mlp.down_proj.weight"),
            }
        )
    return p


_LORA_RE = re.compile(
    r"base_model\.model\.(.+)\.lora_(A|B)\.(?:default\.)?weight"
)


def merge_lora_state(
    sd: Dict[str, np.ndarray],
    lora_sd: Mapping[str, Any],
    *,
    scale: Optional[float] = None,
    alpha: float = 32.0,
    r: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Weight-space LoRA merge: W' = W + (alpha/r)·B@A.

    The analog of the reference's merge_and_unload() flow
    (`pretrained_base/modal_merge_base.py:28-65`), done on numpy arrays so it
    composes with any downstream conversion. Returns a new merged state dict.
    """
    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in lora_sd.items():
        m = _LORA_RE.match(k)
        if not m:
            continue
        target, ab = m.group(1), m.group(2)
        pairs.setdefault(target, {})[ab] = _np(v)
    merged = dict(sd)
    for target, ab in pairs.items():
        if "A" not in ab or "B" not in ab:
            continue
        key = f"{target}.weight"
        if key not in merged:
            continue
        A, B = ab["A"], ab["B"]
        rank = r or A.shape[0]
        s = scale if scale is not None else alpha / rank
        merged[key] = merged[key] + s * (B @ A)
    return merged


def read_adapter_config(lora_path: str) -> dict:
    """Read PEFT's adapter_config.json if present (reference adapters carry
    lora_alpha/r there; `merge_and_unload` honors it —
    `pretrained_base/modal_merge_base.py:28-65`). Returns {} when absent."""
    f = os.path.join(lora_path, "adapter_config.json")
    if not os.path.exists(f):
        return {}
    with open(f) as fh:
        return json.load(fh)


def load_llama_checkpoint(
    path: str,
    cfg: Optional[ModelConfig] = None,
    *,
    lora_path: Optional[str] = None,
    dtype=None,
) -> Tuple[Dict, ModelConfig]:
    """Load an HF Llama/Orpheus dir (optionally merging a LoRA adapter)."""
    cfg_file = os.path.join(path, "config.json")
    if cfg is None:
        with open(cfg_file) as f:
            cfg = ModelConfig.from_hf_dict(json.load(f))
    sd = _read_safetensors_dir(path)
    if lora_path is not None:
        lora_sd = _read_safetensors_dir(lora_path)
        acfg = read_adapter_config(lora_path)
        alpha = float(acfg.get("lora_alpha", 32.0))
        r = acfg.get("r")
        # rslora scales by alpha/sqrt(r) instead of alpha/r
        scale = None
        if acfg.get("use_rslora") and r:
            scale = alpha / float(r) ** 0.5
        sd = merge_lora_state(sd, lora_sd, scale=scale, alpha=alpha, r=r)
    return llama_params_from_hf_state(sd, cfg, dtype=dtype), cfg
