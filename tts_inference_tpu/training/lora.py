"""LoRA adapters: init, functional apply, weight-space merge.

The reference's training loop (`pretrained_base/modal_finetune_base.py`:
4-bit base + LoRA r=16 α=32 on 7 projection modules; merge via
`merge_and_unload()` in `modal_merge_base.py:28-65`) redone functionally:
adapters are a parallel pytree; training differentiates only the adapter
leaves; serving merges in weight space at load (loader.merge_lora_state for
HF checkpoints, `merge_params` here for in-framework trees).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from tts_inference_tpu.config import ModelConfig

# the reference's 7 target modules (modal_finetune_base.py:108-116)
DEFAULT_TARGETS = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
)


def init_lora(
    key: jax.Array,
    model_cfg: ModelConfig,
    params: Dict,
    *,
    r: int = 16,
    alpha: float = 32.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Dict:
    """A/B pairs per target per layer. A ~ N(0, 1/r) init, B = 0 (standard:
    the merged delta starts at zero)."""
    layers: List[Dict] = []
    keys = jax.random.split(key, model_cfg.num_hidden_layers)
    for li, lp in enumerate(params["layers"]):
        lk = jax.random.split(keys[li], len(targets))
        entry = {}
        for t, k in zip(targets, lk):
            w = lp[t]
            fan_in, fan_out = w.shape
            entry[t] = {
                "A": (jax.random.normal(k, (fan_in, r), jnp.float32)
                      / math.sqrt(r)).astype(w.dtype),
                "B": jnp.zeros((r, fan_out), w.dtype),
            }
        layers.append(entry)
    # scale (α/r) is returned separately: the adapter tree must contain only
    # array leaves so it can be differentiated / sharded wholesale.
    return {"layers": layers}


def lora_scale(r: int, alpha: float) -> float:
    return float(alpha) / float(r)


def merge_params(params: Dict, lora: Dict, scale: float) -> Dict:
    """Weight-space merge: W' = W + (α/r)·A@B (the merge_and_unload analog).

    Returns a new params tree; the base is untouched.
    """
    s = scale
    merged_layers = []
    for lp, le in zip(params["layers"], lora["layers"]):
        nlp = dict(lp)
        for t, ab in le.items():
            delta = (ab["A"].astype(jnp.float32) @ ab["B"].astype(jnp.float32))
            nlp[t] = (lp[t].astype(jnp.float32) + s * delta).astype(lp[t].dtype)
        merged_layers.append(nlp)
    out = dict(params)
    out["layers"] = merged_layers
    return out


def lora_pspecs(model_cfg: ModelConfig, lora: Dict):
    """PartitionSpecs for the adapter tree: A replicated on its r axis,
    sharded like the base weight's input dim; B like the output dim."""
    from jax.sharding import PartitionSpec as P

    col = {"A": P(None, None), "B": P(None, "tp")}   # column-parallel targets
    row = {"A": P("tp", None), "B": P(None, None)}   # row-parallel targets
    kind = {
        "wq": col, "wk": col, "wv": col, "w_gate": col, "w_up": col,
        "wo": row, "w_down": row,
    }
    return {
        "layers": [
            {t: dict(kind[t]) for t in le} for le in lora["layers"]
        ],
    }
