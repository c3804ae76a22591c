"""Device mesh + sharding rules (pjit TP/DP over ICI).

The reference's parallelism is pass-through flags to third-party engines,
always 1 (`tensor_parallel_size=1`, `modal_audio_stream.py:226`;
SURVEY.md §2.3) — multi-GPU serving is its roadmap, not its code. Here
parallelism is first-party: a `jax.sharding.Mesh` with axes

    dp — data parallel (request slots / training batch)
    tp — tensor parallel (attention heads + FFN columns, over ICI)

and PartitionSpec rules for the Llama params, KV cache, and batch state.
XLA inserts the collectives (psum on row-parallel matmuls) — no NCCL analog
needed (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tts_inference_tpu.config import MeshConfig, ModelConfig


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.dp, cfg.tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def validate_tp(model_cfg: ModelConfig, tp: int) -> None:
    if model_cfg.num_key_value_heads % tp:
        raise ValueError(
            f"num_key_value_heads={model_cfg.num_key_value_heads} not "
            f"divisible by tp={tp}"
        )
    if model_cfg.num_attention_heads % tp:
        raise ValueError("num_attention_heads not divisible by tp")
    if model_cfg.intermediate_size % tp:
        raise ValueError("intermediate_size not divisible by tp")


def llama_param_pspecs(model_cfg: ModelConfig) -> Dict[str, Any]:
    """PartitionSpec tree matching models/llama.py params.

    Megatron-style: q/k/v/gate/up column-parallel on tp, o/down
    row-parallel; embedding sharded over vocab (logits einsum contracts the
    replicated hidden against the vocab shard → vocab-sharded logits).
    """
    layer = {
        "input_norm": P(),
        "post_attn_norm": P(),
        "wq": P(None, "tp"),
        "wk": P(None, "tp"),
        "wv": P(None, "tp"),
        "wo": P("tp", None),
        "w_gate": P(None, "tp"),
        "w_up": P(None, "tp"),
        "w_down": P("tp", None),
    }
    specs: Dict[str, Any] = {
        "embed": P("tp", None),
        "final_norm": P(),
        "layers": [dict(layer) for _ in range(model_cfg.num_hidden_layers)],
    }
    if not model_cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
    return specs


def adapt_pspecs(pspecs, params):
    """Adapt a dense-param PartitionSpec tree to the actual params tree.

    int8 weight-only quantization (models/quant.py) replaces weight arrays
    with QuantLinear/QuantEmbed pairs; the int8 tensor keeps the dense
    spec and the per-channel scale shards along its own axis (out-channels
    for linears, vocab rows for embeddings)."""
    from tts_inference_tpu.models.quant import (
        QuantEmbed, QuantLinear, QuantLinearI4)

    def fix(spec, leaf):
        if isinstance(leaf, QuantLinearI4):
            # packed rows halve K but keep its axis (tp split of K/2 rows
            # stays group-aligned for every model dim); the scales are a
            # few rows per group — shard only their out axis and replicate
            # the group dim (it can be smaller than tp)
            out_ax = spec[1] if len(spec) > 1 else None
            return QuantLinearI4(w_p=spec, scale=P(None, out_ax))
        if isinstance(leaf, QuantLinear):
            out_ax = spec[1] if len(spec) > 1 else None
            return QuantLinear(w_i8=spec, scale=P(out_ax))
        if isinstance(leaf, QuantEmbed):
            row_ax = spec[0] if len(spec) > 0 else None
            return QuantEmbed(w_i8=spec, scale=P(row_ax))
        return spec

    return jax.tree.map(
        fix, pspecs, params, is_leaf=lambda x: isinstance(x, P)
    )


def kv_cache_pspecs(model_cfg: ModelConfig, int8: bool = False):
    """KVCache(k, v, lengths[, scales]): slots over dp, kv heads over tp."""
    from tts_inference_tpu.models.llama import KVCache

    spec = P("dp", None, "tp", None)
    sspec = P("dp", None, "tp")
    n = model_cfg.num_hidden_layers
    return KVCache(
        k=tuple(spec for _ in range(n)),
        v=tuple(spec for _ in range(n)),
        lengths=P("dp"),
        k_scale=tuple(sspec for _ in range(n)) if int8 else (),
        v_scale=tuple(sspec for _ in range(n)) if int8 else (),
    )


def paged_kv_cache_pspecs(model_cfg: ModelConfig, int8: bool = False,
                          int4: bool = False):
    """PagedKVCache(k, v, block_table, lengths[, scales]): the block POOL is
    shared by all slots (replicated over dp — any slot's table may point at
    any pool row), kv heads sharded over tp; tables/lengths follow slots.

    Pools are head-batched (N, heads-axis, bs, D) — axis 1 is kv heads
    (fp/int8) or head PAIRS (int4: pair p = heads 2p, 2p+1, so sharding
    pairs over tp keeps contiguous kv-head ranges matching the query-head
    sharding). Scale pools: int8 (N, Hkv, bs) heads over tp; int4 nibble
    planes (N, 2, Hkv/2, bs) pairs over tp.
    """
    from tts_inference_tpu.models.llama import PagedKVCache

    spec = P(None, "tp", None, None)
    sspec = P(None, None, "tp", None) if int4 else P(None, "tp", None)
    n = model_cfg.num_hidden_layers
    quant = int8 or int4
    return PagedKVCache(
        k=tuple(spec for _ in range(n)),
        v=tuple(spec for _ in range(n)),
        block_table=P("dp", None),
        lengths=P("dp"),
        k_scale=tuple(sspec for _ in range(n)) if quant else (),
        v_scale=tuple(sspec for _ in range(n)) if quant else (),
    )


def sampling_state_pspecs():
    """SamplingState(presence, key, in_speech, frame_pos): rows over dp."""
    from tts_inference_tpu.ops.sampling import SamplingState

    return SamplingState(
        presence=P("dp", None),
        key=P("dp", None),
        in_speech=P("dp"),
        frame_pos=P("dp"),
    )


def sampling_params_pspecs():
    """SamplingParams: every field is a per-slot (B,) array → dp rows."""
    from tts_inference_tpu.ops.sampling import SamplingParams

    return SamplingParams(
        temperature=P("dp"),
        top_p=P("dp"),
        top_k=P("dp"),
        repetition_penalty=P("dp"),
        allowed_min=P("dp"),
        allowed_max=P("dp"),
        frame_protocol=P("dp"),
    )


def batch_pspec() -> P:
    return P("dp", None)


def shard_tree(tree, pspec_tree, mesh: Mesh):
    """Place a pytree onto the mesh with the given PartitionSpecs.

    Leaves whose spec is None (or non-array leaves like scalar hyperparams)
    pass through unchanged.
    """
    def place(x, spec):
        if spec is None or not isinstance(spec, P) or x is None:
            return x
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(
        place, tree, pspec_tree,
        is_leaf=lambda x: x is None,
    )


def shardings(tree_pspecs, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), tree_pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
