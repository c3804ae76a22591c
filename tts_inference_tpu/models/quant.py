"""Weight-only int8 quantization for the decode path.

The decode step is HBM-bound: at bf16 the 3.3B-param weight read floors it
at ~5.3 ms/token on v5e (measured). Per-channel symmetric int8 halves that
traffic; the int8→bf16 convert fuses into the matmul in VMEM (no
materialized bf16 copy). This replaces the role of the reference's
bitsandbytes 4-bit loads (SURVEY.md §2.2) on the serving side, with
per-output-channel scales for quality.

Leaves become QuantLinear / QuantEmbed pytree nodes; models/llama.py's mm /
embedding helpers dispatch on leaf type, so quantized and full-precision
params flow through the same model code.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuantLinear(NamedTuple):
    """(in, out) weight as int8 + per-out-channel fp32 scale."""

    w_i8: jnp.ndarray     # (in, out) int8
    scale: jnp.ndarray    # (out,) float32


class QuantEmbed(NamedTuple):
    """(V, H) embedding as int8 + per-row fp32 scale (also the tied head)."""

    w_i8: jnp.ndarray     # (V, H) int8
    scale: jnp.ndarray    # (V,) float32


class QuantLinearI4(NamedTuple):
    """(in, out) weight as packed int4 + per-(group, out-channel) scales.

    Two int4 values per int8 byte, global split-half packed along the
    `in` dimension (ops/pallas/int4_matmul.py docstring has the layout).
    The out dimension of ``w_p`` may be lane-padded to a multiple of 128;
    ``scale.shape[1]`` is the true out width and ``in // scale.shape[0]``
    the group size — both recoverable from shapes alone, so the pytree
    stays all-array (jit-friendly, no static fields).
    """

    w_p: jnp.ndarray      # (in//2, out_padded) int8
    scale: jnp.ndarray    # (in//group, out) float32


def quantize_linear(w: jnp.ndarray) -> QuantLinear:
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0          # per out channel
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantLinear(q, scale)


def quantize_embed(w: jnp.ndarray) -> QuantEmbed:
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=1) / 127.0          # per row
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[:, None]), -127, 127).astype(jnp.int8)
    return QuantEmbed(q, scale)


# quantization group along `in`; == the kernel's packed-K tile, so scales
# apply to partial sums, not per element (the VPU-cost analysis in
# ops/pallas/int4_matmul.py). AWQ-style 128 groups cut matmul error ~13%
# (rel_rms 0.118 vs 0.133, PERF.md int4 campaign) at the cost of 4× the
# K-grid steps; both are kernel-supported — pick via TTS_INT4_GROUP or
# `cli quantize --int4-group` (group is recovered from shapes at load).
I4_GROUP = 512


def _i4_group() -> int:
    """Env-tunable at call time (TTS_INT4_GROUP), so `cli quantize` and
    serve boots pick it up without import-order games."""
    return int(os.environ.get("TTS_INT4_GROUP", str(I4_GROUP)))


def quantize_linear_i4(w: jnp.ndarray, group: int = I4_GROUP) -> QuantLinearI4:
    """Per-group symmetric int4: scale = group absmax / 7, q ∈ [-7, 7].

    The group shrinks so it tiles each packed K-half (small `in` dims — the
    tiny test config); out dims below the 128-lane tile are zero-padded in
    the packed array only.
    """
    from tts_inference_tpu.ops.pallas.int4_matmul import (
        pack_int4, pick_group)

    k, n = w.shape
    group = pick_group(k, group)
    wf = w.astype(jnp.float32).reshape(k // group, group, n)
    scale = jnp.max(jnp.abs(wf), axis=1) / 7.0            # (K/G, N)
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7)
    q = q.reshape(k, n).astype(jnp.int32)
    n_pad = ((n + 127) // 128) * 128
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n)))
    return QuantLinearI4(pack_int4(q), scale)


_LINEAR_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_llama_params(
    params: Dict, *, quantize_embed_table: bool = True, bits: int = 8,
    group: Optional[int] = None,
) -> Dict:
    """Full params tree → quantized tree (norms stay fp; done layer by layer
    so peak memory holds one extra layer, not two full models).

    bits=8: per-out-channel int8 everywhere (the serving default).
    bits=4: per-group int4 for the per-layer linears — the bulk of the
    decode weight read (2.83 of 3.3 GB at int8) — while the embedding and
    tied head stay int8: logit quality gates token selection directly, and
    the sliced-head decode already reads only the audio-vocab rows.
    """
    assert bits in (8, 4), bits
    if bits == 4:
        qlin = functools.partial(quantize_linear_i4,
                                 group=group or _i4_group())
    else:
        qlin = quantize_linear
    out = dict(params)
    layers = []
    for lp in params["layers"]:
        nlp = dict(lp)
        for k in _LINEAR_KEYS:
            nlp[k] = qlin(lp[k])
        layers.append(nlp)
    out["layers"] = layers
    if quantize_embed_table:
        out["embed"] = quantize_embed(params["embed"])
    if "lm_head" in params:
        out["lm_head"] = quantize_linear(params["lm_head"])
    return out


def mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w for plain or QuantLinear/I4 weights (convert fused into the dot)."""
    if isinstance(w, QuantLinearI4):
        from tts_inference_tpu.ops.pallas import int4_matmul

        if jax.default_backend() == "tpu":
            return int4_matmul.int4_mm(x, w.w_p, w.scale)
        return int4_matmul.int4_mm_reference(x, w.w_p, w.scale)
    if isinstance(w, QuantLinear):
        y = jnp.dot(x, w.w_i8.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        return (y * w.scale).astype(x.dtype)
    return x @ w


def embed_rows(emb, tokens: jnp.ndarray, dtype) -> jnp.ndarray:
    """Embedding gather for plain or QuantEmbed tables."""
    if isinstance(emb, QuantEmbed):
        rows = emb.w_i8[tokens].astype(jnp.float32)
        return (rows * emb.scale[tokens][..., None]).astype(dtype)
    return emb[tokens].astype(dtype)


def tied_logits(hidden: jnp.ndarray, emb, base: int = 0) -> jnp.ndarray:
    """hidden (…, H) × embedding (V, H)ᵀ → fp32 logits (…, V - base).

    ``base`` (static) drops the head's first `base` rows from the matmul —
    a lazy slice of the parameter, so XLA never reads the skipped rows from
    HBM (the sliced-head decode path, protocol.HEAD_SLICE_BASE).
    """
    if isinstance(emb, QuantEmbed):
        logits = jnp.einsum(
            "...h,vh->...v", hidden, emb.w_i8[base:].astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
        return logits * emb.scale[base:]
    return jnp.einsum(
        "...h,vh->...v", hidden, emb[base:],
        preferred_element_type=jnp.float32,
    )


def head_logits(hidden: jnp.ndarray, w, base: int = 0) -> jnp.ndarray:
    if isinstance(w, QuantLinear):
        logits = jnp.einsum(
            "...h,hv->...v", hidden, w.w_i8[:, base:].astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
        return logits * w.scale[base:]
    return jnp.einsum(
        "...h,hv->...v", hidden, w[:, base:],
        preferred_element_type=jnp.float32,
    )


# -- offline-quantized checkpoint codec ---------------------------------------
# A quantized params tree contains QuantLinear/QuantEmbed/QuantLinearI4
# NamedTuples, which orbax restores as anonymous containers. to_plain/
# from_plain round-trip them through marker-keyed dicts (all leaves stay
# arrays), so `cli quantize` can save a pre-quantized checkpoint once and
# serving boots skip the minutes-long eager re-quantization of the 3B tree
# (the weight-side analog of the TRT save-engine/reload flow).

_QKINDS = {
    "__q_linear_i8__": QuantLinear,
    "__q_embed_i8__": QuantEmbed,
    "__q_linear_i4__": QuantLinearI4,
}
_QMARKERS = {v: k for k, v in _QKINDS.items()}


def to_plain(tree):
    """Quantized params tree → plain dict/list pytree (orbax-safe)."""
    t = type(tree)
    if t in _QMARKERS:
        return {_QMARKERS[t]: dict(tree._asdict())}
    if isinstance(tree, dict):
        return {k: to_plain(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [to_plain(v) for v in tree]
    return tree


def from_plain(tree):
    """Inverse of to_plain: rebuild the quantized NamedTuples."""
    if isinstance(tree, dict):
        if len(tree) == 1:
            key = next(iter(tree))
            if key in _QKINDS:
                fields = tree[key]
                cls = _QKINDS[key]
                return cls(**{f: fields[f] for f in cls._fields})
        return {k: from_plain(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [from_plain(v) for v in tree]
    return tree
