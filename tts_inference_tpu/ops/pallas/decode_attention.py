"""Pallas TPU kernel: fused GQA decode attention over a KV window.

One decode token per slot attends to the cache prefix. The kernel fuses
QKᵀ → length-mask → softmax → ·V in VMEM per batch-slot grid cell — no HBM
round trip for attention logits, K/V streamed once.

Shapes (Hkv = kv heads, G = query heads per kv head, W = kv window,
D = head dim):
    q:   (B, Hkv, G, D)
    k,v: (B, W, Hkv, D)
    pos: (B,) int32 — current write position; kv index j attends iff j <= pos
    out: (B, Hkv, G, D)

TPU tiling: blocks are (1, Hkv, Gp, D) for q/out (Gp = G padded to the fp32
sublane tile) and (1, W, Hkv, D) for k/v — last two dims (Hkv=8, D=128) and
(Gp, D) satisfy the (8, 128) tile rule. One grid cell holds a slot's whole
KV window in VMEM: 2·W·Hkv·D bytes (bf16) — ≤8 MB up to W=2048; above that
the caller falls back to the XLA einsum path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8              # fp32 sublane tile
MAX_KERNEL_WINDOW = 2048  # VMEM budget bound for the single-block design


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref):
    # q_ref/o_ref: (1, Hkv, Gp, D); k/v_ref: (1, W, Hkv, D); pos_ref: SMEM (B,)
    b = pl.program_id(0)
    hkv = q_ref.shape[1]
    gp = q_ref.shape[2]
    d = q_ref.shape[3]
    w = k_ref.shape[1]
    scale = 1.0 / math.sqrt(d)
    col = jax.lax.broadcasted_iota(jnp.int32, (gp, w), 1)
    valid = col <= pos_ref[b]

    for h in range(hkv):  # static unroll over kv heads
        q = q_ref[0, h].astype(jnp.float32)            # (Gp, D)
        k = k_ref[0, :, h].astype(jnp.float32)         # (W, D)
        v = v_ref[0, :, h].astype(jnp.float32)         # (W, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                      # (Gp, W)
        s = jnp.where(valid, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom                                      # (Gp, D)
        o_ref[0, h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_decode_attention(q, k, v, pos, *, interpret=False):
    b, hkv, gp, d = q.shape
    w = k.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, gp, d), lambda i, pos: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, hkv, d), lambda i, pos: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, hkv, d), lambda i, pos: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hkv, gp, d), lambda i, pos: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gp, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hkv * gp * w * d * 2,
            bytes_accessed=(b * w * hkv * d * 2) * 2 + b * hkv * gp * d * 4,
            transcendentals=b * hkv * gp * w,
        ),
    )(pos.astype(jnp.int32), q, k, v)


def decode_attention(
    q: jnp.ndarray,      # (B, Hkv, G, D)
    k: jnp.ndarray,      # (B, W, Hkv, D)
    v: jnp.ndarray,      # (B, W, Hkv, D)
    pos: jnp.ndarray,    # (B,) int32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hkv, g, d = q.shape
    w = k.shape[1]
    if w > MAX_KERNEL_WINDOW:
        return decode_attention_reference(q, k, v, pos)
    gp = max(SUBLANE, ((g + SUBLANE - 1) // SUBLANE) * SUBLANE)
    if gp != g:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    out = _pallas_decode_attention(q, k, v, pos, interpret=interpret)
    return out[:, :, :g] if gp != g else out


def decode_attention_reference(q, k, v, pos):
    """jnp twin used for testing and as the non-TPU / long-window fallback."""
    b, hkv, g, d = q.shape
    w = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhgd,bkhd->bhgk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    col = jnp.arange(w)[None, None, None, :]
    s = jnp.where(col <= pos[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bkhd->bhgd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)
