"""Pallas TPU kernel: fused GQA decode attention over a KV window.

One decode token per slot attends to the cache prefix. The kernel fuses
QKᵀ → length-mask → softmax → ·V in VMEM per (batch, kv-head) grid cell —
no HBM round trip for attention logits, K/V streamed once. Replaces the
XLA einsum pair in models/llama._attention on the s==1 hot path.

Shapes (G = query heads per kv head, W = kv window, D = head dim):
    q:   (B, Hkv, G, D)
    k,v: (B, W, Hkv, D)
    pos: (B,) int32 — current write position; kv index j attends iff j <= pos
    out: (B, Hkv, G, D)

The G axis (3 for Orpheus: 24 q heads / 8 kv heads) is zero-padded to the
fp32 sublane tile (8); padding rows cost nothing and are sliced off.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8  # fp32 sublane tile


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref):
    # q_ref: (1, 1, Gp, D); k/v_ref: (1, W, 1, D); pos_ref: (B,) SMEM prefetch
    b = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)               # (Gp, D)
    k = k_ref[0, :, 0].astype(jnp.float32)             # (W, D)
    v = v_ref[0, :, 0].astype(jnp.float32)             # (W, D)
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                          # (Gp, W)
    w = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], w), 1)
    s = jnp.where(col <= pos_ref[b], s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom                                          # (Gp, D)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
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
    gp = max(SUBLANE, ((g + SUBLANE - 1) // SUBLANE) * SUBLANE)
    if gp != g:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, gp - g), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, gp, d), lambda i, j, pos: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, 1, d), lambda i, j, pos: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, 1, d), lambda i, j, pos: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, gp, d), lambda i, j, pos: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
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
    return out[:, :, :g] if gp != g else out


def decode_attention_reference(q, k, v, pos):
    """jnp twin used for testing and as the non-TPU fallback."""
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
