"""Pallas TPU kernel: paged GQA decode attention over a block pool.

The paged-KV companion of decode_attention.py (reference capability:
TRT-LLM paged KV + flashinfer-style block attention,
`tensorrt_tts/PIPELINE_REPORT.md:58-64`, SURVEY.md §2.2). The XLA paged
path (models/llama.py) must first GATHER the window's blocks into a dense
(B, W, Hkv, D) temp — paying the window's HBM bytes twice. This kernel
instead streams each pool block through VMEM exactly once: the grid is
(slot, window-super-block) and the K/V BlockSpec index_maps read the block
table (a scalar-prefetch operand) to DMA pool rows `table[i, j*m+t]`
directly.

Layout lessons, all measured with tools/kv_kernel_bench.py (B=64 W=512 /
B=4 W=12288 serving shapes):

1. **Head-batched pools** (N, Hkv, bs, D) — heads on axis 1, positions on
   axis 2. The original position-major layout forced one dot_general
   launch per kv head per block; all dtypes clustered at ~1.4 µs per grid
   step (launch-bound, 366–537 µs/layer-step). Batching the head axis
   into ONE dot per block halves that twice over: int8 473 → 187 µs at
   B=64 and 685 → 266 µs at the long-audio shape.
2. **Transposed scale pools** (N, Hkv, bs) — heads-minor (bs, Hkv) f32
   scales tile-pad 8→128 lanes in HBM; the padded scale DMA made int8
   SLOWER than bf16 pools. Scales apply AFTER the integer dots (score
   columns / probability rows — equal to dequantizing first, by
   linearity), so K/V bytes feed the MXU straight from the DMA.
3. **Multi-block grid steps** (`BLOCKS_PER_STEP` = m): even head-batched,
   the B=64 serving shape ran at ~0.70 µs per grid step against ~0.41 µs
   of DMA — still overhead-bound (round-3 step attribution: attention was
   4.96 of the 11.8 ms step, tools/step_bench.py). One grid step now DMAs
   m table-indexed pool blocks as m separate operands, concatenates them
   in VMEM, and runs ONE dot over m·bs positions — m× fewer grid steps
   and dot launches for the same HBM bytes.

Shapes (N = pool blocks, bs = block size, Hkv = kv heads, G = query heads
per kv head, D = head dim, WB = window blocks):
    q:     (B, Hkv, G, D)
    k,v:   (N, Hkv, bs, D) — the pool (head-batched layout)
    ks,vs: (N, Hkv, bs) f32 — int8 mode's per-(block, head, position)
           scales (transposed layout)
    table: (B, WB) int32   — pool row of each slot's logical block
    pos:   (B,) int32      — kv index j attends iff j <= pos[slot]
    out:   (B, Hkv, G, D)

Online softmax across the WB/m grid steps (running max / denominator /
accum in VMEM scratch, sequential grid on TPU) — identical math to flash
attention's streaming pass, vectorized over the head axis.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8  # fp32 sublane tile

# super-block width cap: m pool blocks (m*bs positions) per grid step.
# VMEM per step at m=8, bs=128: K+V int8 2*8*128*128*8 = 2.1 MB (+ double
# buffering) — comfortably inside v5e VMEM while killing grid overhead.
# Env knob for on-chip tuning (PERF.md round-3 third session: the m=8
# microbench win did not transfer to the serving tick — sweep with
# kv_kernel_bench/step_bench before trusting a value).
MAX_BLOCKS_PER_STEP = int(os.environ.get("TTS_PAGED_MBS", "8"))


def _blocks_per_step(wb: int) -> int:
    return min(MAX_BLOCKS_PER_STEP, wb)


def _make_kernel(m: int, quantized: bool):
    """Kernel factory: m pool blocks per grid step; int8 pools if
    `quantized` (with post-dot scale application, see module docstring)."""

    def kernel(table_ref, pos_ref, q_ref, *refs):
        k_refs = refs[0:m]
        v_refs = refs[m:2 * m]
        if quantized:
            ks_refs = refs[2 * m:3 * m]
            vs_refs = refs[3 * m:4 * m]
            o_ref, m_scr, l_scr, acc_scr = refs[4 * m:]
        else:
            o_ref, m_scr, l_scr, acc_scr = refs[2 * m:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        gp = q_ref.shape[2]
        bs = k_refs[0].shape[2]
        d = q_ref.shape[3]
        scale = 1.0 / math.sqrt(d)
        mbs = m * bs

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        col = j * mbs + jax.lax.broadcasted_iota(jnp.int32, (1, gp, mbs), 2)
        valid = col <= pos_ref[i]

        @pl.when(j * mbs <= pos_ref[i])   # skip fully-masked tail steps
        def _block():
            q = q_ref[0].astype(jnp.float32)              # (Hkv, Gp, D)
            k = jnp.concatenate(
                [r[0] for r in k_refs], axis=1
            ).astype(jnp.float32)                         # (Hkv, m*bs, D)
            v = jnp.concatenate(
                [r[0] for r in v_refs], axis=1).astype(jnp.float32)
            # ONE batched dot over the head axis (vs one launch per head —
            # the launch-bound regime this layout exists to kill)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale                                     # (Hkv, Gp, m*bs)
            if quantized:
                ksc = jnp.concatenate(
                    [r[0] for r in ks_refs], axis=1)[:, None, :]
                vsc = jnp.concatenate(
                    [r[0] for r in vs_refs], axis=1)[:, None, :]
                s = s * ksc
            s = jnp.where(valid, s, -1e30)
            m_prev = m_scr[:, :, :1]                      # (Hkv, Gp, 1)
            l_prev = l_scr[:, :, :1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)               # rescale old accum
            p = jnp.exp(s - m_new)                        # (Hkv, Gp, m*bs)
            l_new = l_prev * alpha + jnp.sum(p, -1, keepdims=True)
            if quantized:
                p = p * vsc
            pv = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                             # (Hkv, Gp, D)
            acc_scr[...] = acc_scr[...] * alpha + pv
            m_scr[:, :, :1] = m_new
            l_scr[:, :, :1] = l_new

        @pl.when(j == pl.num_programs(1) - 1)
        def _finalize():
            denom = jnp.maximum(l_scr[:, :, :1], 1e-30)
            o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)

    return kernel


def _kv_specs(m: int, wb: int, hkv: int, bs: int, d: int):
    """m table-indexed pool-block specs: operand t of super-block j DMAs
    pool row table[i, j*m + t]. When m does not divide WB (e.g. the
    long-audio engine's 95-block window), the ceil-grid's tail indices
    clamp to the last window block — those positions sit beyond `pos` and
    the kernel's column mask discards them."""
    def imap(t, i, j, table, pos):
        idx = jnp.minimum(j * m + t, wb - 1)
        return (table[i, idx], 0, 0, 0)

    return [
        pl.BlockSpec((1, hkv, bs, d), functools.partial(imap, t),
                     memory_space=pltpu.VMEM)
        for t in range(m)
    ]


def _sc_specs(m: int, wb: int, hkv: int, bs: int):
    def imap(t, i, j, table, pos):
        idx = jnp.minimum(j * m + t, wb - 1)
        return (table[i, idx], 0, 0)

    return [
        pl.BlockSpec((1, hkv, bs), functools.partial(imap, t),
                     memory_space=pltpu.VMEM)
        for t in range(m)
    ]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_paged_attention(q, k_pool, v_pool, table, pos, *,
                            interpret=False):
    b, hkv, gp, d = q.shape
    bs = k_pool.shape[2]
    wb = table.shape[1]
    m = _blocks_per_step(wb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # table, pos
        grid=(b, -(-wb // m)),
        in_specs=[
            pl.BlockSpec((1, hkv, gp, d),
                         lambda i, j, table, pos: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *(_kv_specs(m, wb, hkv, bs, d) * 2),
        ],
        out_specs=pl.BlockSpec((1, hkv, gp, d),
                               lambda i, j, table, pos: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv, gp, 128), jnp.float32),   # running max
            pltpu.VMEM((hkv, gp, 128), jnp.float32),   # running denom
            pltpu.VMEM((hkv, gp, d), jnp.float32),     # output accum
        ],
    )
    return pl.pallas_call(
        _make_kernel(m, quantized=False),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gp, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hkv * gp * wb * bs * d * 2,
            bytes_accessed=(b * wb * bs * hkv * d * 2) * 2
            + b * hkv * gp * d * 4,
            transcendentals=b * hkv * gp * wb * bs,
        ),
    )(table.astype(jnp.int32), pos.astype(jnp.int32), q,
      *([k_pool] * m), *([v_pool] * m))


def paged_decode_attention(
    q: jnp.ndarray,        # (B, Hkv, G, D)
    k_pool: jnp.ndarray,   # (N, Hkv, bs, D) — head-batched pool layout
    v_pool: jnp.ndarray,   # (N, Hkv, bs, D)
    table: jnp.ndarray,    # (B, WB) int32 — window's block rows per slot
    pos: jnp.ndarray,      # (B,) int32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hkv, g, d = q.shape
    gp = max(SUBLANE, ((g + SUBLANE - 1) // SUBLANE) * SUBLANE)
    if gp != g:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    out = _pallas_paged_attention(q, k_pool, v_pool, table, pos,
                                  interpret=interpret)
    return out[:, :, :g] if gp != g else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_paged_attention_int8(q, k_pool, v_pool, ks_pool, vs_pool,
                                 table, pos, *, interpret=False):
    b, hkv, gp, d = q.shape
    bs = k_pool.shape[2]
    wb = table.shape[1]
    m = _blocks_per_step(wb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # table, pos
        grid=(b, -(-wb // m)),
        in_specs=[
            pl.BlockSpec((1, hkv, gp, d),
                         lambda i, j, table, pos: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *(_kv_specs(m, wb, hkv, bs, d) * 2),
            *(_sc_specs(m, wb, hkv, bs) * 2),
        ],
        out_specs=pl.BlockSpec((1, hkv, gp, d),
                               lambda i, j, table, pos: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv, gp, 128), jnp.float32),   # running max
            pltpu.VMEM((hkv, gp, 128), jnp.float32),   # running denom
            pltpu.VMEM((hkv, gp, d), jnp.float32),     # output accum
        ],
    )
    return pl.pallas_call(
        _make_kernel(m, quantized=True),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gp, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hkv * gp * wb * bs * d * 2,
            bytes_accessed=(b * wb * bs * hkv * d) * 2
            + b * wb * bs * hkv * 4 * 2 + b * hkv * gp * d * 4,
            transcendentals=b * hkv * gp * wb * bs,
        ),
    )(table.astype(jnp.int32), pos.astype(jnp.int32), q,
      *([k_pool] * m), *([v_pool] * m), *([ks_pool] * m), *([vs_pool] * m))


def paged_decode_attention_int8(
    q: jnp.ndarray,         # (B, Hkv, G, D)
    k_pool: jnp.ndarray,    # (N, Hkv, bs, D) int8 — head-batched layout
    v_pool: jnp.ndarray,    # (N, Hkv, bs, D) int8
    ks_pool: jnp.ndarray,   # (N, Hkv, bs) fp32 scales (transposed layout)
    vs_pool: jnp.ndarray,   # (N, Hkv, bs) fp32 scales
    table: jnp.ndarray,     # (B, WB) int32 — window's block rows per slot
    pos: jnp.ndarray,       # (B,) int32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paged GQA decode attention over int8 K/V pools (the kernel the
    highest-capacity serving config needs: paged + int8 KV used to fall
    off onto the 2.1×-slower XLA gather, VERDICT r2 Missing #4)."""
    b, hkv, g, d = q.shape
    gp = max(SUBLANE, ((g + SUBLANE - 1) // SUBLANE) * SUBLANE)
    if gp != g:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    out = _pallas_paged_attention_int8(q, k_pool, v_pool, ks_pool, vs_pool,
                                       table, pos, interpret=interpret)
    return out[:, :, :g] if gp != g else out


def paged_decode_attention_int8_reference(q, k_pool, v_pool, ks_pool,
                                          vs_pool, table, pos):
    """jnp twin: gather + dequantize the window, then dense attention.

    Pools use the kernel's head-batched (N, Hkv, bs, D) layout; scales the
    transposed (N, Hkv, bs) layout."""
    b, hkv, g, d = q.shape
    bs = k_pool.shape[2]
    wb = table.shape[1]
    k = (k_pool[table].astype(jnp.float32)
         * ks_pool[table][..., None])                # (B, WB, Hkv, bs, D)
    v = (v_pool[table].astype(jnp.float32)
         * vs_pool[table][..., None])
    k = jnp.moveaxis(k, 2, 3).reshape(b, wb * bs, hkv, d)
    v = jnp.moveaxis(v, 2, 3).reshape(b, wb * bs, hkv, d)
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhgd,bkhd->bhgk", q.astype(jnp.float32), k) * scale
    col = jnp.arange(wb * bs)[None, None, None, :]
    s = jnp.where(col <= pos[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bkhd->bhgd", p, v)
    return o.astype(q.dtype)


def paged_decode_attention_reference(q, k_pool, v_pool, table, pos):
    """jnp twin: gather the window then dense masked attention
    (head-batched (N, Hkv, bs, D) pool layout)."""
    b, hkv, g, d = q.shape
    bs = k_pool.shape[2]
    wb = table.shape[1]
    k = jnp.moveaxis(k_pool[table], 2, 3).reshape(b, wb * bs, hkv, d)
    v = jnp.moveaxis(v_pool[table], 2, 3).reshape(b, wb * bs, hkv, d)
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhgd,bkhd->bhgk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    col = jnp.arange(wb * bs)[None, None, None, :]
    s = jnp.where(col <= pos[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bkhd->bhgd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)
