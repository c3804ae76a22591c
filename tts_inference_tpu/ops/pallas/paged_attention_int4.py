"""Pallas TPU kernel: paged GQA decode attention over int4 K/V pools.

Why: the KV-read-bound regimes. At 64 active paged slots the serving tick
is 98.6% device decode (PERF.md round-3 attribution), and in the long-audio
engine class (the reference's 12k-token hindi_canopy build,
`tensorrt_tts/hindi_canopy/build_engine.py:61,127-135`) the per-step KV
read at a 12k window dwarfs even the int4 weight read. int8 KV pools
already halve the fp16 bytes; this kernel halves them AGAIN by keeping the
KV pools packed two-int4-per-byte all the way into VMEM.

The design transplants the int4_matmul.py lesson: on v5e any per-element
unpack above ~2 VPU ops/element eats the DMA saving, so the low nibble is
never extracted. Attention is linear in K and V, which gives the same
identity two ways:

    L = P − 16·H − 8        (P = packed byte as signed int, H = P >> 4,
                             low nibble stored offset-encoded: bits = q+8)

    scores:  q_lo·L = q_lo·P − 16·(q_lo·H) − 8·Σq_lo
    output:  p·L    = p·P    − 16·(p·H)    − 8·Σp

so the packed byte matrix P feeds the MXU as-is (one i8→f32 convert) and
only H pays a widening shift. Per-(block, position, head) scales are
applied AFTER the integer dots — to score columns (K side) and probability
rows (V side) — which is exactly equal to dequantizing K/V first, by
linearity.

Packing layout — *head-pair split, head-batched*: kv heads (2p, 2p+1)
share packed pool slab p: head 2p in the low nibble, head 2p+1 in the
high nibble. Pools are (N, Hkv/2, bs, D) — pair-batched on axis 1 like
paged_attention.py's head-batched fp/int8 pools (one batched dot per
block instead of a launch per head; the launch-per-head layout measured
~1.4 µs/grid-step launch-bound, tools/kv_kernel_bench.py). TP shards the
pair axis = contiguous kv-head ranges, matching the query-head sharding —
int4 KV under TP requires tp | Hkv/2 so pairs never split.

Scale pools are (N, 2, Hkv/2, bs): nibble plane 0 = low heads (2p),
plane 1 = high heads (2p+1), positions minor (lane-aligned — a heads-minor
layout tile-pads 8→128 lanes in HBM and the padded DMA costs more than
the saved KV bytes).

Shapes (N = pool blocks, bs = block size, Hkv = kv heads, P2 = Hkv/2,
G = query heads per kv head, D = head dim, WB = window blocks):
    q:       (B, Hkv, G, D)
    kp, vp:  (N, P2, bs, D) int8 — packed pools
    ks, vs:  (N, 2, P2, bs) f32  — per-(block, nibble, pair, position)
    table:   (B, WB) int32       — pool row of each slot's logical block
    pos:     (B,) int32          — kv index j attends iff j <= pos[slot]
    out:     (B, Hkv, G, D)

Grid (slot, window-block) with online softmax across the window blocks —
same streaming-flash structure as paged_attention.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8  # fp32 sublane tile


# ---------------------------------------------------------------------------
# Packing helpers (numpy/jnp agnostic; shared by the cache write path)
# ---------------------------------------------------------------------------


def pack_kv_int4(q4: jnp.ndarray) -> jnp.ndarray:
    """(..., Hkv, D) ints in [-7, 7] → (..., Hkv/2, D) int8, head-pair split.

    Pair slab p holds head 2p (low nibble, offset bits q+8) and head 2p+1
    (high nibble, two's complement).
    """
    hkv = q4.shape[-2]
    assert hkv % 2 == 0, hkv
    pairs = q4.reshape(*q4.shape[:-2], hkv // 2, 2, q4.shape[-1])
    lo = (pairs[..., 0, :].astype(jnp.int32) + 8) & 0x0F
    hi = pairs[..., 1, :].astype(jnp.int32) & 0x0F
    packed = (hi << 4) | lo
    packed = jnp.where(packed >= 128, packed - 256, packed)
    return packed.astype(jnp.int8)


def unpack_kv_int4(packed: jnp.ndarray, hkv: int) -> jnp.ndarray:
    """(..., Hkv/2, D) int8 → (..., Hkv, D) int32 (inverse of pack_kv_int4)."""
    del hkv  # recoverable from the shape; kept for call-site clarity
    p = packed.astype(jnp.int32)
    hi = p >> 4                          # arithmetic: signed high nibble
    lo = (p - (hi << 4)) - 8             # offset-decode
    both = jnp.stack([lo, hi], axis=-2)  # (..., Hkv/2, 2, D)
    return both.reshape(*packed.shape[:-2], packed.shape[-2] * 2,
                        packed.shape[-1])


def quantize_kv_int4(x: jnp.ndarray):
    """(..., Hkv, D) fp → packed (..., Hkv/2, D) int8 + (..., Hkv) f32
    scales (natural head order).

    Symmetric per-(position, head) absmax/7 — the int4 twin of
    llama._quantize_kv.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 7.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -7, 7)
    return pack_kv_int4(q), scale


def scales_to_planes(scale: jnp.ndarray) -> jnp.ndarray:
    """(..., Hkv) natural head order → (..., 2, Hkv/2) nibble planes
    (plane 0 = low heads 2p, plane 1 = high heads 2p+1)."""
    hkv = scale.shape[-1]
    return jnp.swapaxes(
        scale.reshape(*scale.shape[:-1], hkv // 2, 2), -1, -2)


def planes_to_scales(planes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of scales_to_planes: (..., 2, Hkv/2) → (..., Hkv)."""
    p2 = planes.shape[-1]
    return jnp.swapaxes(planes, -1, -2).reshape(*planes.shape[:-2], 2 * p2)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(m: int):
    """Kernel factory: m pool blocks (m·bs positions) per grid step —
    the multi-block grid-overhead fix of paged_attention.py, applied to
    the packed-int4 kernel."""

    def kernel(table_ref, pos_ref, q_ref, *refs):
        # q_ref/o_ref: (1, 2, P2, Gp, D) — nibble plane major (caller
        # arranges); kp/vp refs: m x (1, P2, bs, D) int8 pool blocks
        # table[i, j*m+t]; ks/vs refs: m x (1, 2, P2, bs) f32;
        # scratch m/l (2, P2, Gp, 128), acc (2, P2, Gp, D)
        kp_refs = refs[0:m]
        vp_refs = refs[m:2 * m]
        ks_refs = refs[2 * m:3 * m]
        vs_refs = refs[3 * m:4 * m]
        o_ref, m_scr, l_scr, acc_scr = refs[4 * m:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        gp, d = q_ref.shape[3], q_ref.shape[4]
        bs = kp_refs[0].shape[2]
        mbs = m * bs
        scale = 1.0 / math.sqrt(d)
        dims_t = (((2,), (2,)), ((0,), (0,)))   # batch pairs, contract D
        dims_p = (((2,), (1,)), ((0,), (0,)))   # batch pairs, contract bs

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        col = j * mbs + jax.lax.broadcasted_iota(jnp.int32, (1, gp, mbs), 2)
        valid = col <= pos_ref[i]

        @pl.when(j * mbs <= pos_ref[i])   # skip fully-masked tail steps
        def _block():
            # one widening shift per packed byte; P feeds the MXU as bytes
            pk_raw = jnp.concatenate(
                [r[0] for r in kp_refs], axis=1)           # (P2, mbs, D) i8
            hk = (pk_raw.astype(jnp.int32) >> 4).astype(jnp.float32)
            pk = pk_raw.astype(jnp.float32)
            pv_raw = jnp.concatenate([r[0] for r in vp_refs], axis=1)
            hv = (pv_raw.astype(jnp.int32) >> 4).astype(jnp.float32)
            pv = pv_raw.astype(jnp.float32)

            q_lo = q_ref[0, 0].astype(jnp.float32)         # (P2, Gp, D)
            q_hi = q_ref[0, 1].astype(jnp.float32)
            # K side: q_lo·P and stacked (q_hi, q_lo)·H — 2 batched launches
            d1 = jax.lax.dot_general(
                q_lo, pk, dims_t, preferred_element_type=jnp.float32)
            d23 = jax.lax.dot_general(
                jnp.concatenate([q_hi, q_lo], axis=1), hk, dims_t,
                preferred_element_type=jnp.float32)        # (P2, 2Gp, mbs)
            sum_qlo = jnp.sum(q_lo, axis=2, keepdims=True)  # (P2, Gp, 1)
            s_int = jnp.stack(
                [d1 - 16.0 * d23[:, gp:] - 8.0 * sum_qlo,  # low heads
                 d23[:, :gp]],                             # high heads
                axis=0)                                    # (2, P2, Gp, mbs)
            ksc = jnp.concatenate(
                [r[0] for r in ks_refs], axis=2)[:, :, None, :]
            vsc = jnp.concatenate(
                [r[0] for r in vs_refs], axis=2)[:, :, None, :]
            s = jnp.where(valid, s_int * (ksc * scale), -1e30)
            m_prev = m_scr[:, :, :, :1]                    # (2, P2, Gp, 1)
            l_prev = l_scr[:, :, :, :1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)       # invalid cols: exp(-1e30−m) = 0
            l_new = l_prev * alpha + jnp.sum(p, -1, keepdims=True)
            psc = p * vsc                                  # fold V scales
            # V side: (p_hi', p_lo')·H stacked + p_lo'·P — 2 launches
            dh = jax.lax.dot_general(
                jnp.concatenate([psc[1], psc[0]], axis=1), hv, dims_p,
                preferred_element_type=jnp.float32)        # (P2, 2Gp, D)
            dv1 = jax.lax.dot_general(
                psc[0], pv, dims_p, preferred_element_type=jnp.float32)
            o_lo = dv1 - 16.0 * dh[:, gp:] - 8.0 * jnp.sum(
                psc[0], axis=2, keepdims=True)
            pvp = jnp.stack([o_lo, dh[:, :gp]], axis=0)    # (2, P2, Gp, D)
            acc_scr[...] = acc_scr[...] * alpha + pvp
            m_scr[:, :, :, :1] = m_new
            l_scr[:, :, :, :1] = l_new

        @pl.when(j == pl.num_programs(1) - 1)
        def _finalize():
            denom = jnp.maximum(l_scr[:, :, :, :1], 1e-30)
            o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_paged_attention_int4(q, kp_pool, vp_pool, ks_pool, vs_pool,
                                 table, pos, *, interpret=False):
    from tts_inference_tpu.ops.pallas.paged_attention import _blocks_per_step

    b, two, p2, gp, d = q.shape
    bs = kp_pool.shape[2]
    wb = table.shape[1]
    m = _blocks_per_step(wb)

    def kv_imap(t, i, j, table, pos):
        return (table[i, jnp.minimum(j * m + t, wb - 1)], 0, 0, 0)

    kv_specs = [
        pl.BlockSpec((1, p2, bs, d), functools.partial(kv_imap, t),
                     memory_space=pltpu.VMEM)
        for t in range(m)
    ]
    sc_specs = [
        pl.BlockSpec((1, 2, p2, bs), functools.partial(kv_imap, t),
                     memory_space=pltpu.VMEM)
        for t in range(m)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # table, pos
        grid=(b, -(-wb // m)),
        in_specs=[
            pl.BlockSpec((1, 2, p2, gp, d),
                         lambda i, j, table, pos: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *(kv_specs * 2), *(sc_specs * 2),
        ],
        out_specs=pl.BlockSpec((1, 2, p2, gp, d),
                               lambda i, j, table, pos: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, p2, gp, 128), jnp.float32),   # running max
            pltpu.VMEM((2, p2, gp, 128), jnp.float32),   # running denom
            pltpu.VMEM((2, p2, gp, d), jnp.float32),     # output accum
        ],
    )
    return pl.pallas_call(
        _make_kernel(m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 2, p2, gp, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * 2 * p2 * gp * wb * bs * d * 2,
            bytes_accessed=b * wb * p2 * bs * d * 2      # packed K+V
            + b * wb * 2 * p2 * bs * 4 * 2               # scales
            + b * 2 * p2 * gp * d * 4,
            transcendentals=b * 2 * p2 * gp * wb * bs,
        ),
    )(table.astype(jnp.int32), pos.astype(jnp.int32), q,
      *([kp_pool] * m), *([vp_pool] * m),
      *([ks_pool] * m), *([vs_pool] * m))


def paged_decode_attention_int4(
    q: jnp.ndarray,         # (B, Hkv, G, D)
    kp_pool: jnp.ndarray,   # (N, Hkv/2, bs, D) int8 packed
    vp_pool: jnp.ndarray,
    ks_pool: jnp.ndarray,   # (N, 2, Hkv/2, bs) f32 scales (nibble planes)
    vs_pool: jnp.ndarray,
    table: jnp.ndarray,     # (B, WB) int32 — window's block rows per slot
    pos: jnp.ndarray,       # (B,) int32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paged GQA decode attention over int4-packed K/V pools."""
    b, hkv, g, d = q.shape
    p2 = hkv // 2
    gp = max(SUBLANE, ((g + SUBLANE - 1) // SUBLANE) * SUBLANE)
    if gp != g:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    # (B, Hkv, Gp, D) → nibble-plane-major (B, 2, P2, Gp, D): plane 0 = low
    # heads (2p), plane 1 = high heads (2p+1)
    q4 = jnp.swapaxes(q.reshape(b, p2, 2, gp, d), 1, 2)
    out = _pallas_paged_attention_int4(q4, kp_pool, vp_pool, ks_pool,
                                       vs_pool, table, pos,
                                       interpret=interpret)
    out = jnp.swapaxes(out, 1, 2).reshape(b, hkv, gp, d)
    return out[:, :, :g] if gp != g else out


def paged_decode_attention_int4_reference(q, kp_pool, vp_pool, ks_pool,
                                          vs_pool, table, pos):
    """jnp twin: gather + unpack + dequantize the window, dense attention.

    Mathematically identical to the kernel (scale-after-dot == dequantize-
    then-dot, by linearity); used by CPU tests and the XLA fallback path.
    """
    b, hkv, g, d = q.shape
    bs = kp_pool.shape[2]
    wb = table.shape[1]
    # (B, WB, P2, bs, D) → (B, WB, bs, P2, D) → ints (B, WB, bs, Hkv, D)
    k_int = unpack_kv_int4(jnp.moveaxis(kp_pool[table], 2, 3), hkv)
    v_int = unpack_kv_int4(jnp.moveaxis(vp_pool[table], 2, 3), hkv)
    # (B, WB, 2, P2, bs) → (B, WB, bs, 2, P2) → (B, WB, bs, Hkv)
    ksc = planes_to_scales(jnp.moveaxis(ks_pool[table], 4, 2))
    vsc = planes_to_scales(jnp.moveaxis(vs_pool[table], 4, 2))
    k = (k_int.astype(jnp.float32) * ksc[..., None]).reshape(
        b, wb * bs, hkv, d)
    v = (v_int.astype(jnp.float32) * vsc[..., None]).reshape(
        b, wb * bs, hkv, d)
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhgd,bkhd->bhgk", q.astype(jnp.float32), k) * scale
    col = jnp.arange(wb * bs)[None, None, None, :]
    s = jnp.where(col <= pos[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bkhd->bhgd", p, v)
    return o.astype(q.dtype)
