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

Packing layout — *head-pair split*: kv heads (2p, 2p+1) share the packed
byte columns [p·D, (p+1)·D): head 2p in the low nibble, head 2p+1 in the
high nibble. This keeps each head's 128 dims lane-aligned (static slices
at multiples of D=128), keeps the pool's minor dim at (Hkv/2)·D (no HBM
tile padding), and keeps TP shards contiguous in kv heads (shard = a range
of pairs = a range of heads, matching the query-head sharding) — int4 KV
under TP requires Hkv/tp even so pairs never split.

Scale pools are stored TRANSPOSED, (N, Hkv, bs) — with heads minor they
would tile-pad 8→128 lanes in HBM and the padded scale read would cost a
third of the saved KV bytes.

Shapes (N = pool blocks, bs = block size, Hkv = kv heads, G = query heads
per kv head, D = head dim, C = (Hkv/2)·D, WB = window blocks):
    q:       (B, Hkv, G, D)
    kp, vp:  (N, bs, C) int8  — packed pools
    ks, vs:  (N, Hkv, bs) f32 — per-(block, position, head) scales
    table:   (B, WB) int32    — pool row of each slot's logical block
    pos:     (B,) int32       — kv index j attends iff j <= pos[slot]
    out:     (B, Hkv, G, D)

Grid (slot, window-block) with online softmax across the window blocks —
same streaming-flash structure as paged_attention.py's int8 kernel.
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
    """(..., Hkv, D) ints in [-7, 7] → (..., (Hkv/2)·D) int8, head-pair split.

    Byte column p·D + d holds head 2p dim d (low nibble, offset bits q+8)
    and head 2p+1 dim d (high nibble, two's complement).
    """
    hkv, d = q4.shape[-2], q4.shape[-1]
    assert hkv % 2 == 0, hkv
    pairs = q4.reshape(*q4.shape[:-2], hkv // 2, 2, d)
    lo = (pairs[..., 0, :].astype(jnp.int32) + 8) & 0x0F
    hi = pairs[..., 1, :].astype(jnp.int32) & 0x0F
    packed = (hi << 4) | lo
    packed = jnp.where(packed >= 128, packed - 256, packed)
    return packed.astype(jnp.int8).reshape(*q4.shape[:-2], (hkv // 2) * d)


def unpack_kv_int4(packed: jnp.ndarray, hkv: int) -> jnp.ndarray:
    """(..., (Hkv/2)·D) int8 → (..., Hkv, D) int32 (inverse of pack_kv_int4)."""
    d = packed.shape[-1] * 2 // hkv
    p = packed.astype(jnp.int32).reshape(*packed.shape[:-1], hkv // 2, d)
    hi = p >> 4                          # arithmetic: signed high nibble
    lo = (p - (hi << 4)) - 8             # offset-decode
    both = jnp.stack([lo, hi], axis=-2)  # (..., Hkv/2, 2, D)
    return both.reshape(*packed.shape[:-1], hkv, d)


def quantize_kv_int4(x: jnp.ndarray):
    """(..., Hkv, D) fp → packed (..., (Hkv/2)·D) int8 + (..., Hkv) f32 scales.

    Symmetric per-(position, head) absmax/7 — the int4 twin of
    llama._quantize_kv.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 7.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -7, 7)
    return pack_kv_int4(q), scale


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _kernel(table_ref, pos_ref, q_ref, kp_ref, vp_ref, ks_ref, vs_ref,
            o_ref, m_scr, l_scr, acc_scr):
    # q_ref/o_ref: (1, Hkv, Gp, D); kp/vp_ref: (1, bs, C) int8 pool block
    # table[i, j]; ks/vs_ref: (1, Hkv, bs) f32; scratch m/l (Hkv, Gp, 128),
    # acc (Hkv, Gp, D)
    i = pl.program_id(0)
    j = pl.program_id(1)
    hkv, gp, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    bs = kp_ref.shape[1]
    scale = 1.0 / math.sqrt(d)
    dims_t = (((1,), (1,)), ((), ()))    # contract last dims (dot · rowsᵀ)
    dims = (((1,), (0,)), ((), ()))

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    col = j * bs + jax.lax.broadcasted_iota(jnp.int32, (gp, bs), 1)
    valid = col <= pos_ref[i]

    @pl.when(j * bs <= pos_ref[i])   # skip fully-masked tail blocks
    def _block():
        # one widening shift per packed byte; P goes to the MXU as bytes
        pk_raw = kp_ref[0]                                  # (bs, C) int8
        hk = (pk_raw.astype(jnp.int32) >> 4).astype(jnp.float32)
        pk = pk_raw.astype(jnp.float32)
        pv_raw = vp_ref[0]
        hv = (pv_raw.astype(jnp.int32) >> 4).astype(jnp.float32)
        pv = pv_raw.astype(jnp.float32)

        for p in range(hkv // 2):  # static unroll over head pairs
            h_lo, h_hi = 2 * p, 2 * p + 1
            sl = slice(p * d, (p + 1) * d)                  # static (unrolled)
            pk_p, hk_p = pk[:, sl], hk[:, sl]               # (bs, D)
            q_lo = q_ref[0, h_lo].astype(jnp.float32)       # (Gp, D)
            q_hi = q_ref[0, h_hi].astype(jnp.float32)
            # K side: 3 half-width dots via one P dot + one stacked H dot
            d1 = jax.lax.dot_general(
                q_lo, pk_p, dims_t, preferred_element_type=jnp.float32)
            d23 = jax.lax.dot_general(
                jnp.concatenate([q_hi, q_lo], axis=0), hk_p, dims_t,
                preferred_element_type=jnp.float32)         # (2Gp, bs)
            sum_qlo = jnp.sum(q_lo, axis=1, keepdims=True)  # (Gp, 1)
            s_hi_int = d23[:gp]
            s_lo_int = d1 - 16.0 * d23[gp:] - 8.0 * sum_qlo
            ks_lo = ks_ref[0, h_lo:h_lo + 1, :]             # (1, bs)
            ks_hi = ks_ref[0, h_hi:h_hi + 1, :]
            vs_lo = vs_ref[0, h_lo:h_lo + 1, :]
            vs_hi = vs_ref[0, h_hi:h_hi + 1, :]

            pv_p, hv_p = pv[:, sl], hv[:, sl]
            for h, s_int, k_sc, v_sc, is_lo in (
                (h_lo, s_lo_int, ks_lo, vs_lo, True),
                (h_hi, s_hi_int, ks_hi, vs_hi, False),
            ):
                s = jnp.where(valid, s_int * k_sc * scale, -1e30)
                m_prev = m_scr[h, :, :1]                    # (Gp, 1)
                l_prev = l_scr[h, :, :1]
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp(m_prev - m_new)
                prob = jnp.exp(s - m_new)                   # (Gp, bs)
                l_new = l_prev * alpha + jnp.sum(prob, -1, keepdims=True)
                psc = prob * v_sc                           # fold V scales
                if is_lo:
                    dv1 = jax.lax.dot_general(
                        psc, pv_p, dims, preferred_element_type=jnp.float32)
                    dv3 = jax.lax.dot_general(
                        psc, hv_p, dims, preferred_element_type=jnp.float32)
                    pvp = dv1 - 16.0 * dv3 - 8.0 * jnp.sum(
                        psc, axis=1, keepdims=True)
                else:
                    pvp = jax.lax.dot_general(
                        psc, hv_p, dims, preferred_element_type=jnp.float32)
                acc_scr[h] = acc_scr[h] * alpha + pvp
                m_scr[h, :, :1] = m_new
                l_scr[h, :, :1] = l_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        for h in range(hkv):
            denom = jnp.maximum(l_scr[h, :, :1], 1e-30)
            o_ref[0, h] = (acc_scr[h] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_paged_attention_int4(q, kp_pool, vp_pool, ks_pool, vs_pool,
                                 table, pos, *, interpret=False):
    b, hkv, gp, d = q.shape
    bs = kp_pool.shape[1]
    c = kp_pool.shape[2]
    wb = table.shape[1]
    kv_spec = pl.BlockSpec((1, bs, c),
                           lambda i, j, table, pos: (table[i, j], 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, hkv, bs),
                           lambda i, j, table, pos: (table[i, j], 0, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # table, pos
        grid=(b, wb),
        in_specs=[
            pl.BlockSpec((1, hkv, gp, d),
                         lambda i, j, table, pos: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, kv_spec, sc_spec, sc_spec,
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
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gp, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * hkv * gp * wb * bs * d * 2,
            bytes_accessed=b * wb * bs * c * 2          # packed K+V
            + b * wb * hkv * bs * 4 * 2                 # scales
            + b * hkv * gp * d * 4,
            transcendentals=b * hkv * gp * wb * bs,
        ),
    )(table.astype(jnp.int32), pos.astype(jnp.int32), q,
      kp_pool, vp_pool, ks_pool, vs_pool)


def paged_decode_attention_int4(
    q: jnp.ndarray,         # (B, Hkv, G, D)
    kp_pool: jnp.ndarray,   # (N, bs, (Hkv/2)·D) int8 packed
    vp_pool: jnp.ndarray,
    ks_pool: jnp.ndarray,   # (N, Hkv, bs) f32 scales (transposed layout)
    vs_pool: jnp.ndarray,
    table: jnp.ndarray,     # (B, WB) int32 — window's block rows per slot
    pos: jnp.ndarray,       # (B,) int32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paged GQA decode attention over int4-packed K/V pools."""
    b, hkv, g, d = q.shape
    gp = max(SUBLANE, ((g + SUBLANE - 1) // SUBLANE) * SUBLANE)
    if gp != g:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    out = _pallas_paged_attention_int4(q, kp_pool, vp_pool, ks_pool,
                                       vs_pool, table, pos,
                                       interpret=interpret)
    return out[:, :, :g] if gp != g else out


def paged_decode_attention_int4_reference(q, kp_pool, vp_pool, ks_pool,
                                          vs_pool, table, pos):
    """jnp twin: gather + unpack + dequantize the window, dense attention.

    Mathematically identical to the kernel (scale-after-dot == dequantize-
    then-dot, by linearity); used by CPU tests and the XLA fallback path.
    """
    b, hkv, g, d = q.shape
    bs = kp_pool.shape[1]
    wb = table.shape[1]
    k_int = unpack_kv_int4(kp_pool[table], hkv)     # (B, WB, bs, Hkv, D)
    v_int = unpack_kv_int4(vp_pool[table], hkv)
    ksc = jnp.swapaxes(ks_pool[table], -1, -2)      # (B, WB, bs, Hkv)
    vsc = jnp.swapaxes(vs_pool[table], -1, -2)
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
