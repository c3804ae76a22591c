"""Pallas TPU kernel: int4 weight-only matmul with in-VMEM nibble unpack.

The decode step is weight-read-bound: PERF.md's speed-of-light audit puts
the int8 path at its HBM floor (~3.9 ms/step for the 3B model). Halving
the weight bytes again needs int4 — but the pure-XLA probe ran 0.6× int8
speed because XLA materializes the unpacked weights in HBM (69 GB/s
effective). This kernel keeps the packed bytes packed until they are in
VMEM. (Reference motivation: the bitsandbytes 4-bit weight loads,
`pretrained_base/modal_finetune_base.py:96-102` /
`vllm_inference/modal_benchmark.py:76-91`, SURVEY.md §2.2 — rebuilt as a
TPU serving kernel.)

Two earlier shapes of this kernel were measured and discarded on-chip:
per-group split-half packing with one small matmul per 128-group (1.05×
int8 — hundreds of tiny MXU launches), and full shift-unpack + per-element
scale multiply (VPU-bound at ~5.5 ops/element: the dequant cost ate the
DMA saving). v5e's VPU:HBM ratio makes *any* per-element unpack with >~2
ops lose to int8, so this version gets the low nibbles into the MXU
WITHOUT ever extracting them, via the identity

    L_u = P - 16·H        (P = packed byte as signed int, H = P >> 4)

with the low nibble offset-encoded (stored bits = q_lo + 8 ∈ [0,15], high
nibble two's-complement so the arithmetic shift sign-extends it):

    y_tile = s_lo ⊙ (x_lo@P − 16·(x_lo@H) − 8·Σx_lo) + s_hi ⊙ (x_hi@H)

Per packed byte the VPU does ONE widening shift chain for H plus two
dtype converts (~2 ops/element); P is converted i8→bf16 and fed to the
MXU as-is. Scales are per-(group, out-channel) with group == the K-tile
(512 rows by default — coarser than AWQ's 128, the price of applying
scales to partial sums instead of per element; embed/head stay int8 and
tools/audio_fidelity.py gates the quality).

Packing layout — *global split-half* along K: packed row i holds
q[i] (low nibble, offset-encoded) and q[K/2 + i] (high nibble, signed).

Shapes:
    x:      (M, K)        activations (bf16/f32)
    w_p:    (K//2, Np)    packed int8 (two int4 per byte, layout above)
    scales: (K//G, N)     fp32 per-(group, out-channel) scales, G = K-tile
    out:    (M, N)        x.dtype

Grid is (M tiles, N tiles, packed-K tiles) with K innermost; the f32
accumulator lives in VMEM scratch across the K steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

GROUP = 512          # quantization group along K == packed-K tile (G | K/2)
# out-channel tile (env knob for on-chip tuning, PERF.md int4 campaign);
# measured on v5e: 1024 → 37.8 µs/op vs 512 → 45.4 on the isolated
# (8,3072)×(3072,8192) decode matmul (int8 XLA: ~50)
DEFAULT_TN = int(os.environ.get("TTS_INT4_TN", "1024"))


def pick_group(k: int, group: int = GROUP) -> int:
    """Largest usable group ≤ `group` for a K-dim of `k` (groups must tile
    each packed half: G | K/2)."""
    g = min(group, max(1, k // 2))
    while k // 2 % g:
        g //= 2
    return g


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """(K, N) ints in [-8, 7] → (K//2, N) int8, global split-half.

    Low half of K → offset-encoded low nibbles (bits = q + 8); high half →
    two's-complement high nibbles. numpy/jnp agnostic.
    """
    k, n = q.shape
    assert k % 2 == 0, k
    h = k // 2
    lo = (q[:h].astype(jnp.int32) + 8) & 0x0F         # offset bits [0, 15]
    hi = q[h:].astype(jnp.int32) & 0x0F               # two's-complement bits
    packed = (hi << 4) | lo                           # uint byte in int32
    packed = jnp.where(packed >= 128, packed - 256, packed)
    return packed.astype(jnp.int8)


def unpack_int4(w_p: jnp.ndarray) -> jnp.ndarray:
    """(K//2, N) int8 → (K, N) int32 in [-8, 7] (inverse of pack_int4)."""
    p = w_p.astype(jnp.int32)
    hi = p >> 4                                       # floor(p/16) = q_hi
    lo = (p - (hi << 4)) - 8                          # offset-decode
    return jnp.concatenate([lo, hi], axis=0)


def _kernel(x_ref, wp_ref, slo_ref, shi_ref, o_ref, acc_ref, *,
            tkp: int, half: int, compute_dtype=None):
    """x_ref (TM, K) resident; wp_ref (TKP, TN) int8; slo/shi (1, 1, TN).

    The packed bytes go to the MXU *as bytes* (one i8→dtype convert); only
    the high nibble pays a shift. Three (TM, TKP)-row contractions per
    block, issued as two dots (the H operand's pair shares one launch);
    scales apply to the partial sums.
    """
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dt = compute_dtype or x_ref.dtype
    p_raw = wp_ref[:]                                 # (TKP, TN) int8
    # Mosaic legalizes no i8 vector arithmetic (shifts, sub both fail) —
    # the H extraction must widen; i32 keeps the shift exact
    hb = (p_raw.astype(jnp.int32) >> 4).astype(dt)    # q_hi ∈ [-8, 7]
    pb = p_raw.astype(dt)                             # bytes, straight to MXU
    off = kk * tkp
    xa = x_ref[:, pl.ds(off, tkp)].astype(dt)         # lo half of K
    xb = x_ref[:, pl.ds(half + off, tkp)].astype(dt)  # hi half of K
    tm = xa.shape[0]
    dims = (((1,), (0,)), ((), ()))
    d1 = jax.lax.dot_general(xa, pb, dims,
                             preferred_element_type=jnp.float32)
    # d2 = xb@H and d3 = xa@H share the H operand: one (2·TM, TKP) dot
    d23 = jax.lax.dot_general(
        jnp.concatenate([xb, xa], axis=0), hb, dims,
        preferred_element_type=jnp.float32)
    d2, d3 = d23[:tm], d23[tm:]
    # xa @ L_u = d1 − 16·d3  (L_u = P − 16H = q_lo + 8)
    sum_xa = jnp.sum(xa.astype(jnp.float32), axis=1, keepdims=True)
    s_lo = slo_ref[0]                                 # (1, TN) f32
    s_hi = shi_ref[0]
    acc_ref[...] += s_lo * (d1 - 16.0 * d3 - 8.0 * sum_xa) + s_hi * d2

    @pl.when(kk == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tn", "tkp", "interpret"))
def _pallas_int4_mm(x, w_p, s_lo, s_hi, *, tm, tn, tkp, interpret=False):
    m, k = x.shape
    kp, n = w_p.shape
    grid = (m // tm, n // tn, kp // tkp)
    kernel = functools.partial(
        _kernel, tkp=tkp, half=k // 2,
        compute_dtype=jnp.float32 if interpret else None)
    # one scale row per K-tile, shaped (tiles, 1, N) so each tile's row is
    # a full leading-dim block (sublane-tiling-safe)
    s_lo = s_lo.reshape(kp // tkp, 1, n)
    s_hi = s_hi.reshape(kp // tkp, 1, n)
    sblk = (1, 1, tn)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tkp, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sblk, lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sblk, lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * m * n * k,
            bytes_accessed=k * n // 2 + m * k * 2 + m * n * 2
            + 2 * (kp // tkp) * n * 4,
            transcendentals=0,
        ),
    )(x, w_p, s_lo, s_hi)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def int4_mm(x: jnp.ndarray, w_p: jnp.ndarray, scales: jnp.ndarray, *,
            interpret: bool = False) -> jnp.ndarray:
    """x (..., K) @ int4-packed weights (K//2, Np) → (..., N).

    The group size is inferred from the shapes: group = K // scales.shape[0]
    (it doubles as the packed-K tile). w_p's out dimension may be
    lane-padded past the true N = scales.shape[1] (padded columns are
    sliced off); quantize_linear_i4 picks the group so G | K/2.
    """
    orig_shape = x.shape
    k = orig_shape[-1]
    n = scales.shape[1]
    n_pad = w_p.shape[1]
    group = k // scales.shape[0]
    if group % 128 or (k // 2) % 128:
        # tiny test configs: the kernel's dynamic K slices need 128-lane
        # alignment; sub-128 dims are never perf targets — use the twin
        return int4_mm_reference(x, w_p, scales)
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    assert k == w_p.shape[0] * 2 and (k // 2) % group == 0, \
        (x.shape, w_p.shape, group)
    assert n_pad % 128 == 0, n_pad

    s = scales.astype(jnp.float32)
    if n_pad != n:
        s = jnp.pad(s, ((0, 0), (0, n_pad - n)))
    ng_half = (k // 2) // group
    s_lo, s_hi = s[:ng_half], s[ng_half:]
    tm = min(_round_up(m, 8), 256)
    mp = _round_up(m, tm)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    tn = DEFAULT_TN if n_pad % DEFAULT_TN == 0 else 128
    out = _pallas_int4_mm(x2, w_p, s_lo, s_hi, tm=tm, tn=tn, tkp=group,
                          interpret=interpret)
    if mp != m:
        out = out[:m]
    if n_pad != n:
        out = out[:, :n]
    return out.reshape(*orig_shape[:-1], n)


def int4_mm_reference(x: jnp.ndarray, w_p: jnp.ndarray,
                      scales: jnp.ndarray) -> jnp.ndarray:
    """jnp twin (CPU tests / non-TPU fallback): unpack, dequant, matmul.

    f32 compute throughout — some CPU dot thunks reject bf16×bf16→f32,
    and this twin exists for correctness, not speed (the TPU product path
    is the kernel).
    """
    k = x.shape[-1]
    n = scales.shape[1]
    group = k // scales.shape[0]
    q = unpack_int4(w_p)[:, :n].astype(jnp.float32)      # (K, N)
    w = (q.reshape(k // group, group, n)
         * scales.astype(jnp.float32)[:, None, :]).reshape(k, n)
    out = x.astype(jnp.float32).reshape(-1, k) @ w
    return out.astype(x.dtype).reshape(*x.shape[:-1], n)
