"""Pallas TPU kernels for the SNAC-equivalent vocoder hot path.

The decoder's work is 4 upsample stages × 3 residual units, each unit being
snake → dilated depthwise conv(7) → snake → pointwise conv → residual add
(models/snac.py:_residual_unit; reference consumes the torch SNAC decoder,
`modal_audio_stream.py:190-202`). In XLA each op materializes its
(B, T, C) intermediate in HBM — 4 extra round trips of the activation per
unit. This kernel computes the whole unit in VMEM per time tile: one
activation read, one write.

Halo handling: each grid cell loads its tile plus the neighbor tiles
(three BlockSpecs with clamped index maps) and slices the ±3·dilation halo
it needs. Missing neighbors at sequence edges are zeroed — bit-identical
to the XLA path's zero `same` padding because snake(0) == 0.

The `valid` length (per batch row) reproduces _mask_tail: positions past
the content length are forced to zero so bucket padding never changes the
audio (scalar-prefetch operand).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_TILE = 512


HALO_BLOCK = 32   # ≥ 3·max dilation (27); sublane-aligned


def _unit_kernel(valid_ref, xl, xc, xr, a1, dww, dwb, a2, pww, pwb, o_ref,
                 *, dilation: int, tile: int):
    # xl/xr are HALO_BLOCK-wide neighbor slivers (1.06× input reads instead
    # of 3× with full neighbor tiles)
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.num_programs(1)
    halo = 3 * dilation

    has_l = (i > 0).astype(jnp.float32)
    has_r = (i < n - 1).astype(jnp.float32)
    left = xl[0, HALO_BLOCK - halo:, :] * has_l               # (halo, C)
    right = xr[0, :halo, :] * has_r                           # (halo, C)
    buf = jnp.concatenate([left, xc[0], right], axis=0)       # (tile+2h, C)

    # snake(x) = x + sin²(αx)/α — on the haloed buffer (snake(0)=0 keeps
    # zeroed halos equivalent to the conv's zero padding)
    a1v = a1[0][None, :]
    y = buf + jnp.sin(a1v * buf) ** 2 / (a1v + 1e-9)

    # dilated depthwise conv(7): 7 static shifted multiply-adds on the VPU
    acc = jnp.broadcast_to(dwb[0][None, :], (tile, buf.shape[1]))
    for k in range(7):
        off = halo + (k - 3) * dilation
        acc = acc + dww[k][None, :] * y[off: off + tile]

    a2v = a2[0][None, :]
    y2 = acc + jnp.sin(a2v * acc) ** 2 / (a2v + 1e-9)

    # pointwise conv on the MXU + residual add
    out = xc[0] + jax.lax.dot_general(
        y2, pww[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + pwb[0][None, :]

    # _mask_tail: zero positions ≥ valid[b]
    pos = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    out = jnp.where(pos < valid_ref[b], out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _unit_kernel_single(valid_ref, xc, a1, dww, dwb, a2, pww, pwb, o_ref,
                        *, dilation: int):
    """Single-tile variant: the whole time extent lives in VMEM — no halo
    duplication, one input read (streaming windows are small)."""
    b = pl.program_id(0)
    t = xc.shape[1]
    x = xc[0]
    a1v = a1[0][None, :]
    y = x + jnp.sin(a1v * x) ** 2 / (a1v + 1e-9)
    acc = jnp.broadcast_to(dwb[0][None, :], (t, x.shape[1]))
    zeros = jnp.zeros((3 * dilation, x.shape[1]), y.dtype)
    ypad = jnp.concatenate([zeros, y, zeros], axis=0)
    for k in range(7):
        off = 3 * dilation + (k - 3) * dilation
        acc = acc + dww[k][None, :] * ypad[off: off + t]
    a2v = a2[0][None, :]
    y2 = acc + jnp.sin(a2v * acc) ** 2 / (a2v + 1e-9)
    out = x + jax.lax.dot_general(
        y2, pww[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + pwb[0][None, :]
    pos = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    out = jnp.where(pos < valid_ref[b], out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


# whole-extent-in-VMEM bound on T*C*4: the kernel body holds ~6 temporaries
# of the block and the scoped VMEM limit is 16 MB
SINGLE_TILE_BYTES = 2 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("dilation", "interpret")
)
def _fused_unit_single(x, valid, alpha1, dw_w, dw_b, alpha2, pw_w, pw_b, *,
                       dilation: int, interpret: bool = False):
    b, t, c = x.shape
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda bi, v: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, c), lambda bi, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, v: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda bi, v: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_unit_kernel_single, dilation=dilation),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * c * (c + 7),
            bytes_accessed=b * t * c * 4 * 2,
            transcendentals=2 * b * t * c,
        ),
    )(valid.astype(jnp.int32), x, row(alpha1), dw_w, row(dw_b),
      row(alpha2), pw_w, row(pw_b))


@functools.partial(
    jax.jit, static_argnames=("dilation", "interpret")
)
def _fused_unit(x, valid, alpha1, dw_w, dw_b, alpha2, pw_w, pw_b, *,
                dilation: int, interpret: bool = False):
    b, t, c = x.shape
    tile = min(MAX_TILE, t)
    assert t % tile == 0, (t, tile)
    n_tiles = t // tile
    row = lambda v: v.reshape(1, -1)  # noqa: E731

    hb = HALO_BLOCK
    sub = tile // hb      # halo sub-blocks per tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,        # valid lengths
        grid=(b, n_tiles),
        in_specs=[
            # left halo: the HALO_BLOCK-wide sliver ending at tile start
            pl.BlockSpec((1, hb, c),
                         lambda bi, i, v, sub=sub:
                         (bi, jnp.maximum(i * sub - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bi, i, v: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            # right halo: the sliver starting at tile end
            pl.BlockSpec(
                (1, hb, c),
                lambda bi, i, v, sub=sub:
                (bi, jnp.minimum((i + 1) * sub,
                                 pl.num_programs(1) * sub - 1), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i, v: (0, 0),
                         memory_space=pltpu.VMEM),   # alpha1
            pl.BlockSpec((7, c), lambda bi, i, v: (0, 0),
                         memory_space=pltpu.VMEM),   # dw w
            pl.BlockSpec((1, c), lambda bi, i, v: (0, 0),
                         memory_space=pltpu.VMEM),   # dw b
            pl.BlockSpec((1, c), lambda bi, i, v: (0, 0),
                         memory_space=pltpu.VMEM),   # alpha2
            pl.BlockSpec((c, c), lambda bi, i, v: (0, 0),
                         memory_space=pltpu.VMEM),   # pw w
            pl.BlockSpec((1, c), lambda bi, i, v: (0, 0),
                         memory_space=pltpu.VMEM),   # pw b
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, i, v: (bi, i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_unit_kernel, dilation=dilation, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * c * (c + 7),
            bytes_accessed=b * t * c * 4 * 2,
            transcendentals=2 * b * t * c,
        ),
    )(valid.astype(jnp.int32), x, x, x, row(alpha1), dw_w, row(dw_b),
      row(alpha2), pw_w, row(pw_b))


def fused_residual_unit(
    x: jnp.ndarray,          # (B, T, C) float32
    p: dict,                 # {"alpha1","conv1":{w,b},"alpha2","conv2":{w,b}}
    dilation: int,
    valid=None,              # None | scalar | (B,) — content length (time)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused replacement for models/snac.py:_residual_unit in
    depthwise mode (conv1 groups == channels — the released SNAC geometry).
    """
    b, t, c = x.shape
    dw_w = p["conv1"]["w"].reshape(7, c)     # (7, 1, C) depthwise
    pw_w = p["conv2"]["w"].reshape(c, c)     # (1, C, C) pointwise
    if valid is None:
        v = jnp.full((b,), t, jnp.int32)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid, jnp.int32), (b,))
    fn = (_fused_unit_single if t * c * 4 <= SINGLE_TILE_BYTES
          else _fused_unit)
    return fn(
        x, v, p["alpha1"], dw_w, p["conv1"]["b"], p["alpha2"], pw_w,
        p["conv2"]["b"], dilation=dilation, interpret=interpret,
    )
