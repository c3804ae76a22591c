"""SNAC-equivalent neural vocoder (codes → 24 kHz PCM) in pure JAX.

The reference consumes the third-party PyTorch `hubertsiuzdak/snac_24khz`
decoder (SURVEY.md §2.2; loaded/warmed at `modal_audio_stream.py:106-129`,
decode calls at `:190-202`). This is a first-party TPU-native reimplementation
of that decoder family:

    3 hierarchical codebooks (strides 4/2/1 at the latent rate)
      → per-codebook embedding + 1x1 out-projection, nearest-upsample, sum
      → depthwise+pointwise input conv
      → 4 × [Snake, ConvTranspose(up ×8/×8/×4/×2), Noise, 3 residual units]
      → Snake → Conv(→1) → tanh
    512 samples per latent step; one 7-code TTS frame = 4 latent steps
      = 2048 samples (~85.3 ms).

Design choices that differ from the reference stack on purpose:

- **Feature-last (B, T, C) layout** — the natural TPU/XLA conv layout.
- **Weight-norm folded at load time** — inference sees plain conv weights.
- **Deterministic, position-addressed noise**: the torch decoder injects
  fresh `randn` each call, which is why the reference observed
  "decode(same_codes) twice gives slightly different results"
  (PIPELINE_REPORT.md:478-483) and needed statistical thresholds for its
  streaming-vs-batch tests. Our noise is a pure function of
  (seed, block, absolute position), so windowed streaming decode is
  *bit-exact* against batch decode on interior samples.

Weight import from released SNAC checkpoints is supported via
`loader.load_snac_torch_state` (same state-dict naming as the public snac
package, old- and new-style weight norm).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tts_inference_tpu.config import SnacConfig

Params = Dict


# ---------------------------------------------------------------------------
# Primitive ops (feature-last layout)
# ---------------------------------------------------------------------------


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """1-D convolution. x: (B, T, Cin); w: (K, Cin//groups, Cout)."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b
    return out


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
) -> jnp.ndarray:
    """1-D transposed convolution matching torch ConvTranspose1d semantics.

    x: (B, T, Cin); w: (K, Cin, Cout) — i.e. the torch (Cin, Cout, K) weight
    transposed to (K, Cin, Cout) *without* flipping; the flip happens here.

    Implemented as input-dilated convolution: out = conv(dilate(x, s),
    flip(w)) with edge padding (K-1-p, K-1-p+output_padding).
    """
    k = w.shape[0]
    w_flipped = jnp.flip(w, axis=0)
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    out = jax.lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        out = out + b
    return out


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation: x + sin²(αx)/α (per-channel α; feature-last)."""
    a = alpha[None, None, :]
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """splitmix-style 32-bit integer hash (vectorized)."""
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def position_noise(
    seed: jnp.ndarray,      # (B,) uint32 — per-stream noise seed
    block_idx: int,
    offset: jnp.ndarray,    # (B,) uint32 — absolute start position
    length: int,
    batch: int,
) -> jnp.ndarray:
    """Deterministic N(0,1) noise addressed by absolute temporal position.

    Returns (batch, length, 1). Value at absolute position p depends ONLY on
    (seed, block, p) — independent of the window it is computed in AND of
    the batch slot it is computed at, so per-stream windows can be batch-
    decoded together and still match their solo decodes bit-for-bit.
    """
    seed = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), (batch,))
    offset = jnp.broadcast_to(jnp.asarray(offset, jnp.uint32), (batch,))
    pos = jnp.arange(length, dtype=jnp.uint32)[None, :] + offset[:, None]
    base = _mix32(
        seed[:, None] ^ jnp.uint32(0x9E3779B9) * jnp.uint32(block_idx + 1)
    )
    h = _mix32(pos ^ base)
    h2 = _mix32(h ^ jnp.uint32(0x68E31DA4))
    # Box–Muller from two uniform hashes
    u1 = (h.astype(jnp.float32) + 1.0) / 4294967296.0
    u2 = h2.astype(jnp.float32) / 4294967296.0
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = 2.0 * np.pi * u2
    return (r * jnp.cos(theta))[..., None]


# ---------------------------------------------------------------------------
# Parameter init (random; checkpoint import lives in models/loader.py)
# ---------------------------------------------------------------------------


def _winit(key, shape, scale=None):
    fan_in = int(np.prod(shape[:-1]))
    scale = scale if scale is not None else 1.0 / math.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def init_snac_params_fast(key: jax.Array, cfg: SnacConfig) -> Params:
    """init_snac_params under ONE jit. Eager init issues ~200 tiny
    jax.random dispatches, each compiling its own micro-graph — 557 s of
    a 597 s engine boot over the remote-compile tunnel (PERF.md round-4
    boot anatomy). One traced graph = one compile + one dispatch, with
    bit-identical values."""
    return jax.jit(init_snac_params, static_argnums=(1,))(key, cfg)


def init_snac_params(key: jax.Array, cfg: SnacConfig) -> Params:
    """Random init with the exact tree structure of a loaded checkpoint."""
    keys = iter(jax.random.split(key, 256))
    nxt = lambda: next(keys)  # noqa: E731

    quant: List[Params] = []
    for _ in cfg.vq_strides:
        quant.append(
            {
                "codebook": jax.random.normal(
                    nxt(), (cfg.codebook_size, cfg.codebook_dim)
                ),
                "out_proj": {
                    "w": _winit(nxt(), (1, cfg.codebook_dim, cfg.latent_dim)),
                    "b": jnp.zeros((cfg.latent_dim,)),
                },
            }
        )

    ch = cfg.decoder_dim
    blocks: List[Params] = []
    dim = ch
    for i, rate in enumerate(cfg.decoder_rates):
        in_dim = ch // (2**i)
        out_dim = ch // (2 ** (i + 1))
        groups = out_dim if cfg.depthwise else 1
        res_units = []
        for dil in (1, 3, 9):
            res_units.append(
                {
                    "alpha1": jnp.ones((out_dim,)),
                    "conv1": {
                        "w": _winit(nxt(), (7, out_dim // groups, out_dim)),
                        "b": jnp.zeros((out_dim,)),
                    },
                    "alpha2": jnp.ones((out_dim,)),
                    "conv2": {
                        "w": _winit(nxt(), (1, out_dim, out_dim)),
                        "b": jnp.zeros((out_dim,)),
                    },
                }
            )
        blocks.append(
            {
                "alpha": jnp.ones((in_dim,)),
                "up": {
                    "w": _winit(nxt(), (2 * rate, in_dim, out_dim)),
                    "b": jnp.zeros((out_dim,)),
                },
                "noise_lin": (
                    {"w": _winit(nxt(), (1, out_dim, out_dim))}
                    if cfg.noise
                    else None
                ),
                "res": res_units,
            }
        )
        dim = out_dim

    if cfg.depthwise:
        in_conv = {
            "dw": {
                "w": _winit(nxt(), (7, 1, cfg.latent_dim)),
                "b": jnp.zeros((cfg.latent_dim,)),
            },
            "pw": {
                "w": _winit(nxt(), (1, cfg.latent_dim, ch)),
                "b": jnp.zeros((ch,)),
            },
        }
    else:
        in_conv = {
            "conv": {
                "w": _winit(nxt(), (7, cfg.latent_dim, ch)),
                "b": jnp.zeros((ch,)),
            }
        }

    return {
        "quantizer": quant,
        "decoder": {
            "in": in_conv,
            "blocks": blocks,
            "out_alpha": jnp.ones((dim,)),
            "out_conv": {
                "w": _winit(nxt(), (7, dim, 1)),
                "b": jnp.zeros((1,)),
            },
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def codes_to_latent(
    params: Params, cfg: SnacConfig, codes: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """3 codebook layers → summed latent (B, T_latent, latent_dim).

    codes[i]: (B, n_i) int32 with n_i = T_latent / vq_strides[i].
    Mirrors ResidualVectorQuantize.from_codes: embed → 1x1 out-proj →
    nearest-neighbor upsample by the codebook stride → sum.
    """
    z = None
    for q, stride, c in zip(params["quantizer"], cfg.vq_strides, codes):
        emb = q["codebook"][c]                       # (B, n, codebook_dim)
        proj = conv1d(emb, q["out_proj"]["w"], q["out_proj"]["b"])
        if stride > 1:
            proj = jnp.repeat(proj, stride, axis=1)  # (B, n*stride, latent)
        z = proj if z is None else z + proj
    return z


def _mask_tail(x: jnp.ndarray, valid) -> jnp.ndarray:
    """Zero positions ≥ valid along the time axis (no-op when valid is None).

    Re-zeroing the pad zone after every spreading op makes a bucket-padded
    decode bit-equal to an unpadded decode on all content samples: a zero
    pad zone is indistinguishable from the zero padding 'same' convolutions
    apply at a true sequence end. Without this, pad *codes* act as fake
    future context and corrupt the last ~2.3 frames (the vocoder's
    influence reach) of every flush.

    `valid` may be a scalar or per-batch (B,) — batched multi-stream windows
    carry different content lengths.
    """
    if valid is None:
        return x
    valid = jnp.asarray(valid, jnp.int32)
    if valid.ndim == 0:
        valid = valid[None]
    t = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :, None]
    return jnp.where(t < valid[:, None, None], x, jnp.zeros_like(x))


def _residual_unit(x, p, dilation, groups, valid=None, use_pallas=False):
    t = x.shape[1]
    if use_pallas and groups == x.shape[-1] and t % min(512, t) == 0:
        # fused Pallas path: snake→dwconv→snake→pwconv→add in one VMEM pass
        # (depthwise geometry only — the released SNAC's). Position-wise
        # deterministic, so windowed streaming stays bit-exact vs batch as
        # long as both run the same path.
        from tts_inference_tpu.ops.pallas.vocoder import fused_residual_unit

        return fused_residual_unit(x, p, dilation, valid)
    y = snake(x, p["alpha1"])
    pad = ((7 - 1) * dilation) // 2
    y = conv1d(y, p["conv1"]["w"], p["conv1"]["b"], dilation=dilation,
               padding=pad, groups=groups)
    y = snake(y, p["alpha2"])
    y = conv1d(y, p["conv2"]["w"], p["conv2"]["b"])
    return _mask_tail(x + y, valid)


def decode_latent(
    params: Params,
    cfg: SnacConfig,
    z: jnp.ndarray,
    *,
    noise_seed: int | jnp.ndarray = 0,
    latent_offset: jnp.ndarray | int = 0,
    use_noise: Optional[bool] = None,
    valid_latent: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Latent (B, T, latent_dim) → waveform (B, T*512) in [-1, 1].

    ``latent_offset`` is the absolute latent position of z[:, 0]; it anchors
    the deterministic noise so windowed decodes match batch decodes.
    ``valid_latent`` (traced scalar) marks the true content length in latent
    steps; the padded tail beyond it is forced to behave like a sequence end
    (see _mask_tail) so bucketed shapes never change the audio.
    """
    dp = params["decoder"]
    use_noise = cfg.noise if use_noise is None else use_noise
    # Measured on a v5e (PERF.md): XLA's own fusion beats the hand-written
    # kernel on this conv stack (0.86–0.94×) — pallas_call boundaries cost
    # more than the saved HBM round trips. Default OFF; the kernel stays
    # available (and parity-tested) for explicit experimentation.
    use_pallas = bool(cfg.use_pallas)

    z = _mask_tail(z, valid_latent)
    if cfg.depthwise:
        x = conv1d(z, dp["in"]["dw"]["w"], dp["in"]["dw"]["b"], padding=3,
                   groups=cfg.latent_dim)
        x = conv1d(x, dp["in"]["pw"]["w"], dp["in"]["pw"]["b"])
    else:
        x = conv1d(z, dp["in"]["conv"]["w"], dp["in"]["conv"]["b"], padding=3)
    x = _mask_tail(x, valid_latent)

    up_total = 1
    valid = valid_latent
    for i, (bp, rate) in enumerate(zip(dp["blocks"], cfg.decoder_rates)):
        out_dim = x.shape[-1] // 2
        groups = out_dim if cfg.depthwise else 1
        x = snake(x, bp["alpha"])
        x = conv_transpose1d(
            x, bp["up"]["w"], bp["up"]["b"],
            stride=rate, padding=math.ceil(rate / 2),
            output_padding=rate % 2,
        )
        up_total *= rate
        valid = None if valid is None else valid * rate
        x = _mask_tail(x, valid)
        if use_noise and bp["noise_lin"] is not None:
            h = conv1d(x, bp["noise_lin"]["w"])
            noise = position_noise(
                jnp.asarray(noise_seed, jnp.uint32), i,
                jnp.asarray(latent_offset, jnp.uint32) * jnp.uint32(up_total),
                x.shape[1], x.shape[0],
            )
            # noise is generated in f32 (Box–Muller needs the mantissa);
            # cast the product so a bf16 compute path stays bf16 instead
            # of silently promoting every later conv to f32
            x = _mask_tail(x + (noise * h).astype(x.dtype), valid)
        for dil, rp in zip((1, 3, 9), bp["res"]):
            x = _residual_unit(x, rp, dil, groups, valid,
                               use_pallas=use_pallas)

    x = snake(x, dp["out_alpha"])
    x = conv1d(x, dp["out_conv"]["w"], dp["out_conv"]["b"], padding=3)
    # PCM contract is float32 regardless of the compute dtype
    return jnp.tanh(x)[..., 0].astype(jnp.float32)


def decode_codes(
    params: Params,
    cfg: SnacConfig,
    codes: Sequence[jnp.ndarray],
    *,
    noise_seed: int | jnp.ndarray = 0,
    latent_offset: jnp.ndarray | int = 0,
    use_noise: Optional[bool] = None,
    valid_latent: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full decode: 3 code layers → waveform (B, samples)."""
    z = codes_to_latent(params, cfg, codes)
    return decode_latent(
        params, cfg, z,
        noise_seed=noise_seed, latent_offset=latent_offset,
        use_noise=use_noise, valid_latent=valid_latent,
    )


def to_pcm16(audio: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float → int16 PCM (reference: modal_audio_stream.py:199-201)."""
    return jnp.clip(audio * 32767.0, -32768.0, 32767.0).astype(jnp.int16)


@dataclasses.dataclass
class SnacDecoder:
    """Convenience wrapper: jitted decode at bucketed frame counts.

    Static shapes per bucket keep XLA from recompiling every chunk length —
    the analog of the reference's fixed TRT engine shapes.
    """

    params: Params
    cfg: SnacConfig
    frame_buckets: Tuple[int, ...] = (8, 16, 32, 64, 128, 256, 512, 1024)
    use_noise: Optional[bool] = None

    def __post_init__(self):
        # cfg.dtype is the COMPUTE (and storage) dtype of the conv stack.
        # bf16 halves HBM traffic and doubles MXU rate on the decoder's
        # small-channel convs (the 64-slot tick is ~45% vocoder — PERF.md
        # round-4 floor analysis); conv accumulation stays f32 on TPU and
        # the PCM output is cast back to f32. Casting ONCE here (not in
        # the graph) keeps the weights bf16 in HBM.
        if self.cfg.dtype != "float32":
            dt = {"bfloat16": jnp.bfloat16,
                  "float16": jnp.float16}[self.cfg.dtype]
            self.params = jax.tree.map(
                lambda a: a.astype(dt)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                self.params,
            )
        self._decode = jax.jit(
            partial(decode_codes, use_noise=self.use_noise),
            static_argnums=(1,),
        )

    def bucket_frames(self, n_frames: int) -> int:
        for b in self.frame_buckets:
            if n_frames <= b:
                return b
        return n_frames

    def decode_frames(
        self,
        l1: np.ndarray,
        l2: np.ndarray,
        l3: np.ndarray,
        *,
        noise_seed: int = 0,
        first_frame: int = 0,
    ) -> np.ndarray:
        """Decode n frames (host API). Returns (samples,) float32 for the
        *actual* n frames, padding/truncating internally to a bucket."""
        out = self.decode_frames_batch(
            [(np.asarray(l1), np.asarray(l2), np.asarray(l3))],
            first_frames=[first_frame], noise_seeds=[noise_seed],
        )
        return out[0]

    def decode_frames_batch(
        self,
        layers,                 # list of (l1 (n_i,), l2 (2n_i,), l3 (4n_i,))
        *,
        first_frames,
        noise_seeds,
    ) -> list:
        """Decode several independent frame windows in ONE device call.

        The multi-stream scheduler stacks every stream's pending window here
        each tick — one dispatch round-trip instead of one per stream.
        BOTH dimensions are bucketed (rows to the next power of two, frames
        to frame_buckets) so the number of compiled graph shapes stays tiny;
        per-row valid-length masks keep each decode bit-identical to its
        solo decode and dummy pad rows are fully masked.
        """
        return self.decode_frames_batch_fetch(
            self.decode_frames_batch_launch(
                layers, first_frames=first_frames, noise_seeds=noise_seeds
            )
        )

    def decode_frames_batch_launch(self, layers, *, first_frames,
                                   noise_seeds):
        """Dispatch-only half of :meth:`decode_frames_batch`: launches the
        batched decode and queues the device→host copy, returning an opaque
        handle for :meth:`decode_frames_batch_fetch`.

        Lets callers (the scheduler's vocode worker) keep a decode in
        flight while fetching the previous one — the dispatch+fetch
        round-trip was the dominant vocode cost at 8 streams, not the
        decode itself."""
        n_rows = len(layers)
        ns = [int(l1.shape[-1]) for l1, _, _ in layers]
        nb = self.bucket_frames(max(ns))
        rb = 1
        while rb < n_rows:
            rb *= 2
        lat = max(self.cfg.vq_strides)

        def stack(idx, mult):
            out = np.zeros((rb, mult * nb), np.int32)
            for r, lay in enumerate(layers):
                x = np.asarray(lay[idx], dtype=np.int32)
                out[r, : x.shape[-1]] = x
            return jnp.asarray(out)

        def pad_vec(vals, dtype):
            out = np.zeros(rb, dtype)
            out[:n_rows] = vals
            return jnp.asarray(out)

        codes = (stack(0, 1), stack(1, 2), stack(2, 4))
        audio = self._decode(
            self.params, self.cfg, codes,
            noise_seed=pad_vec(list(noise_seeds), np.uint32),
            latent_offset=pad_vec(
                [f * lat for f in first_frames], np.uint32
            ),
            valid_latent=pad_vec([n * lat for n in ns], np.int32),
        )
        try:
            audio.copy_to_host_async()
        except Exception:
            pass
        return (audio, ns)

    def decode_frames_batch_fetch(self, handle) -> list:
        """Blocking half: host audio rows for a launched batch."""
        audio, ns = handle
        spf = self.cfg.samples_per_frame
        host = np.asarray(audio)
        return [host[r, : ns[r] * spf] for r in range(len(ns))]
