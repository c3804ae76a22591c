"""JAX vocoder tests: torch cross-check, shapes, streaming determinism.

The torch cross-check plays the role of the reference's HF-vs-TRT parity
harness (helpers/compare_snac.py): same weights through two independent
implementations must agree.
"""

import numpy as np
import pytest

from tts_inference_tpu.config import SnacConfig
from tts_inference_tpu.models import snac as jsnac
from tts_inference_tpu.models.loader import load_snac_torch_state

torch = pytest.importorskip("torch")
from tests.torch_snac_ref import TorchSnacRef  # noqa: E402

TINY = SnacConfig(
    latent_dim=32,
    decoder_dim=64,
    decoder_rates=(8, 8, 4, 2),
    codebook_size=64,
    codebook_dim=4,
    noise=True,
    depthwise=True,
)


def rand_codes(rng, cfg, n_frames, batch=1):
    lat = n_frames * max(cfg.vq_strides)
    return [
        rng.integers(0, cfg.codebook_size, size=(batch, lat // s)).astype(np.int32)
        for s in cfg.vq_strides
    ]


@pytest.fixture(scope="module")
def torch_and_jax():
    torch.manual_seed(0)
    tref = TorchSnacRef(TINY).eval()
    params = load_snac_torch_state(tref.state_dict(), TINY)
    return tref, params


@pytest.mark.parametrize("depthwise", [True, False])
@pytest.mark.parametrize("n_frames", [2, 5])
def test_matches_torch(depthwise, n_frames):
    cfg = SnacConfig(
        latent_dim=32, decoder_dim=64, decoder_rates=(8, 8, 4, 2),
        codebook_size=64, codebook_dim=4, noise=False, depthwise=depthwise,
    )
    torch.manual_seed(1)
    tref = TorchSnacRef(cfg).eval()
    params = load_snac_torch_state(tref.state_dict(), cfg)

    rng = np.random.default_rng(2)
    codes = rand_codes(rng, cfg, n_frames)
    t_audio = tref.decode([torch.from_numpy(c).long() for c in codes])
    j_audio = jsnac.decode_codes(params, cfg, codes, use_noise=False)

    t = t_audio.numpy()[:, 0, :]
    j = np.asarray(j_audio)
    assert j.shape == t.shape == (1, n_frames * cfg.samples_per_frame)
    np.testing.assert_allclose(j, t, atol=2e-5, rtol=1e-4)


def test_latent_matches_torch(torch_and_jax):
    tref, params = torch_and_jax
    rng = np.random.default_rng(3)
    codes = rand_codes(rng, TINY, 3)
    t_z = tref.quantizer.from_codes([torch.from_numpy(c).long() for c in codes])
    j_z = jsnac.codes_to_latent(params, TINY, codes)
    np.testing.assert_allclose(
        np.asarray(j_z), t_z.detach().numpy().transpose(0, 2, 1), atol=1e-5
    )


def test_decode_deterministic_with_noise(torch_and_jax):
    """Unlike torch SNAC ("decode twice gives different results",
    PIPELINE_REPORT.md:478-483), our noise is position-addressed: decode is
    a pure function."""
    _, params = torch_and_jax
    rng = np.random.default_rng(4)
    codes = rand_codes(rng, TINY, 4)
    a1 = np.asarray(jsnac.decode_codes(params, TINY, codes, noise_seed=7))
    a2 = np.asarray(jsnac.decode_codes(params, TINY, codes, noise_seed=7))
    np.testing.assert_array_equal(a1, a2)
    a3 = np.asarray(jsnac.decode_codes(params, TINY, codes, noise_seed=8))
    assert np.abs(a1 - a3).max() > 0


def test_noise_is_position_addressed(torch_and_jax):
    """Noise at absolute latent position p is the same regardless of window
    start — the property the windowed streaming decoder relies on."""
    n = jsnac.position_noise(1, 2, 0, 64, 2)
    n_shift = jsnac.position_noise(1, 2, 16, 48, 2)
    np.testing.assert_array_equal(np.asarray(n)[:, 16:], np.asarray(n_shift))


def test_pcm16():
    audio = np.array([[-2.0, -1.0, 0.0, 0.5, 1.0, 2.0]], dtype=np.float32)
    pcm = np.asarray(jsnac.to_pcm16(audio))
    assert pcm.dtype == np.int16
    assert pcm.tolist() == [[-32768, -32767, 0, 16383, 32767, 32767]]


@pytest.mark.slow
def test_decoder_wrapper_buckets(torch_and_jax):
    """Bucket padding must not change the audio AT ALL: the content-length
    mask makes the pad zone behave like a true sequence end, so decodes at
    different buckets are equal on every content sample."""
    _, params = torch_and_jax
    dec = jsnac.SnacDecoder(params, TINY, frame_buckets=(8, 16))
    rng = np.random.default_rng(5)
    codes = rand_codes(rng, TINY, 6)
    out = dec.decode_frames(codes[0][0], codes[1][0], codes[2][0])
    spf = TINY.samples_per_frame
    assert out.shape == (6 * spf,)
    dec2 = jsnac.SnacDecoder(params, TINY, frame_buckets=(16,))
    out2 = dec2.decode_frames(codes[0][0], codes[1][0], codes[2][0])
    np.testing.assert_allclose(out, out2, atol=1e-5)
    # and equals the truly unpadded decode
    full = np.asarray(jsnac.decode_codes(
        params, TINY, [c for c in codes], noise_seed=0
    ))[0]
    np.testing.assert_allclose(out, full, atol=1e-5)


def test_receptive_field_bounded(torch_and_jax):
    """Measure the decoder's temporal receptive field: perturb one frame,
    assert the affected output span is bounded. This calibrates the
    streaming window margins (StreamConfig.left_context/lookahead)."""
    _, params = torch_and_jax
    rng = np.random.default_rng(6)
    n_frames = 16
    codes = rand_codes(rng, TINY, n_frames)
    base = np.asarray(jsnac.decode_codes(params, TINY, codes, use_noise=False))[0]

    # perturb the middle frame (frame 8) in all 3 layers
    mid = 8
    codes2 = [c.copy() for c in codes]
    for li, s in enumerate(TINY.vq_strides):
        lat_per_frame = max(TINY.vq_strides)
        i0 = mid * lat_per_frame // s
        i1 = (mid + 1) * lat_per_frame // s
        codes2[li][0, i0:i1] = (codes2[li][0, i0:i1] + 1) % TINY.codebook_size
    pert = np.asarray(jsnac.decode_codes(params, TINY, codes2, use_noise=False))[0]

    diff = np.abs(base - pert) > 1e-7
    changed = np.flatnonzero(diff)
    spf = TINY.samples_per_frame
    left_reach = mid * spf - changed.min()
    right_reach = changed.max() - (mid + 1) * spf + 1
    # The reach is set by the conv stack geometry (kernels/dilations/rates),
    # not the channel widths, so the tiny config measures the real model:
    # ±4671 samples = ±2.29 frames. Default lookahead=5 and
    # left_context=16 therefore give BIT-EXACT windowed streaming — tighter
    # than the reference's 0.9987-correlation-at-5-frames
    # (PIPELINE_REPORT.md:513-519), whose residual error came from its
    # nondeterministic noise.
    assert left_reach <= 3 * spf, f"left reach {left_reach} samples"
    assert right_reach <= 3 * spf, f"right reach {right_reach} samples"


def test_decode_frames_batch_matches_solo(torch_and_jax):
    """Stacked multi-window decode (different lengths/offsets/seeds, padded
    rows) must match each window's solo decode to float tolerance."""
    _, params = torch_and_jax
    dec = jsnac.SnacDecoder(params, TINY, frame_buckets=(8, 16))
    rng = np.random.default_rng(9)
    specs = [(5, 0, 1), (8, 4, 2), (3, 11, 3)]   # (frames, first_frame, seed)
    layers, solos = [], []
    for n, f0, seed in specs:
        c = rand_codes(rng, TINY, n)
        l1, l2, l3 = c[0][0], c[1][0], c[2][0]
        layers.append((l1, l2, l3))
        solos.append(dec.decode_frames(l1, l2, l3, noise_seed=seed,
                                       first_frame=f0))
    outs = dec.decode_frames_batch(
        layers, first_frames=[s[1] for s in specs],
        noise_seeds=[s[2] for s in specs],
    )
    for got, want in zip(outs, solos):
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_bf16_compute_dtype(torch_and_jax):
    """cfg.dtype='bfloat16' (the 64-slot throughput option — PERF.md r4):

    - PCM stays float32 at the API boundary
    - bf16 audio tracks the f32 decode closely (corr, scale)
    - windowed streaming is bit-exact vs batch WITHIN the bf16 path —
      the exactness invariant is per-dtype, not vs f32
    """
    import dataclasses

    _, params = torch_and_jax
    rng = np.random.default_rng(11)
    c = rand_codes(rng, TINY, 12)
    l1, l2, l3 = c[0][0], c[1][0], c[2][0]

    dec32 = jsnac.SnacDecoder(params, TINY)
    cfg16 = dataclasses.replace(TINY, dtype="bfloat16")
    dec16 = jsnac.SnacDecoder(params, cfg16)

    a32 = dec32.decode_frames(l1, l2, l3, noise_seed=5)
    a16 = dec16.decode_frames(l1, l2, l3, noise_seed=5)
    assert a16.dtype == np.float32
    assert a16.shape == a32.shape
    denom = np.linalg.norm(a32) * np.linalg.norm(a16)
    corr = float(np.dot(a32, a16) / max(denom, 1e-12))
    assert corr > 0.99, f"bf16/f32 corr {corr}"
    # bf16 error should be small relative to signal (random tiny weights
    # are the worst case; real checkpoints gate via tools/audio_fidelity)
    rel = np.linalg.norm(a32 - a16) / max(np.linalg.norm(a32), 1e-12)
    assert rel < 0.15, f"bf16 rel err {rel}"

    # windowed == batch bit-exactness must hold inside the bf16 path
    from tts_inference_tpu.config import StreamConfig
    from tts_inference_tpu.streaming.lookahead import (
        LookaheadStreamingDecoder,
    )

    # interleave back to the wire layout (protocol position offsets added;
    # deinterleave_frames subtracts them)
    from tts_inference_tpu import protocol

    frames = []
    for f in range(12):
        raw = [
            l1[f], l2[2 * f], l3[4 * f], l3[4 * f + 1],
            l2[2 * f + 1], l3[4 * f + 2], l3[4 * f + 3],
        ]
        frames.append([int(v) + int(o) for v, o in
                       zip(raw, protocol.POSITION_OFFSETS)])
    flat = np.asarray(frames, np.int32).reshape(-1)
    back = protocol.deinterleave_frames(flat)
    np.testing.assert_array_equal(back[0], l1)
    np.testing.assert_array_equal(back[1], l2)
    np.testing.assert_array_equal(back[2], l3)
    sd = LookaheadStreamingDecoder(
        dec16, StreamConfig(frames_per_chunk=2, first_chunk_frames=1,
                            lookahead_frames=3, left_context_frames=6),
        noise_seed=5,
    )
    sd.feed(flat)
    chunks = []
    while True:
        out = sd.poll()
        if out is None:
            break
        chunks.append(out)
    fl = sd.flush()
    if fl is not None:
        chunks.append(fl)
    streamed = np.concatenate(chunks)
    np.testing.assert_array_equal(streamed, a16)
