"""int4 KV pool tests (ops/pallas/paged_attention_int4.py).

The int4 KV cache halves the int8 pools' bytes again for the KV-read-bound
regimes (long-audio 12k-token windows, 64 active slots — PERF.md). Unlike
paged/int8-vs-dense, int4 is LOSSY, so the correctness bar splits:

- exact: pack/unpack roundtrip; kernel == jnp reference twin (same
  quantized ints, scale-after-dot == dequantize-then-dot by linearity);
  prefix-cache injection == plain prefill (both quantize the same fp K/V);
  sharded == unsharded.
- bounded: attention outputs and engine logits stay close to the fp paged
  path (per-(pos,head) absmax/7 quantization).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_inference_tpu.config import EngineConfig, ModelConfig, SamplingConfig
from tts_inference_tpu.engine.engine import EngineCore
from tts_inference_tpu.models import llama
from tts_inference_tpu.ops import sampling as S
from tts_inference_tpu.ops.pallas.paged_attention_int4 import (
    pack_kv_int4,
    paged_decode_attention_int4,
    paged_decode_attention_int4_reference,
    planes_to_scales,
    quantize_kv_int4,
    scales_to_planes,
    unpack_kv_int4,
)

CFG = ModelConfig.tiny(vocab_size=512)
PAGED = EngineConfig(
    max_batch_size=4, max_input_len=32, max_output_len=96,
    prefill_buckets=(8, 16, 32), kv_buckets=(32, 64),
    decode_steps_per_call=4, paged_kv=True, kv_block_size=16,
)
I4 = dataclasses.replace(PAGED, kv_cache_int4=True)


@pytest.fixture(scope="module")
def params():
    return llama.init_llama_params(jax.random.PRNGKey(0), CFG)


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for shape in ((4, 2, 16), (3, 5, 8, 128), (1, 6, 32)):
        q = rng.integers(-7, 8, size=shape).astype(np.int32)
        packed = pack_kv_int4(jnp.asarray(q))
        hkv = shape[-2]
        assert packed.shape == (*shape[:-2], hkv // 2, shape[-1])
        assert packed.dtype == jnp.int8
        back = np.asarray(unpack_kv_int4(packed, hkv))
        np.testing.assert_array_equal(back, q)


def test_scale_plane_roundtrip():
    rng = np.random.default_rng(5)
    s = jnp.asarray(rng.uniform(size=(3, 7, 8)).astype(np.float32))
    planes = scales_to_planes(s)
    assert planes.shape == (3, 7, 2, 4)
    # plane 0 = low heads (2p), plane 1 = high heads (2p+1)
    np.testing.assert_array_equal(np.asarray(planes[..., 0, 1]),
                                  np.asarray(s[..., 2]))
    np.testing.assert_array_equal(np.asarray(planes[..., 1, 3]),
                                  np.asarray(s[..., 7]))
    np.testing.assert_array_equal(np.asarray(planes_to_scales(planes)),
                                  np.asarray(s))


def test_quantize_error_bound():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 32)).astype(np.float32))
    packed, scale = quantize_kv_int4(x)
    deq = unpack_kv_int4(packed, 4).astype(jnp.float32) * scale[..., None]
    err = np.abs(np.asarray(deq) - np.asarray(x))
    # symmetric absmax/7 rounding: |err| <= scale/2 per element
    assert (err <= np.asarray(scale)[..., None] / 2 + 1e-6).all()


# ---------------------------------------------------------------------------
# Kernel vs reference twin (exact math, interpret mode)
# ---------------------------------------------------------------------------


def _random_pools(rng, n_blocks, bs, hkv, d):
    """Quantize fp pools into the storage layouts: packed pair-batched
    (N, P2, bs, D) + nibble-plane scales (N, 2, P2, bs)."""
    kf = rng.normal(size=(n_blocks, bs, hkv, d)).astype(np.float32)
    vf = rng.normal(size=(n_blocks, bs, hkv, d)).astype(np.float32)
    kp, ks = quantize_kv_int4(jnp.asarray(kf))     # (N,bs,P2,D), (N,bs,Hkv)
    vp, vs = quantize_kv_int4(jnp.asarray(vf))
    return (jnp.moveaxis(kp, 1, 2), jnp.moveaxis(vp, 1, 2),
            jnp.moveaxis(scales_to_planes(ks), 1, 3),
            jnp.moveaxis(scales_to_planes(vs), 1, 3))


def test_kernel_interpret_matches_reference():
    rng = np.random.default_rng(2)
    b, hkv, g, d, bs, wb, nblk = 2, 2, 3, 128, 16, 3, 8
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)).astype(np.float32))
    kp, vp, ks, vs = _random_pools(rng, nblk, bs, hkv, d)
    table = jnp.asarray(
        rng.integers(1, nblk, size=(b, wb)).astype(np.int32))
    pos = jnp.asarray(np.array([37, 12], np.int32))
    got = paged_decode_attention_int4(
        q, kp, vp, ks, vs, table, pos, interpret=True)
    want = paged_decode_attention_int4_reference(
        q, kp, vp, ks, vs, table, pos)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_reference_twin_equals_dequantized_dense():
    """Scale-after-dot (and all the pool-layout plumbing) == dequantizing
    in the NATURAL (pos, head, dim) layout then dense attention."""
    import math

    rng = np.random.default_rng(3)
    b, hkv, g, d, bs, wb, nblk = 1, 4, 2, 16, 8, 2, 6
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(nblk, bs, hkv, d)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(nblk, bs, hkv, d)).astype(np.float32))
    kp_n, ks_n = quantize_kv_int4(kf)        # natural layouts
    vp_n, vs_n = quantize_kv_int4(vf)
    table = jnp.asarray(rng.integers(1, nblk, size=(b, wb)).astype(np.int32))
    pos = jnp.asarray(np.array([11], np.int32))

    # dequantize in the natural layout, no pool rearrangement involved
    k = (unpack_kv_int4(kp_n, hkv).astype(jnp.float32)
         * ks_n[..., None])[table].reshape(b, wb * bs, hkv, d)
    v = (unpack_kv_int4(vp_n, hkv).astype(jnp.float32)
         * vs_n[..., None])[table].reshape(b, wb * bs, hkv, d)
    s = jnp.einsum("bhgd,bkhd->bhgk", q, k) / math.sqrt(d)
    col = jnp.arange(wb * bs)[None, None, None, :]
    s = jnp.where(col <= pos[:, None, None, None], s, -1e30)
    want = jnp.einsum("bhgk,bkhd->bhgd", jax.nn.softmax(s, -1), v)

    got = paged_decode_attention_int4_reference(
        q, jnp.moveaxis(kp_n, 1, 2), jnp.moveaxis(vp_n, 1, 2),
        jnp.moveaxis(scales_to_planes(ks_n), 1, 3),
        jnp.moveaxis(scales_to_planes(vs_n), 1, 3), table, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Model / engine level
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_model_paged_int4_close_to_fp(params):
    """Bounded-loss check: int4 KV logits track the fp paged path under
    TEACHER FORCING (both paths see identical input tokens — greedy
    feedback would compound a single argmax flip into full divergence)."""
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, 512, size=(2, 8)).astype(np.int32)
    forced = rng.integers(0, 512, size=(4, 2)).astype(np.int32)
    lens = np.full((2,), 8, np.int32)

    def run(int4):
        cache = llama.init_paged_kv_cache(
            CFG, 2, 64, num_blocks=12, block_size=16, int4=int4)
        table = np.zeros((2, 4), np.int32)
        table[0] = [1, 2, 3, 4]
        table[1] = [5, 6, 7, 8]
        cache = cache._replace(block_table=jnp.asarray(table))
        logits, cache = llama.prefill(
            params, CFG, jnp.asarray(tokens), jnp.asarray(lens), cache)
        outs = [np.asarray(logits)]
        for step in range(4):
            logits, cache = llama.decode_one(
                params, CFG, jnp.asarray(forced[step]), cache, kv_window=32)
            outs.append(np.asarray(logits))
        return np.stack(outs)

    fp = run(False)
    i4 = run(True)
    # mechanism bound, not a quality gate (tiny head_dim=16 averages int4
    # noise far less than the real 128-dim heads; fidelity gating lives in
    # tools/audio_fidelity.py on real checkpoints)
    cos = (fp * i4).sum() / (np.linalg.norm(fp) * np.linalg.norm(i4))
    assert cos > 0.98, cos
    rel = np.linalg.norm(fp - i4) / np.linalg.norm(fp)
    assert rel < 0.25, rel


def engine_tokens(core, prompts, slots, reserve):
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), core.batch)
    core.seed_slots(slots, [7] * len(slots))
    t0, tok, act = core.prefill_decode_launch(
        prompts, slots, sp,
        np.zeros(core.batch, np.int32), np.zeros(core.batch, bool),
        n=3, reserve_extra=reserve,
    )
    t1, tok, act = core.decode_steps_launch(sp, tok, act)
    t2, _, _ = core.decode_steps_launch(sp, tok, act)
    return np.concatenate(
        [np.asarray(t0), np.asarray(t1), np.asarray(t2)], axis=1
    )


def test_engine_paged_int4_deterministic(params):
    """Greedy int4-KV generation is valid and bit-repeatable."""
    prompts = [[7, 8, 9, 10, 11], [13, 14, 15]]
    a = engine_tokens(
        EngineCore(params, CFG, I4, eos_id=5), prompts, [0, 1], [24, 24])
    b = engine_tokens(
        EngineCore(params, CFG, I4, eos_id=5), prompts, [0, 1], [24, 24])
    np.testing.assert_array_equal(a[:2], b[:2])
    assert ((a[:2] >= 0) & (a[:2] < 512)).all()


def test_prefix_cache_int4_bit_exact_vs_plain(params):
    """Prefix injection quantizes the same fp K/V a plain prefill would —
    cached and uncached greedy streams must match bit-for-bit."""
    pfx = dataclasses.replace(I4, prefix_cache=True, prefix_len=8)
    header = [101, 102, 103, 104, 105, 106, 107, 108]
    prompts = [header + [30, 31, 32, 33]]
    a = engine_tokens(EngineCore(params, CFG, pfx, eos_id=5), prompts, [0],
                      [24])
    b = engine_tokens(EngineCore(params, CFG, I4, eos_id=5), prompts, [0],
                      [24])
    np.testing.assert_array_equal(a[:1], b[:1])
    # and a second identical request (the HIT path) matches too
    core = EngineCore(params, CFG, pfx, eos_id=5)
    first = engine_tokens(core, prompts, [0], [24])
    core.reset_slots([0])
    assert core.prefix_hits == 0
    second = engine_tokens(core, prompts, [0], [24])
    assert core.prefix_hits >= 1
    np.testing.assert_array_equal(first[:1], second[:1])


def test_sharded_paged_int4_matches(params):
    from tts_inference_tpu.config import MeshConfig
    from tts_inference_tpu.parallel import mesh as M

    assert jax.device_count() >= 4
    cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16, rope_scaling_factor=None, max_position_embeddings=256,
        dtype="float32",
    )
    p = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    mesh = M.make_mesh(MeshConfig(dp=2, tp=2))   # pairs=2, tp | pairs
    prompts = [[7, 8, 9, 10], [13, 14]]
    a = engine_tokens(
        EngineCore(p, cfg, I4, eos_id=5, mesh=mesh), prompts, [0, 1],
        [24, 24],
    )
    b = engine_tokens(
        EngineCore(p, cfg, I4, eos_id=5), prompts, [0, 1], [24, 24]
    )
    np.testing.assert_array_equal(a[:2], b[:2])


def test_int4_requires_paged(params):
    dense_i4 = dataclasses.replace(
        I4, paged_kv=False)
    with pytest.raises(ValueError, match="paged"):
        EngineCore(params, CFG, dense_i4, eos_id=5)


def test_int4_int8_exclusive():
    with pytest.raises(ValueError, match="exclusive"):
        llama.init_paged_kv_cache(
            CFG, 2, 64, num_blocks=4, block_size=16, int8=True, int4=True)


def test_tp_must_divide_pairs(params):
    from tts_inference_tpu.config import MeshConfig
    from tts_inference_tpu.parallel import mesh as M

    assert jax.device_count() >= 4
    # tiny CFG has 2 kv heads = 1 pair; tp=2 cannot split it
    mesh = M.make_mesh(MeshConfig(dp=2, tp=2))
    with pytest.raises(ValueError, match="pairs"):
        EngineCore(params, CFG, I4, eos_id=5, mesh=mesh)


def test_paged_int4_kernel_multi_block_tail(monkeypatch):
    """Ceil-grid super-blocks on the packed-int4 kernel: non-dividing WB
    clamps tail operand indices; column mask discards the duplicates."""
    import jax.numpy as jnp
    import numpy as np

    from tts_inference_tpu.ops.pallas import paged_attention as PA
    from tts_inference_tpu.ops.pallas.paged_attention_int4 import (
        paged_decode_attention_int4, paged_decode_attention_int4_reference,
        quantize_kv_int4, scales_to_planes,
    )

    monkeypatch.setattr(PA, "MAX_BLOCKS_PER_STEP", 2)
    rng = np.random.default_rng(13)
    b, hkv, g, d, bs, wb = 2, 4, 3, 128, 16, 5
    n = wb * b + 1
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(n, bs, hkv, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(n, bs, hkv, d)), jnp.float32)
    k4n, k4s = quantize_kv_int4(kf)
    v4n, v4s = quantize_kv_int4(vf)
    kp = jnp.moveaxis(k4n, 1, 2)                    # (N, P2, bs, D)
    vp = jnp.moveaxis(v4n, 1, 2)
    ks = jnp.moveaxis(scales_to_planes(k4s), 1, 3)  # (N, 2, P2, bs)
    vs = jnp.moveaxis(scales_to_planes(v4s), 1, 3)
    perm = rng.permutation(np.arange(1, n))
    table = jnp.asarray(perm.reshape(b, wb), jnp.int32)
    pos = jnp.asarray([wb * bs - 1, wb * bs // 3], jnp.int32)
    want = paged_decode_attention_int4_reference(
        q, kp, vp, ks, vs, table, pos)
    got = paged_decode_attention_int4(q, kp, vp, ks, vs, table, pos,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)
