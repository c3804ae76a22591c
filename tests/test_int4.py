"""int4 weight-only quantization: packing, kernel parity, model integration.

The int4 Pallas matvec is the round-3 lever on the decode weight-read
floor (PERF.md speed-of-light audit: int8 decode is HBM-bound at
~3.9 ms/step; int4 halves the bytes). The pure-XLA int4 probe was 0.6×
int8 speed because the unpack materializes — the kernel keeps packed
bytes packed until VMEM (reference motivation: bitsandbytes 4-bit loads,
SURVEY.md §2.2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tts_inference_tpu.ops.pallas.int4_matmul import (
    int4_mm,
    int4_mm_reference,
    pack_int4,
    unpack_int4,
)
from tts_inference_tpu.models.quant import (
    QuantLinearI4,
    mm,
    quantize_linear_i4,
    quantize_llama_params,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for k, n in [(256, 128), (64, 64), (1024, 384)]:
        q = rng.integers(-8, 8, size=(k, n)).astype(np.int32)
        u = unpack_int4(pack_int4(jnp.array(q)))
        assert np.array_equal(np.asarray(u), q)


@pytest.mark.parametrize("m,k,n", [(1, 1024, 512), (16, 256, 384), (5, 64, 64)])
def test_kernel_matches_reference(m, k, n):
    """Pallas kernel (interpret mode on CPU) ≡ the jnp twin bit-for-bit
    modulo f32 association: same int nibbles, same group-scaled partials."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.02
    ql = quantize_linear_i4(jnp.array(w))
    x = jnp.array(rng.standard_normal((m, k), dtype=np.float32) * 0.5,
                  dtype=jnp.bfloat16)
    ref = np.asarray(int4_mm_reference(x, ql.w_p, ql.scale), np.float32)
    ker = np.asarray(int4_mm(x, ql.w_p, ql.scale, interpret=True), np.float32)
    scale = np.abs(ref).max() + 1e-9
    assert np.max(np.abs(ref - ker)) / scale < 2e-2   # bf16 out rounding


def test_quantization_error_bounded():
    """Per-group int4 keeps relative matmul error in the few-percent range
    (per-channel-only int4 would not — that is why the scales are grouped)."""
    rng = np.random.default_rng(2)
    k, n = 1024, 512
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.02
    ql = quantize_linear_i4(jnp.array(w))
    x = rng.standard_normal((8, k), dtype=np.float32) * 0.5
    fp = x @ w
    qo = np.asarray(
        int4_mm_reference(jnp.array(x, dtype=jnp.float32), ql.w_p, ql.scale),
        np.float32)
    rel_rms = np.linalg.norm(fp - qo) / (np.linalg.norm(fp) + 1e-9)
    assert rel_rms < 0.15, rel_rms
    # finer groups must reduce error (the scales are grouped for a reason);
    # the default 512 group trades ~13% more error (0.133 vs 0.118 rel_rms
    # on gaussian weights) for a dequant the v5e VPU can afford — see
    # ops/pallas/int4_matmul.py
    ql_f = quantize_linear_i4(jnp.array(w), group=128)
    qo_f = np.asarray(
        int4_mm_reference(jnp.array(x, dtype=jnp.float32),
                          ql_f.w_p, ql_f.scale), np.float32)
    assert np.linalg.norm(fp - qo_f) < np.linalg.norm(fp - qo)


def test_mm_dispatch_and_shapes():
    rng = np.random.default_rng(3)
    w = jnp.array(rng.standard_normal((64, 48), dtype=np.float32))
    ql = quantize_linear_i4(w)
    assert isinstance(ql, QuantLinearI4)
    assert ql.w_p.shape == (32, 128)      # out lane-padded 48 → 128
    assert ql.scale.shape == (2, 48)      # group shrunk to K/2 = 32
    x = jnp.array(rng.standard_normal((2, 3, 64), dtype=np.float32),
                  dtype=jnp.bfloat16)
    y = mm(x, ql)                          # CPU → reference path
    assert y.shape == (2, 3, 48)
    ref = int4_mm_reference(x, ql.w_p, ql.scale)
    assert np.allclose(np.asarray(y, np.float32),
                       np.asarray(ref, np.float32))


def test_quantize_llama_params_bits4():
    """bits=4 converts the 7 per-layer linears to I4, embed/head stay int8;
    the tiny model still decodes coherently (logits close to fp model's)."""
    from tts_inference_tpu.config import ModelConfig
    from tts_inference_tpu.models import llama

    cfg = ModelConfig.tiny()
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    q4 = quantize_llama_params(params, bits=4)
    lp = q4["layers"][0]
    for key in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        assert isinstance(lp[key], QuantLinearI4), key
    toks = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    lens = jnp.array([4], jnp.int32)
    cache = llama.init_kv_cache(cfg, batch=1, max_seq=16)
    logits_fp, _ = llama.prefill(params, cfg, toks, lens, cache)
    cache = llama.init_kv_cache(cfg, batch=1, max_seq=16)
    logits_q4, _ = llama.prefill(q4, cfg, toks, lens, cache)
    lf = np.asarray(logits_fp, np.float32).ravel()
    lq = np.asarray(logits_q4, np.float32).ravel()
    # a random-init tiny model amplifies quant noise far more than a trained
    # one; the integration contract here is "same model, recognizably the
    # same logits" (real-model quality is gated by tools/audio_fidelity.py)
    corr = np.corrcoef(lf, lq)[0, 1]
    assert corr > 0.95, corr
