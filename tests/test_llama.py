"""Decoder parity tests vs HF transformers (eager twin).

This is the reference's numerical-equivalence methodology
(helpers/debug_tokens.py: greedy token-by-token diff between backends,
SURVEY.md §4.2) housed in pytest: the JAX decoder must match a randomly
initialized HF LlamaForCausalLM bit-for-float on logits and greedy tokens.
"""

import numpy as np
import pytest

from tts_inference_tpu.config import ModelConfig
from tts_inference_tpu.models import llama as jllama
from tts_inference_tpu.models.loader import llama_params_from_hf_state

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

TINY = ModelConfig.tiny(vocab_size=512)


def hf_tiny(cfg: ModelConfig, seed=0, rope_scaling=None, tie=True):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        rope_scaling=rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def pair():
    model = hf_tiny(TINY)
    sd = model.state_dict()
    # HF tied models may omit lm_head.weight from state_dict — fine, we tie.
    params = llama_params_from_hf_state(sd, TINY, dtype=jnp.float32)
    return model, params


def hf_logits(model, tokens):
    with torch.inference_mode():
        return model(torch.from_numpy(tokens).long()).logits.numpy()


def test_prefill_logits_match_hf(pair):
    model, params = pair
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, TINY.vocab_size, size=(2, 17)).astype(np.int32)
    want = hf_logits(model, tokens)

    cache = jllama.init_kv_cache(TINY, batch=2, max_seq=32, dtype=jnp.float32)
    lens = jnp.array([17, 17], jnp.int32)
    hidden, cache = jllama.forward(
        params, TINY, jnp.asarray(tokens), cache,
        jnp.zeros(2, jnp.int32), lens,
    )
    logits = jllama.compute_logits(params, TINY, hidden)
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-4, rtol=1e-3)
    assert np.asarray(cache.lengths).tolist() == [17, 17]


def test_prefill_respects_padding(pair):
    """Right-padded short prompt must produce the same last-token logits as
    the unpadded prompt (padding garbage masked out of attention)."""
    model, params = pair
    rng = np.random.default_rng(1)
    toks = rng.integers(0, TINY.vocab_size, size=(1, 9)).astype(np.int32)
    want = hf_logits(model, toks)[0, -1]

    padded = np.zeros((1, 16), np.int32)
    padded[0, :9] = toks
    cache = jllama.init_kv_cache(TINY, batch=1, max_seq=32, dtype=jnp.float32)
    last, _ = jllama.prefill(
        params, TINY, jnp.asarray(padded), jnp.array([9], jnp.int32), cache
    )
    np.testing.assert_allclose(np.asarray(last[0]), want, atol=2e-4, rtol=1e-3)


def test_incremental_decode_matches_full_forward(pair):
    """decode_one over the cache == full forward logits at each position."""
    model, params = pair
    rng = np.random.default_rng(2)
    toks = rng.integers(0, TINY.vocab_size, size=(1, 12)).astype(np.int32)
    want = hf_logits(model, toks)

    cache = jllama.init_kv_cache(TINY, batch=1, max_seq=32, dtype=jnp.float32)
    last, cache = jllama.prefill(
        params, TINY, jnp.asarray(toks[:, :4]),
        jnp.array([4], jnp.int32), cache,
    )
    np.testing.assert_allclose(np.asarray(last[0]), want[0, 3], atol=2e-4, rtol=1e-3)
    for i in range(4, 12):
        logits, cache = jllama.decode_one(
            params, TINY, jnp.asarray(toks[:, i]), cache
        )
        np.testing.assert_allclose(
            np.asarray(logits[0]), want[0, i], atol=3e-4, rtol=1e-3,
            err_msg=f"step {i}",
        )


def test_greedy_generation_parity(pair):
    """Greedy continuation (temp=0) token-by-token equals HF generate —
    the debug_tokens.py first-mismatch methodology."""
    model, params = pair
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, TINY.vocab_size, size=(1, 8)).astype(np.int32)
    n_new = 16
    with torch.inference_mode():
        out = model.generate(
            torch.from_numpy(prompt).long(),
            max_new_tokens=n_new, do_sample=False,
            pad_token_id=0,
        ).numpy()[0, 8:]

    cache = jllama.init_kv_cache(TINY, batch=1, max_seq=64, dtype=jnp.float32)
    last, cache = jllama.prefill(
        params, TINY, jnp.asarray(prompt), jnp.array([8], jnp.int32), cache
    )
    got = []
    tok = jnp.argmax(last, axis=-1).astype(jnp.int32)
    for i in range(n_new):
        got.append(int(tok[0]))
        if i < n_new - 1:
            logits, cache = jllama.decode_one(params, TINY, tok, cache)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert got == out.tolist(), (
        f"first mismatch at {next(i for i, (a, b) in enumerate(zip(got, out)) if a != b)}"
    )


def test_llama3_rope_scaling_matches_hf():
    cfg = ModelConfig.tiny()
    cfg = type(cfg)(**{
        **cfg.__dict__,
        "rope_scaling_factor": 8.0,
        "rope_low_freq_factor": 1.0,
        "rope_high_freq_factor": 4.0,
        "rope_original_max_position": 64,
    })
    model = hf_tiny(
        cfg, seed=7,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0,
            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
    )
    params = llama_params_from_hf_state(model.state_dict(), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    toks = rng.integers(0, cfg.vocab_size, size=(1, 80)).astype(np.int32)
    want = hf_logits(model, toks)
    cache = jllama.init_kv_cache(cfg, batch=1, max_seq=96, dtype=jnp.float32)
    hidden, _ = jllama.forward(
        params, cfg, jnp.asarray(toks), cache,
        jnp.zeros(1, jnp.int32), jnp.array([80], jnp.int32),
    )
    logits = jllama.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), want, atol=5e-4, rtol=2e-3)


def test_untied_lm_head():
    cfg = type(TINY)(**{**TINY.__dict__, "tie_word_embeddings": False})
    model = hf_tiny(cfg, seed=9, tie=False)
    params = llama_params_from_hf_state(model.state_dict(), cfg, dtype=jnp.float32)
    assert "lm_head" in params
    rng = np.random.default_rng(5)
    toks = rng.integers(0, cfg.vocab_size, size=(1, 6)).astype(np.int32)
    want = hf_logits(model, toks)
    cache = jllama.init_kv_cache(cfg, batch=1, max_seq=16, dtype=jnp.float32)
    hidden, _ = jllama.forward(
        params, cfg, jnp.asarray(toks), cache,
        jnp.zeros(1, jnp.int32), jnp.array([6], jnp.int32),
    )
    logits = jllama.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-4, rtol=1e-3)


def test_int8_quantized_forward_close(pair):
    """Weight-only int8 params flow through the same model code and match
    fp32 logits closely (top-1 agreement on most positions)."""
    from tts_inference_tpu.models.quant import quantize_llama_params

    model, params = pair
    qparams = quantize_llama_params(params)
    rng = np.random.default_rng(11)
    toks = rng.integers(0, TINY.vocab_size, size=(1, 10)).astype(np.int32)
    want = hf_logits(model, toks)

    cache = jllama.init_kv_cache(TINY, batch=1, max_seq=16, dtype=jnp.float32)
    hidden, _ = jllama.forward(
        qparams, TINY, jnp.asarray(toks), cache,
        jnp.zeros(1, jnp.int32), jnp.array([10], jnp.int32),
    )
    got = np.asarray(jllama.compute_logits(qparams, TINY, hidden))
    # int8 error is real but small: top-1 must agree on >=80% positions and
    # correlation stays high
    top_match = (got.argmax(-1) == want.argmax(-1)).mean()
    assert top_match >= 0.8, top_match
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.99, corr


@pytest.mark.slow
def test_int8_kv_cache_close_to_fp(pair):
    """int8 KV cache: prefill+decode logits stay close to the fp cache
    (per-token-head scales), and generation runs end to end."""
    model, params = pair
    rng = np.random.default_rng(21)
    toks = rng.integers(0, TINY.vocab_size, size=(2, 11)).astype(np.int32)
    lens = jnp.asarray([11, 11], jnp.int32)

    def run(int8):
        cache = jllama.init_kv_cache(TINY, 2, 32,
                                     dtype=jnp.float32, int8=int8)
        last, cache = jllama.prefill(params, TINY, jnp.asarray(toks), lens,
                                     cache)
        outs = [np.asarray(last)]
        tok = jnp.argmax(last, -1).astype(jnp.int32)
        for _ in range(4):
            logits, cache = jllama.decode_one(params, TINY, tok, cache)
            outs.append(np.asarray(logits))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return outs

    fp = run(False)
    q8 = run(True)
    for a, b in zip(fp, q8):
        corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
        assert corr > 0.999, corr
        # greedy choices should mostly agree on this tiny model
    top_match = np.mean([
        (a.argmax(-1) == b.argmax(-1)).mean() for a, b in zip(fp, q8)
    ])
    assert top_match >= 0.8, top_match
