"""On-device sampling: temperature / top-k / top-p / repetition penalty.

The reference delegates sampling to vLLM/TRT CUDA kernels with
``SamplingParams(temperature=0.6, top_p=0.95, repetition_penalty=1.1,
stop=[EOS])`` (`modal_audio_stream.py:290-296`; "repetition_penalty=1.1 is
critical for proper audio generation", `tensorrt_tts/inference.py:209-217`).
Here the whole chain runs inside the jitted decode step — no host round trip:

    logits → repetition penalty → temperature → top-k cap → top-p nucleus
           → Gumbel-max sample (or argmax when greedy)

All knobs are per-slot vectors so one batched step serves heterogeneous
requests under continuous batching. Everything is fixed-shape.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tts_inference_tpu import protocol
from tts_inference_tpu.config import SamplingConfig

NEG_INF = -1e30


class SamplingState(NamedTuple):
    """Per-slot sampling state carried across decode steps.

    presence: (B, V) bool — tokens seen in prompt+output (repetition penalty
    domain, matching the vLLM semantics the reference relies on).
    key: (B, 2) uint32 — per-slot PRNG key, split each step.
    in_speech: (B,) bool — SOS seen (frame-protocol tracking).
    frame_pos: (B,) int32 — position within the current 7-token frame.
    """

    presence: jnp.ndarray
    key: jnp.ndarray
    in_speech: jnp.ndarray
    frame_pos: jnp.ndarray


class SamplingParams(NamedTuple):
    """Per-slot knobs, shape (B,). temperature == 0 means greedy.

    allowed_min/allowed_max constrain sampling to a token-id interval
    [min, max) — structured decoding (e.g. audio-tokens-only mode, which
    guarantees in-range SNAC codes; the reference instead clamps invalid
    codes after the fact, `modal_audio_stream.py:185-190`). max == 0
    disables the constraint.
    """

    temperature: jnp.ndarray
    top_p: jnp.ndarray
    top_k: jnp.ndarray            # int32; 0 = disabled
    repetition_penalty: jnp.ndarray
    allowed_min: jnp.ndarray      # int32
    allowed_max: jnp.ndarray      # int32 exclusive; 0 = disabled
    frame_protocol: jnp.ndarray   # bool — frame-aligned structured decoding

    @classmethod
    def from_config(cls, cfg: SamplingConfig, batch: int) -> "SamplingParams":
        full = lambda v, dt=jnp.float32: jnp.full((batch,), v, dt)  # noqa: E731
        temp = 0.0 if cfg.greedy else cfg.temperature
        lo, hi = cfg.token_range or (0, 0)
        return cls(
            temperature=full(temp),
            top_p=full(cfg.top_p),
            top_k=full(1 if cfg.greedy else cfg.top_k, jnp.int32),
            repetition_penalty=full(cfg.repetition_penalty),
            allowed_min=full(lo, jnp.int32),
            allowed_max=full(hi, jnp.int32),
            frame_protocol=full(cfg.frame_protocol, jnp.bool_),
        )


def init_sampling_state(
    batch: int, vocab: int, seed: int = 0
) -> SamplingState:
    # legacy uint32 (B, 2) keys: plain arrays, donate/carry-friendly
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    return SamplingState(
        presence=jnp.zeros((batch, vocab), jnp.bool_),
        key=keys,
        in_speech=jnp.zeros((batch,), jnp.bool_),
        frame_pos=jnp.zeros((batch,), jnp.int32),
    )


def mark_tokens(
    state: SamplingState, tokens: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> SamplingState:
    """Record generated/prompt tokens (B,) into the presence set."""
    b = tokens.shape[0]
    upd = jnp.ones((b,), jnp.bool_) if mask is None else mask
    presence = state.presence.at[jnp.arange(b), tokens].max(upd)
    return state._replace(presence=presence)


def mark_prompt(state: SamplingState, tokens: jnp.ndarray,
                lens: jnp.ndarray) -> SamplingState:
    """Record a right-padded prompt batch (B, S) with valid lengths (B,)."""
    b, s = tokens.shape
    valid = jnp.arange(s)[None, :] < lens[:, None]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, s))
    presence = state.presence.at[rows, tokens].max(valid)
    return state._replace(presence=presence)


def apply_repetition_penalty(
    logits: jnp.ndarray, presence: jnp.ndarray, penalty: jnp.ndarray
) -> jnp.ndarray:
    """vLLM/HF semantics: seen ∧ logit>0 → /p ; seen ∧ logit<=0 → *p."""
    p = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(presence, penalized, logits)


def top_k_mask(logits: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Mask logits outside the per-slot top-k (k==0 → no-op)."""
    vocab = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    k_eff = jnp.where(k <= 0, vocab, k)
    idx = jnp.clip(k_eff - 1, 0, vocab - 1)
    thresh = jnp.take_along_axis(sorted_desc, idx[:, None], axis=-1)
    return jnp.where(logits >= thresh, logits, NEG_INF)


def top_p_mask(logits: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """Nucleus filter: keep the smallest prefix of the sorted distribution
    whose cumulative probability reaches top_p (always keeping the argmax)."""
    order = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # sorted token i is kept iff cumulative prob *before* it is < top_p
    keep_sorted = (cum - probs) < top_p[:, None]
    keep = jnp.put_along_axis(
        jnp.zeros_like(keep_sorted), order, keep_sorted, axis=-1,
        inplace=False,
    )
    return jnp.where(keep, logits, NEG_INF)


def sample(
    logits: jnp.ndarray,          # (B, V) fp32
    params: SamplingParams,
    state: SamplingState,
    *,
    nucleus_cap: int = 256,
    base: int = 0,
) -> Tuple[jnp.ndarray, SamplingState]:
    """Full sampling chain; returns (tokens (B,) int32, updated state).

    ``nucleus_cap`` (static) bounds the top-p candidate set via lax.top_k —
    a full 157k-vocab sort costs ~6 ms/token on v5e (measured), the capped
    path ~0; with a trained model at top_p 0.95 the nucleus is far smaller
    than 256, so the truncation is inconsequential. 0 disables the cap
    (exact full-vocab sort path).

    ``base`` (static): logits column i is the logit of token id base + i —
    the sliced-head decode path (protocol.HEAD_SLICE_BASE), where the LM
    head skips the plain-text rows. All masks/penalties index in absolute
    token ids and returned tokens are absolute; with any structured range
    inside the slice the result is bit-identical to the full head.
    """
    vocab = logits.shape[-1]
    rng_ok = params.allowed_max > 0
    ids = base + jnp.arange(vocab, dtype=jnp.int32)[None, :]
    in_range = (ids >= params.allowed_min[:, None]) & (
        ids < params.allowed_max[:, None]
    )
    logits = jnp.where(rng_ok[:, None] & ~in_range, NEG_INF, logits)

    # Frame-aligned structured decoding (the reference clamps invalid codes
    # after the fact, modal_audio_stream.py:185-190; we make them
    # unsampleable): in speech, position p only admits codes in
    # [base+p·4096, base+(p+1)·4096), EOS only at a frame boundary; before
    # SOS, only SOS is admitted.
    structured = params.frame_protocol
    # vocab actually covers the protocol range?
    if base + vocab > protocol.TOKEN_AUDIO_BASE:
        abase = protocol.TOKEN_AUDIO_BASE
        lo = abase + state.frame_pos * protocol.CODEBOOK_SIZE
        hi = lo + protocol.CODEBOOK_SIZE
        frame_ok = (ids >= lo[:, None]) & (ids < hi[:, None])
        at_boundary = state.frame_pos == 0
        frame_ok = frame_ok | (
            (ids == protocol.TOKEN_EOS) & at_boundary[:, None]
        )
        pre_speech_ok = ids == protocol.TOKEN_SOS
        mask_ok = jnp.where(
            state.in_speech[:, None], frame_ok, pre_speech_ok
        )
        logits = jnp.where(structured[:, None] & ~mask_ok, NEG_INF, logits)
    logits = apply_repetition_penalty(
        logits, state.presence[:, base:], params.repetition_penalty
    )
    greedy = params.temperature <= 0.0
    safe_temp = jnp.where(greedy, 1.0, params.temperature)
    scaled = logits / safe_temp[:, None]

    if nucleus_cap and nucleus_cap < vocab:
        cap = nucleus_cap
        if jax.default_backend() == "tpu":
            # TPU: approx_max_k is 2.2× faster than exact top_k at B=8
            # (1.44 → 0.67 ms over the 157k vocab, measured — PERF.md).
            # ~0.95 recall of the true top-256; with top_p 0.95 the real
            # nucleus is ≪ 256, so missed tail candidates are noise. CPU
            # keeps the exact path (deterministic cross-sharding tests).
            vals, idx = jax.lax.approx_max_k(scaled, cap)
            # approx results are value-sorted descending like top_k
        else:
            vals, idx = jax.lax.top_k(scaled, cap)        # (B, cap) desc
        pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
        k_eff = jnp.where(params.top_k <= 0, cap, params.top_k)
        vals = jnp.where(pos < k_eff[:, None], vals, NEG_INF)
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < params.top_p[:, None]
        vals = jnp.where(keep, vals, NEG_INF)
    else:
        vals = top_k_mask(scaled, params.top_k)
        vals = top_p_mask(vals, params.top_p)
        idx = None

    splits = jax.vmap(lambda k: jax.random.split(k, 2))(state.key)  # (B,2,2)
    step_key, next_key = splits[:, 0], splits[:, 1]
    gumbel = jax.vmap(
        lambda k, s: jax.random.gumbel(k, s.shape, jnp.float32)
    )(step_key, vals)
    choice = jnp.argmax(vals + gumbel, axis=-1)
    if idx is not None:
        sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    else:
        sampled = choice
    greedy_tok = jnp.argmax(logits, axis=-1)
    tokens = (base + jnp.where(greedy, greedy_tok, sampled)).astype(jnp.int32)

    # frame-position tracking (advances regardless of the structured flag so
    # it can be enabled mid-stream)
    abase = protocol.TOKEN_AUDIO_BASE
    is_audio = (tokens >= abase) & (tokens < abase + protocol.AUDIO_VOCAB)
    in_speech = state.in_speech | (tokens == protocol.TOKEN_SOS)
    frame_pos = jnp.where(
        is_audio & in_speech,
        (state.frame_pos + 1) % protocol.FRAME_SIZE,
        state.frame_pos,
    )
    new_state = mark_tokens(
        state._replace(key=next_key, in_speech=in_speech,
                       frame_pos=frame_pos),
        tokens,
    )
    return tokens, new_state
