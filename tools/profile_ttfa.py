"""TTFA anatomy profiler: decompose the first-burst dispatch on real TPU.

Measures, at the single-stream serving config (int8 weights, B=1):
  - prefill-only device time (bucket 128)
  - decode scan device time at n=27 (the bit-exact 28-token first burst)
  - per-step decode cost, and its split: full step vs step-without-sampling
    vs step-without-LM-head (attention+MLP only)
  - the first-chunk vocoder decode + host round trip

Run:  python -m tools.profile_ttfa
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_runtime
from tts_inference_tpu import protocol as P
from tts_inference_tpu.config import SamplingConfig
from tts_inference_tpu.models import llama
from tts_inference_tpu.ops import sampling as S


def _force(out):
    """Force completion with a real scalar fetch — `block_until_ready` does
    NOT force device completion over the axon tunnel (measured: it returned
    in ~0 ms on multi-ms programs), which silently turned these timings
    into dispatch-RT measurements."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def timed(fn, *args, iters=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1000.0, out


def main():
    rt = build_runtime(False, quantize=True, steps_per_call=7, slots=1)
    core = rt.engine.core
    cfg = core.model_cfg
    params = core.params
    sp = S.SamplingParams.from_config(
        SamplingConfig(token_range=(P.TOKEN_AUDIO_BASE,
                                    P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB)),
        core.batch,
    )
    prompt = list(range(100, 120))
    N = 27
    window = core.kv_bucket(128 + N + 2)

    # -- full fused burst (what stream() dispatches first) -------------------
    def burst():
        return core.prefill_decode_launch(
            [prompt], [0], sp,
            np.zeros(core.batch, np.int32), np.zeros(core.batch, bool),
            n=N,
        )[0]

    ms_burst, _ = timed(burst, iters=10)
    print(f"burst (prefill+{N} steps, 1 dispatch): {ms_burst:8.2f} ms",
          flush=True)

    # -- prefill alone --------------------------------------------------------
    def prefill_only():
        return core.prefill_slots([prompt], [0], sp)

    ms_prefill, _ = timed(prefill_only, iters=10)
    print(f"prefill only (1 dispatch):             {ms_prefill:8.2f} ms",
          flush=True)

    # -- decode scan alone (n=27) ---------------------------------------------
    tok0 = np.full((core.batch,), P.TOKEN_AUDIO_BASE + 5, np.int32)
    act0 = np.ones((core.batch,), bool)

    def scan27():
        return core.decode_steps_launch(
            sp, jnp.asarray(tok0), jnp.asarray(act0), N)[0]

    ms_scan, _ = timed(scan27, iters=10)
    print(f"decode scan n={N} (1 dispatch):         {ms_scan:8.2f} ms"
          f"  -> {ms_scan / N:6.2f} ms/step amortized", flush=True)

    # -- isolated step pieces (custom jits on the live cache) ----------------
    cache = core.cache
    sstate = core.sampling_state

    from functools import partial

    @partial(jax.jit, static_argnums=())
    def step_full(params, cache, sstate, tok):
        logits, cache = llama.decode_one(
            params, cfg, tok, cache, jnp.ones((core.batch,), bool),
            kv_window=window)
        new_tok, sstate = S.sample(logits, sp, sstate)
        return cache, sstate, new_tok

    @jax.jit
    def step_greedy(params, cache, tok):
        logits, cache = llama.decode_one(
            params, cfg, tok, cache, jnp.ones((core.batch,), bool),
            kv_window=window)
        return cache, jnp.argmax(logits, -1).astype(jnp.int32)

    @jax.jit
    def step_nohead(params, cache, tok):
        hidden, cache = llama.forward(
            params, cfg, tok[:, None], cache,
            cache.lengths, jnp.ones((core.batch,), jnp.int32),
            kv_window=window)
        return cache, hidden.sum().astype(jnp.int32)[None]

    @jax.jit
    def scan_plain(params, cache, tok):
        """n=27 scan with NO sampling (greedy feedback) — isolates whether
        the engine scan's 15 ms/step comes from the model or the sampler."""
        def body(carry, _):
            cache, tok = carry
            logits, cache = llama.decode_one(
                params, cfg, tok, cache, jnp.ones((core.batch,), bool),
                kv_window=window)
            t2 = jnp.argmax(logits, -1).astype(jnp.int32)
            return (cache, t2), t2
        (cache, tok), toks = jax.lax.scan(body, (cache, tok), None, length=N)
        return toks

    t = jnp.asarray(tok0)
    ms_full, _ = timed(lambda: step_full(params, cache, sstate, t)[2],
                       iters=30)
    print(f"single step, full sampling chain:      {ms_full:8.2f} ms",
          flush=True)
    ms_gr, _ = timed(lambda: step_greedy(params, cache, t)[1], iters=30)
    print(f"single step, greedy argmax:            {ms_gr:8.2f} ms",
          flush=True)
    ms_nh, _ = timed(lambda: step_nohead(params, cache, t)[1], iters=30)
    print(f"single step, no LM head:               {ms_nh:8.2f} ms",
          flush=True)
    ms_sp, _ = timed(lambda: scan_plain(params, cache, t), iters=10)
    print(f"scan n={N} greedy (no sampler):         {ms_sp:8.2f} ms"
          f"  -> {ms_sp / N:6.2f} ms/step", flush=True)

    # -- first-chunk vocoder round trip ---------------------------------------
    codes = np.arange(28, dtype=np.int32) % 4096 + np.tile(
        np.array(P.POSITION_OFFSETS, np.int32), 4)
    l1, l2, l3 = P.deinterleave_frames(codes)

    def voc():
        return rt.vocoder.decode_frames(l1, l2, l3, noise_seed=0,
                                        first_frame=0)

    ms_voc, _ = timed(voc, iters=10)
    print(f"first-chunk vocoder decode_frames:     {ms_voc:8.2f} ms",
          flush=True)
    print(f"\nimplied in-scan step: {ms_scan / N:5.2f} ms | sampling ≈ "
          f"{ms_full - ms_gr:5.2f} ms | LM head ≈ {ms_gr - ms_nh:5.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
