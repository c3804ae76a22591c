"""Measure the lockstep mirroring cost in the dispatch hot path.

MirroredCore serializes every device-entering EngineCore call to the
followers (handle-table encode + pickle + TCP sendall) UNDER the
dispatch lock, before the local jitted launch (parallel/lockstep.py).
That cost was asserted "microseconds" in round 4 but never measured
(VERDICT r4 #3b) — this tool measures it two ways:

1. **Serialization cost, isolated**: record one representative
   decode-launch descriptor and time exactly what `mirrored()` adds on
   the hot path — `_encode` + `pickle.dumps` + `_send` over a loopback
   socketpair drained by a thread. This is the number that sits under
   the dispatch lock.
2. **End-to-end A/B, drift-immune**: the same fetch-every-call decode
   loop through a plain EngineCore and a MirroredCore, *interleaved*
   (plain, mirrored, plain, ...) so tunnel/thermal drift cancels, with
   per-pair deltas summarized by the median. An earlier protocol ran
   the two modes back-to-back with unfetched launch queues and read
   queue-throttling + tunnel drift instead of the mirror cost (the
   round-4 scoreboard lesson: measure paired or measure noise).

The "follower" is a loopback socketpair drained by a thread — exactly
the bytes production sends, no second process's chips needed (SPMD
replay correctness is covered by tests/test_lockstep_serve.py and the
driver's multichip dryrun).

Reference analog: the reference's multi-GPU coordination cost lives
inside NCCL; here the DCN-level coordination is this explicit channel,
so it must be shown off the critical path (res.md:69-77 is what happens
when a coordination channel is load-bearing and unobserved).

Usage:
    python -m tts_inference_tpu.tools.lockstep_overhead            # chip
    python -m tts_inference_tpu.tools.lockstep_overhead --tiny --cpu
"""

from __future__ import annotations

import argparse
import json
import pickle
import socket
import statistics
import sys
import threading
import time

import numpy as np


def _drain(sock: socket.socket) -> None:
    try:
        while sock.recv(1 << 20):
            pass
    except OSError:
        pass


def _timed_call(core, sp, tok, act):
    """One decode launch + fetch of its first output (steady-state cadence:
    the scheduler fetches every call's tokens before acting on them)."""
    t0 = time.perf_counter()
    out = core.decode_steps_launch(sp, tok, act)
    np.asarray(out[0])
    return time.perf_counter() - t0, out[1], out[2]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=200,
                    help="A/B pairs for the end-to-end leg")
    ap.add_argument("--followers", type=int, default=1)
    ap.add_argument("--quantize", action="store_true", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from tts_inference_tpu import protocol
    from tts_inference_tpu.config import Config, SamplingConfig, tiny_config
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.models import llama
    from tts_inference_tpu.models.quant import quantize_llama_params
    from tts_inference_tpu.ops import sampling as S
    from tts_inference_tpu.parallel import lockstep as LS

    cfg = tiny_config() if args.tiny else Config()
    quantize = (not args.tiny) if args.quantize is None else args.quantize
    # one jit around the whole init — eager per-tensor inits cost ~2.8 s of
    # tunnel round-trips EACH on the full model (PERF.md round-4 boot anatomy)
    params = jax.jit(llama.init_llama_params, static_argnums=(1,))(
        jax.random.PRNGKey(0), cfg.model)
    if quantize:
        params = quantize_llama_params(params, bits=8)
    core = EngineCore(params, cfg.model, cfg.engine,
                      eos_id=protocol.TOKEN_EOS, seed=0)
    sp = S.SamplingParams.from_config(
        SamplingConfig(greedy=True,
                       token_range=(protocol.TOKEN_AUDIO_BASE,
                                    protocol.TOKEN_AUDIO_BASE
                                    + protocol.AUDIO_VOCAB)),
        core.batch)
    prompts = [[protocol.TOKEN_SOS, 5, 6, 7]] * core.batch
    toks0, tok, act = core.prefill_decode_launch(
        prompts, list(range(core.batch)), sp,
        np.zeros(core.batch, np.int32), np.zeros(core.batch, bool), n=2,
    )
    np.asarray(toks0)

    # loopback followers drained by threads
    socks, drains = [], []
    for _ in range(args.followers):
        sa, sb = socket.socketpair()
        th = threading.Thread(target=_drain, args=(sb,), daemon=True)
        th.start()
        socks.append(sa)
        drains.append((sb, th))
    mirrored = LS.MirroredCore(core, socks)
    mirrored._table.register_outputs((tok, act))

    # ---- leg 1: serialization cost, isolated -------------------------------
    # exactly the hot-path addition under the dispatch lock: handle-table
    # encode + pickle + sendall of a real decode-launch descriptor
    table = mirrored._table
    wire_us = []
    for _ in range(max(200, args.iters)):
        t0 = time.perf_counter()
        desc = pickle.dumps(
            ("decode_steps_launch",
             LS._encode(table, (sp, tok, act)),
             LS._encode(table, {})),
            protocol=pickle.HIGHEST_PROTOCOL,
        )
        for s in socks:
            LS._send(s, desc)
        wire_us.append((time.perf_counter() - t0) * 1e6)

    # ---- leg 2: end-to-end A/B, interleaved --------------------------------
    for _ in range(8):   # warm both paths
        _, tok, act = _timed_call(core, sp, tok, act)
        _, tok, act = _timed_call(mirrored, sp, tok, act)
    deltas_us, plain_ms = [], []
    for _ in range(args.iters):
        a, tok, act = _timed_call(core, sp, tok, act)
        b, tok, act = _timed_call(mirrored, sp, tok, act)
        plain_ms.append(a * 1e3)
        deltas_us.append((b - a) * 1e6)

    mirrored.close()
    for sb, th in drains:
        sb.close()
        th.join(timeout=5)

    med_plain = statistics.median(plain_ms)
    med_delta = statistics.median(deltas_us)
    print(json.dumps({
        "config": "tiny" if args.tiny else "full",
        "batch": core.batch,
        "followers": args.followers,
        "iters": args.iters,
        "desc_bytes": len(desc),
        # the isolated hot-path addition (encode+pickle+sendall), which is
        # what holds the dispatch lock longer under lockstep
        "mirror_cost_us_per_call": round(statistics.median(wire_us), 1),
        "mirror_cost_us_p95": round(
            statistics.quantiles(wire_us, n=20)[18], 1),
        # paired end-to-end: launch+fetch through MirroredCore minus plain,
        # same tick interleaved (tunnel drift cancels)
        "e2e_plain_ms_per_launch": round(med_plain, 3),
        "e2e_delta_us_median": round(med_delta, 1),
        "e2e_overhead_pct": round(med_delta / 10.0 / med_plain, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
