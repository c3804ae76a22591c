"""Measure the lockstep mirroring cost in the dispatch hot path.

MirroredCore serializes every device-entering EngineCore call to the
followers (pickle + TCP sendall) UNDER the dispatch lock, before the
local jitted launch (parallel/lockstep.py). That cost was asserted
"microseconds" in round 4 but never measured (VERDICT r4 #3b) — this
tool measures it: the same decode-launch loop with and without a
MirroredCore wrapping, where the "follower" is a loopback socketpair
drained by a thread. That isolates exactly what production pays per
call — handle-table encode, pickle, kernel socket write — without
needing a second process's chips (SPMD replay itself is covered by
tests/test_lockstep_serve.py and the driver's multichip dryrun).

Reference analog: the reference's multi-GPU story pays its
coordination cost inside NCCL; here the DCN-level coordination is this
explicit channel, so it must be shown off the critical path.

Usage:
    python -m tts_inference_tpu.tools.lockstep_overhead            # chip
    python -m tts_inference_tpu.tools.lockstep_overhead --tiny --cpu
"""

from __future__ import annotations

import argparse
import json
import socket
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


def _bench_launches(core, sp, tok, act, iters: int, fetch: bool = True):
    """Back-to-back decode launches (no fetches between — the device queue
    pipelines). fetch=True blocks on the last output (end-to-end wall:
    device-bound); fetch=False returns after the last dispatch (host
    dispatch wall: isolates the mirroring cost, which is host-side and
    serial under the dispatch lock). Returns (wall_s, tok, act) so
    mirrored/plain runs stay chained off real outputs."""
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = core.decode_steps_launch(sp, tok, act)
        tok, act = out[1], out[2]
    if fetch:
        np.asarray(out[0])
    wall = time.perf_counter() - t0
    np.asarray(out[0])      # always settle before the next phase
    return wall, tok, act


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=200)
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
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg.model)
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

    # warm + measure plain
    _bench_launches(core, sp, tok, act, 8)
    wall_plain, tok, act = _bench_launches(core, sp, tok, act, args.iters)
    disp_plain, tok, act = _bench_launches(core, sp, tok, act, args.iters,
                                           fetch=False)

    # mirrored: loopback followers drained by threads
    socks, drains = [], []
    for _ in range(args.followers):
        sa, sb = socket.socketpair()
        th = threading.Thread(target=_drain, args=(sb,), daemon=True)
        th.start()
        socks.append(sa)
        drains.append((sb, th))
    mirrored = LS.MirroredCore(core, socks)
    # register the chained operands so they cross as _Ref like production
    mirrored._table.register_outputs((tok, act))
    _bench_launches(mirrored, sp, tok, act, 8)
    wall_mir, tok, act = _bench_launches(mirrored, sp, tok, act, args.iters)
    disp_mir, tok, act = _bench_launches(mirrored, sp, tok, act, args.iters,
                                         fetch=False)
    mirrored.close()
    for sb, th in drains:
        sb.close()
        th.join(timeout=5)

    per_call_plain_ms = wall_plain / args.iters * 1e3
    per_call_mir_ms = wall_mir / args.iters * 1e3
    disp_plain_ms = disp_plain / args.iters * 1e3
    disp_mir_ms = disp_mir / args.iters * 1e3
    print(json.dumps({
        "config": "tiny" if args.tiny else "full",
        "batch": core.batch,
        "followers": args.followers,
        "iters": args.iters,
        # host dispatch path only (launch returns, no device wait):
        # the isolated encode+pickle+sendall cost per mirrored call
        "dispatch_plain_ms_per_launch": round(disp_plain_ms, 3),
        "dispatch_mirrored_ms_per_launch": round(disp_mir_ms, 3),
        "mirror_cost_us_per_call": round(
            (disp_mir_ms - disp_plain_ms) * 1e3, 1),
        # end-to-end (device-bound): does the mirror cost hide under the
        # pipelined device queue?
        "e2e_plain_ms_per_launch": round(per_call_plain_ms, 3),
        "e2e_mirrored_ms_per_launch": round(per_call_mir_ms, 3),
        "e2e_overhead_pct": round(
            (per_call_mir_ms / per_call_plain_ms - 1.0) * 100.0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
