"""Continuous-batching scheduler: multi-stream serving over one decode graph.

The capability the reference lacks and its roadmap demands (SURVEY.md §2.3:
`max_batch_size=1` engines + a global lock, ~5 concurrent users documented;
"Scale to ~100 concurrent users" is the stated goal, spec.md:137-139).

Design — fixed-shape batched state with insertion/eviction masks:

- One `EngineCore` with B slots; ONE compiled decode graph serves any mix of
  requests (per-slot sampling params are runtime arrays, not shapes).
- Admission: pending requests batch-prefill into free slots in a single
  jitted call; `forward` masks cache writes and the sampling state restores
  untouched rows, so neighbors mid-generation are unperturbed (the property
  tested in tests/test_scheduler.py::test_isolation_under_churn).
- Each scheduler tick runs `decode_steps_per_call` tokens for ALL active
  slots, then distributes tokens through per-request SOS/EOS extractors and
  windowed lookahead vocoder decoders; PCM chunks land on per-request
  thread-safe queues the serving layer drains.
- Eviction: EOS / max_tokens / cancel frees the slot immediately (the
  `engine.abort` analog, `modal_audio_stream.py:335-336`); no IPC, no
  subprocess — the reference's engine-core crash mode is gone by
  construction (SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses
import itertools
import logging
import queue
import threading
import time
from typing import List, Optional

import numpy as np

log = logging.getLogger("tts_inference_tpu.scheduler")

from tts_inference_tpu import protocol
from tts_inference_tpu.config import Config, SamplingConfig, StreamConfig
from tts_inference_tpu.engine import engine as E
from tts_inference_tpu.engine.engine import EngineCore
from tts_inference_tpu.models.snac import SnacDecoder
from tts_inference_tpu.ops import sampling as S
from tts_inference_tpu.streaming.lookahead import LookaheadStreamingDecoder
from tts_inference_tpu.streaming.pipeline import AudioChunk, StreamMetrics
from tts_inference_tpu.utils.audio import pcm16_bytes
from tts_inference_tpu.utils.tokenizer import TokenizerProtocol

_req_counter = itertools.count(1)


@dataclasses.dataclass
class TTSRequest:
    """A queued/streaming synthesis request.

    Consumers drain `events`: ("chunk", AudioChunk)* then ("done",
    StreamMetrics) — or ("error", message). Thread-safe.
    """

    text: str
    voice: str = "tara"
    sampling: SamplingConfig = dataclasses.field(default_factory=SamplingConfig)
    stream_cfg: StreamConfig = dataclasses.field(default_factory=StreamConfig)
    force_speech: bool = False
    noise_seed: int = 0
    # declared output budget for admission/KV reservation (None = the
    # sampling max_tokens). Real traffic usually EOSes well before its
    # budget — worst-case reservation pays for the declaration, on-demand
    # (kv_on_demand) pays only for actual emission; benchmarks model that
    # gap by declaring big and emitting small (bench.py --declared-tokens)
    budget_tokens: Optional[int] = None

    id: int = dataclasses.field(default_factory=lambda: next(_req_counter))
    events: "queue.Queue" = dataclasses.field(default_factory=queue.Queue)
    submitted_at: float = dataclasses.field(default_factory=time.perf_counter)
    cancelled: bool = False

    def cancel(self) -> None:
        self.cancelled = True

    def iter_chunks(self, timeout: Optional[float] = None):
        """Blocking iterator over audio chunks; returns on done/error."""
        while True:
            kind, payload = self.events.get(timeout=timeout)
            if kind == "chunk":
                yield payload
            elif kind == "done":
                return
            else:
                raise RuntimeError(payload)


class _SlotState:
    """Host-side per-slot runtime while a request occupies a slot."""

    def __init__(self, req: TTSRequest, scheduler: "Scheduler"):
        self.req = req
        if scheduler.use_native:
            from tts_inference_tpu.utils.native import NativeExtractor

            self.extractor = NativeExtractor(
                restart_on_sos=(req.stream_cfg.extraction == "last_sos"),
                started=req.force_speech,
            )
        else:
            self.extractor = protocol.TokenExtractor(
                restart_on_sos=(req.stream_cfg.extraction == "last_sos")
            )
            if req.force_speech:
                self.extractor.started = True
        self.lookahead = LookaheadStreamingDecoder(
            scheduler.vocoder, req.stream_cfg, req.noise_seed,
            use_native=scheduler.use_native,
        )
        self.metrics = StreamMetrics()
        self.produced = 0
        self.chunk_index = 0
        self._restarts_seen = 0
        self.t0 = time.perf_counter()
        # preemption-resume bookkeeping (kv_on_demand): the raw LM token
        # stream so a preempted request can re-prefill prompt+generated,
        # plus the sampling-chain snapshot taken at preemption
        self.prompt_ids: Optional[List[int]] = None
        self.token_ids: List[int] = []
        self.resume_snapshot: Optional[dict] = None

    def _ms(self) -> float:
        return (time.perf_counter() - self.t0) * 1000.0

    def on_tokens(self, tokens: List[int], eos_id: int) -> bool:
        """Feed decoded tokens; returns True when the request is finished.

        Audio decoding does NOT happen here — the scheduler batches every
        stream's pending vocoder window into one device call per tick.
        """
        if self.req.cancelled:
            return True
        if not self.metrics.ttft_ms:
            self.metrics.ttft_ms = self._ms()
        finished = False
        budget = self.req.sampling.max_tokens - self.produced
        row: List[int] = []
        for t in tokens[:budget]:
            row.append(t)
            if t == eos_id:
                finished = True
                break
        self.produced += len(row)
        self.token_ids.extend(int(t) for t in row)
        self.metrics.tokens = self.produced
        codes = self.extractor.feed_many(row)
        if self.extractor.restart_count != self._restarts_seen:
            # last-SOS mid-stream restart: drop un-emitted frames (see
            # pipeline.stream for the rationale)
            self._restarts_seen = self.extractor.restart_count
            if self.metrics.chunks == 0:
                self.lookahead = LookaheadStreamingDecoder(
                    self.lookahead.decoder, self.req.stream_cfg,
                    self.req.noise_seed,
                )
        if codes:
            self.lookahead.feed(codes)
        if self.extractor.finished:
            finished = True
        if self.produced >= self.req.sampling.max_tokens:
            finished = True
        return finished

    def _emit(self, samples: np.ndarray) -> None:
        if not self.metrics.ttfa_ms:
            self.metrics.ttfa_ms = self._ms()
        self.chunk_index += 1
        self.metrics.chunks = self.chunk_index
        self.metrics.audio_duration_ms += (
            len(samples) / protocol.SAMPLE_RATE * 1000.0
        )
        self.req.events.put(("chunk", AudioChunk(
            pcm16_bytes(samples), self.chunk_index, len(samples)
        )))

    def finish(self) -> None:
        """Emit the done event (any flush audio was emitted by the tick)."""
        self.metrics.frames = self.lookahead.total_frames
        self.metrics.generation_time_ms = self._ms()
        self.metrics.ttfa_ms = self.metrics.ttfa_ms or self.metrics.generation_time_ms
        self.req.events.put(("done", self.metrics.finalize()))


class Scheduler:
    """Fixed-slot continuous batching over one EngineCore."""

    def __init__(
        self,
        params,
        config: Config,
        vocoder: SnacDecoder,
        tokenizer: TokenizerProtocol,
        *,
        eos_id: int = protocol.TOKEN_EOS,
        seed: int = 0,
        mesh=None,
        use_native: bool = False,
        wrap_core=None,
    ):
        self.config = config
        self.vocoder = vocoder
        self.tokenizer = tokenizer
        self.eos_id = eos_id
        if use_native:
            from tts_inference_tpu.utils import native as _native

            if not _native.available():
                raise RuntimeError("native runtime unavailable (build "
                                   "native/libtts_runtime.so)")
        self.use_native = use_native
        self.core = EngineCore(
            params, config.model, config.engine, eos_id=eos_id, seed=seed,
            mesh=mesh,
        )
        if wrap_core is not None:
            # lockstep multi-host serving: every device-entering call is
            # mirrored to follower processes (parallel/lockstep.py)
            self.core = wrap_core(self.core)
        b = self.core.batch
        self.slots: List[Optional[_SlotState]] = [None] * b
        self.pending: "queue.Queue[TTSRequest]" = queue.Queue()
        self._last_tok = np.zeros(b, np.int32)
        self._active = np.zeros(b, bool)
        # per-slot sampling knobs (host mirrors, rebuilt into device arrays)
        self._sp = {
            "temperature": np.full(b, 0.6, np.float32),
            "top_p": np.full(b, 0.95, np.float32),
            "top_k": np.zeros(b, np.int32),
            "repetition_penalty": np.full(b, 1.1, np.float32),
            "allowed_min": np.zeros(b, np.int32),
            "allowed_max": np.zeros(b, np.int32),
            "frame_protocol": np.zeros(b, bool),
        }
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._wakeup = threading.Event()
        # fatal engine loss (e.g. a lockstep follower died — the mesh can
        # never complete another collective): set once, rejects all new
        # work, reported by /health, and on_fatal lets the server process
        # exit nonzero so a supervisor restarts the whole group
        self.fatal: Optional[str] = None
        self.on_fatal = None    # callable(msg) — set by serving/app.py
        self.preemptions = 0    # kv_on_demand preempt-and-resume events
        # fused admission vocode (multi-stream twin of
        # pipeline._first_pcm_fn): the first chunk's extraction + SNAC
        # decode for every admitted slot, chained onto the admission
        # dispatch device-to-device — first PCM lands with the first
        # tokens, skipping the separate vocode round-trip (~80 ms of
        # 8-stream TTFA, measured)
        self._pcm_cache: dict = {}
        self.fuse_admission_vocode = True
        # after warmup(), only geometries already in _pcm_cache take the
        # fused path — an unwarmed geometry would jit-compile on the
        # scheduler thread mid-admission, stalling every live stream for
        # seconds; it falls back to the vocode worker instead
        self._pcm_warmed = False
        self._geo_warned: set = set()
        # async vocode worker: the scheduler thread only PLANS windows (and
        # advances emission bookkeeping); the worker runs the batched device
        # decode + host fetch + chunk emission, so decode launches never
        # block on vocoder round-trips. FIFO => per-stream chunk order holds.
        # maxsize=2 bounds chunk bunching (unbounded queueing let chunks
        # arrive in bursts: worst inter-chunk gap doubled).
        self._vocode_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._vocode_thread: Optional[threading.Thread] = None
        # stage-2 fetch/emit queue: maxsize bounds decodes in flight on the
        # device (launch stage blocks when the fetch stage is 2 behind).
        # Keep BOTH queues tight: the put-side backpressure throttles the
        # planner so each vocode batch aggregates more frames — loosening
        # to 4/3 fragmented the batches and cost 36% aggregate RTF at 8
        # streams (18.05 → 11.48, measured).
        self._emit_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._emit_thread: Optional[threading.Thread] = None
        # jobs put but not yet fully emitted (the pipelined worker may hold
        # a decode in flight after the queue empties) — drain_vocoder waits
        # on this, not on queue emptiness
        self._vocode_pending = 0
        self._vocode_plock = threading.Lock()
        # pipelined dispatch: deque of up to `pipeline_depth` in-flight
        # decode launches, each (toks_d, tok_d, act_d, sparams,
        # launch_req_ids). Depth 2 keeps a call queued behind the running
        # one so the device never idles during the host's dispatch
        # round-trip (device-side EOS freezing makes speculation safe).
        import collections

        self.pipeline_depth = 2
        # admission runs extra decode steps in its single fused dispatch so
        # a fresh stream's first chunk tokens (~28) arrive one round-trip
        # sooner (TTFA p95 lever; warmed in EngineCore.warmup_graphs).
        # Sized to cover the DEFAULT first chunk (first_chunk_frames +
        # lookahead frames of codes) so the fused admission-vocode path is
        # live under production `serve` defaults, not just bench overrides.
        scfg0 = config.stream
        la0 = (scfg0.first_chunk_lookahead
               if scfg0.first_chunk_lookahead is not None
               else scfg0.lookahead_frames)
        first_chunk_codes = (scfg0.first_chunk_frames + la0) * \
            protocol.FRAME_SIZE
        self.admission_steps = max(
            2 * config.engine.decode_steps_per_call, first_chunk_codes - 1
        )
        self._inflight = collections.deque()
        # requests that fit a free slot but not the paged-KV pool wait here
        # (FIFO ahead of the backlog) until blocks free up
        self._held = collections.deque()
        # policy backlog: `pending` is only the cross-thread handoff; the
        # scheduler thread drains it here and admission policy
        # (config.engine.admission_policy) picks from this list
        self._backlog: List[TTSRequest] = []
        # watchdog (SURVEY.md §5.3 — the reference's engine-core "dies
        # unexpectedly mid-generation, connections hang" lesson): if the
        # loop makes no progress for `watchdog_s`, all live requests are
        # failed with an error event instead of hanging their consumers.
        self.watchdog_s: float = 120.0
        self._last_progress = time.perf_counter()
        # tick-phase profile (PERF.md 64-slot knee attribution): enabled by
        # enable_tick_profile(); accumulates wall seconds per step() phase
        self._prof: Optional[dict] = None

    def enable_tick_profile(self) -> None:
        """Accumulate per-phase wall time across step() calls into
        .tick_profile — used by the 64-slot knee measurement (the host tick
        vs device fetch vs vocode-planning attribution, VERDICT r2 #5)."""
        self._prof = {"fetch_s": 0.0, "host_tokens_s": 0.0,
                      "fused_pcm_s": 0.0, "vocode_plan_s": 0.0,
                      "admit_launch_s": 0.0, "ticks": 0}

    @property
    def tick_profile(self) -> Optional[dict]:
        return dict(self._prof) if self._prof is not None else None

    # -- public API ---------------------------------------------------------

    def submit(self, req: TTSRequest) -> TTSRequest:
        if self.fatal is not None:
            req.events.put(("error", f"engine down: {self.fatal}"))
            return req
        self.pending.put(req)
        self._wakeup.set()
        return req

    def synthesize_request(self, req: TTSRequest):
        """Submit + blocking chunk iterator (single call-site convenience)."""
        self.submit(req)
        return req.iter_chunks(timeout=self.config.server.request_timeout_s)

    def warmup(self) -> dict:
        """Compile every graph shape this scheduler can hit — engine
        prefill/decode/admission (EngineCore.warmup_graphs), the batched
        vocode at every (row bucket × frame bucket) the slot count reaches,
        and the fused admission first-chunk graph. A shape first touched
        mid-wave stalls every live stream for the compile/cache-load
        (measured: a cold rb=8 vocode load added ~2.3 s to all 8 live
        WS streams' TTFA)."""
        info = self.core.warmup_graphs(
            admission_ns=[self.admission_steps,
                          self.config.engine.decode_steps_per_call]
        )
        voc = self.vocoder
        rbs = []
        r = 1
        while r <= self.core.batch:
            rbs.append(r)
            r *= 2
        fbs = [b for b in voc.frame_buckets if b <= 64]
        for rb in rbs:
            for fb in fbs:
                layers = [(
                    np.zeros(fb, np.int32), np.zeros(2 * fb, np.int32),
                    np.zeros(4 * fb, np.int32),
                )] * rb
                voc.decode_frames_batch(
                    layers, first_frames=[0] * rb, noise_seeds=[0] * rb
                )
        scfg = self.config.stream
        la = (scfg.first_chunk_lookahead
              if scfg.first_chunk_lookahead is not None
              else scfg.lookahead_frames)
        nf = scfg.first_chunk_frames + la
        n_codes = nf * protocol.FRAME_SIZE
        emit = scfg.first_chunk_frames * voc.cfg.samples_per_frame
        if self.fuse_admission_vocode and \
                n_codes <= self.admission_steps + 1:
            import jax.numpy as jnp

            fn = self._admit_pcm_fn(n_codes, nf, emit)
            toks = jnp.full(
                (self.core.batch, self.admission_steps + 1),
                protocol.TOKEN_AUDIO_BASE, jnp.int32,
            )
            np.asarray(fn(
                toks, jnp.zeros(self.core.batch, jnp.uint32))[0])
        elif n_codes > self.admission_steps + 1:
            self._warn_geo((n_codes, nf, emit),
                           "first chunk exceeds the admission burst "
                           "(raise admission_steps or shrink the chunk)")
        # (geometry fits but fuse_admission_vocode is off — e.g. forced off
        # under lockstep serving — no warning: the async vocode worker
        # covers first chunks by design)
        # from here on, only warmed geometries take the fused path
        self._pcm_warmed = True
        info["warmed_vocode_rows"] = rbs
        info["warmed_vocode_frames"] = fbs
        return info

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()
        self._ensure_vocode_worker()
        self._thread = threading.Thread(
            target=self.run_forever, name="tts-scheduler", daemon=True
        )
        self._thread.start()

    def _ensure_vocode_worker(self) -> None:
        if self._vocode_thread is None or not self._vocode_thread.is_alive():
            self._vocode_thread = threading.Thread(
                target=self._vocode_worker, name="tts-vocoder", daemon=True
            )
            self._vocode_thread.start()
        if self._emit_thread is None or not self._emit_thread.is_alive():
            self._emit_thread = threading.Thread(
                target=self._emit_worker, name="tts-vocoder-emit",
                daemon=True,
            )
            self._emit_thread.start()

    def _vq_put(self, item) -> None:
        with self._vocode_plock:
            self._vocode_pending += 1
        self._vocode_q.put(item)

    def _vq_done(self, n: int = 1) -> None:
        with self._vocode_plock:
            self._vocode_pending -= n

    def drain_vocoder(self, timeout: float = 60.0) -> None:
        """Block until all queued vocode/finish jobs have been emitted
        (including decodes the pipelined worker still holds in flight)."""
        deadline = time.perf_counter() + timeout
        while self._vocode_pending > 0:
            if time.perf_counter() > deadline:
                raise TimeoutError("vocoder queue did not drain")
            time.sleep(0.002)

    def stop(self) -> None:
        self._stop.set()
        self._wakeup.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None
        if self._vocode_thread is not None:
            self._vocode_q.put(None)
            self._vocode_thread.join(timeout=30)
            self._vocode_thread = None
        if self._emit_thread is not None:
            self._emit_thread.join(timeout=30)  # sentinel forwarded by stage 1
            self._emit_thread = None

    @property
    def n_active(self) -> int:
        return int(self._active.sum())

    @property
    def n_queued(self) -> int:
        """Requests waiting for a slot (handoff queue + policy backlog +
        capacity-held)."""
        return self.pending.qsize() + len(self._backlog) + len(self._held)

    def _drop_queued(self, req: TTSRequest) -> None:
        """Remove `req` from whichever wait container holds it."""
        try:
            self._held.remove(req)
        except ValueError:
            try:
                self._backlog.remove(req)
            except ValueError:
                pass

    # -- scheduler loop -------------------------------------------------------

    def _sampling_params(self) -> S.SamplingParams:
        import jax.numpy as jnp

        return S.SamplingParams(
            temperature=jnp.asarray(self._sp["temperature"]),
            top_p=jnp.asarray(self._sp["top_p"]),
            top_k=jnp.asarray(self._sp["top_k"]),
            repetition_penalty=jnp.asarray(self._sp["repetition_penalty"]),
            allowed_min=jnp.asarray(self._sp["allowed_min"]),
            allowed_max=jnp.asarray(self._sp["allowed_max"]),
            frame_protocol=jnp.asarray(self._sp["frame_protocol"]),
        )

    def _build_prompt(self, req: TTSRequest) -> List[int]:
        ids = self.tokenizer.encode(
            protocol.format_prompt_text(
                req.text[: protocol.MAX_TEXT_CHARS], req.voice
            )
        )
        return protocol.format_prompt_ids(ids, force_speech=req.force_speech)

    def _warn_geo(self, geo, why: str) -> None:
        """Log (once per geometry) when the fused admission-vocode path is
        skipped — visibility into why a stream's first chunk takes the
        slower host vocode path (ADVICE r2)."""
        if geo in self._geo_warned:
            return
        self._geo_warned.add(geo)
        log.info("fused admission vocode disabled for geometry "
                 "(n_codes=%d, nf=%d, emit=%d): %s", *geo, why)

    def _admit_pcm_fn(self, n_codes: int, nf: int, emit: int):
        """Batched first-PCM graph: admission token buffer (B, n+1) →
        (pcm (B, emit) int16, ok (B,) bool). Row r is slot r's first
        `n_codes` tokens decoded exactly like the vocode worker would
        (same frame bucket, valid mask, per-row noise seed) — bit-exact,
        with `ok` gating on a clean all-audio burst."""
        key = (n_codes, nf, emit)
        fn = self._pcm_cache.get(key)
        if fn is not None:
            return fn
        # Exactness note: this decodes at B rows; the vocode worker buckets
        # rows to pow2(#jobs). XLA batched convs differ by float LSBs
        # (~5e-9) across row counts, so fused vs worker chunks can differ
        # by at most one int16 LSB — the same variation the worker path
        # already has between differently-sized ticks (test-pinned in
        # tests/test_fused_admission_vocode.py).
        import jax
        import jax.numpy as jnp

        from tts_inference_tpu.models.snac import decode_codes, to_pcm16

        voc = self.vocoder
        cfg = voc.cfg
        nb = voc.bucket_frames(nf)
        lat = max(cfg.vq_strides)
        ab = protocol.TOKEN_AUDIO_BASE
        offs = np.asarray(protocol.POSITION_OFFSETS, np.int32)
        use_noise = voc.use_noise

        def impl(toks, seeds):
            b = toks.shape[0]
            t = toks[:, :n_codes].astype(jnp.int32)
            ok = jnp.all((t >= ab) & (t < ab + protocol.AUDIO_VOCAB),
                         axis=1)
            frames = (t - ab).reshape(b, nf, protocol.FRAME_SIZE) - offs
            frames = jnp.clip(frames, 0, cfg.codebook_size - 1)
            l1 = frames[:, :, 0]
            l2 = frames[:, :, (1, 4)].reshape(b, -1)
            l3 = frames[:, :, (2, 3, 5, 6)].reshape(b, -1)
            pad = lambda x, m: (  # noqa: E731
                jnp.zeros((b, m * nb), jnp.int32)
                .at[:, : x.shape[1]].set(x)
            )
            audio = decode_codes(
                voc.params, cfg,
                (pad(l1, 1), pad(l2, 2), pad(l3, 4)),
                noise_seed=seeds,
                latent_offset=jnp.zeros((b,), jnp.uint32),
                use_noise=use_noise,
                valid_latent=jnp.full((b,), nf * lat, jnp.int32),
            )
            return to_pcm16(audio[:, :emit]), ok

        fn = jax.jit(impl)
        self._pcm_cache[key] = fn
        return fn

    def _launch_admit_pcm(self, toks_d, batch):
        """Chain the batched first-PCM graph onto a fresh admission launch.

        Returns (eligible_slots, pcm_d, ok_d, emit) or None. Eligible =
        force_speech requests whose stream geometry matches the first
        admitted one and whose first chunk fits the admission burst."""
        if not self.fuse_admission_vocode:
            return None
        geo = None
        eligible = []
        for slot, req, _ in batch:
            scfg = req.stream_cfg
            if not req.force_speech:
                continue
            la = (scfg.first_chunk_lookahead
                  if scfg.first_chunk_lookahead is not None
                  else scfg.lookahead_frames)
            nf = scfg.first_chunk_frames + la
            n_codes = nf * protocol.FRAME_SIZE
            emit = scfg.first_chunk_frames * \
                self.vocoder.cfg.samples_per_frame
            g = (n_codes, nf, emit)
            if n_codes > toks_d.shape[1] or \
                    req.sampling.max_tokens < n_codes:
                self._warn_geo(g, "first chunk exceeds the admission burst")
                continue
            if self._pcm_warmed and g not in self._pcm_cache:
                # unwarmed geometry: compiling here would stall every live
                # stream (measured ~2.3 s) — the vocode worker handles it
                self._warn_geo(g, "geometry not warmed")
                continue
            if geo is None:
                geo = g
            if g != geo:
                continue
            eligible.append(slot)
        if not eligible:
            return None
        n_codes, nf, emit = geo
        seeds = np.zeros(self.core.batch, np.uint32)
        for slot, req, _ in batch:
            seeds[slot] = req.noise_seed & 0xFFFFFFFF
        fn = self._admit_pcm_fn(n_codes, nf, emit)
        import jax.numpy as jnp

        pcm_d, ok_d = fn(toks_d, jnp.asarray(seeds))
        E.copy_async(pcm_d, ok_d)
        return (eligible, pcm_d, ok_d, nf, emit)

    def _set_sp_row(self, slot: int, sp: SamplingConfig) -> None:
        """Write one slot's sampling knobs into the host mirrors."""
        self._sp["temperature"][slot] = 0.0 if sp.greedy else sp.temperature
        self._sp["top_p"][slot] = sp.top_p
        self._sp["top_k"][slot] = 1 if sp.greedy else sp.top_k
        self._sp["repetition_penalty"][slot] = sp.repetition_penalty
        lo, hi = sp.token_range or (0, 0)
        self._sp["allowed_min"][slot] = lo
        self._sp["allowed_max"][slot] = hi
        self._sp["frame_protocol"][slot] = sp.frame_protocol

    def _admit_resume(self, resumes) -> bool:
        """Re-admit preempted requests: re-prefill prompt+generated[:-1]
        at a resume bucket, restore the sampling-chain snapshot, and set
        last_tok so the next decode launch continues the stream — a
        bit-identical continuation of the preempted generation
        (tests/test_preemption.py). Only runs with an empty launch
        pipeline (step() calls _admit then), so no stale launch can
        mis-attribute tokens to the resumed slot; the prefill's own
        sampled token and chain updates are discarded/overwritten by the
        restore."""
        did = False
        for slot, req, prompt in resumes:
            state = req._resume_state
            req._resume_state = None
            if req.cancelled:
                req.events.put(("done", StreamMetrics()))
                continue
            bucket = self.core.resume_bucket_len(len(prompt))
            if bucket is None:
                req.events.put(("error",
                                "resume re-prefill exceeds resume_buckets"))
                continue
            self.slots[slot] = state
            self._set_sp_row(slot, req.sampling)
            sp_arr = self._sampling_params()
            self.core.prefill_slots([prompt], [slot], sp_arr,
                                    seeds=[None], bucket=bucket)
            self.core.restore_slot(slot, state.resume_snapshot)
            state.resume_snapshot = None
            self._last_tok[slot] = state.token_ids[-1]
            self._active[slot] = True
            did = True
        return did

    def _admit(self) -> bool:
        """Admit pending requests; returns True if an admission launch was
        pushed onto the pipeline.

        Admission uses the FUSED prefill+decode graph: one dispatch prefills
        the new slots, samples their first token AND runs a full decode call
        for every active slot — one fewer host round-trip on the TTFA
        critical path, and the first `decode_steps_per_call` tokens arrive a
        dispatch earlier. Non-admitted slots' first output column repeats
        their last token (already processed) — flagged via skip_first."""
        free = [i for i, s in enumerate(self.slots) if s is None]
        batch: List[tuple] = []
        # drain the cross-thread queue into the policy backlog
        while True:
            try:
                self._backlog.append(self.pending.get_nowait())
            except queue.Empty:
                break
        ecfg = self.config.engine
        # reserved latency slots: indices ≥ long_cutoff only admit SHORT
        # requests (max_tokens ≤ short_request_tokens) — a burst of
        # long-audio jobs can fill at most the general slots, so an
        # interactive request always has capacity to land in
        long_cutoff = len(self.slots) - ecfg.reserved_short_slots

        def budget(r: TTSRequest) -> int:
            return r.budget_tokens or r.sampling.max_tokens

        def is_short(r: TTSRequest) -> bool:
            return budget(r) <= ecfg.short_request_tokens

        # candidate order: held requests first (they were already admitted
        # by policy and only deferred by the paged-KV capacity gate), then
        # the backlog in policy order
        ordered = list(self._backlog)
        if ecfg.admission_policy == "sjf" and len(ordered) > 1:
            # shortest-job-first with aging: effective length shrinks by
            # max_output_len per sjf_aging_ms waited (starvation bound);
            # sort is stable, so equal scores keep arrival order
            now = time.perf_counter()
            rate = ecfg.max_output_len / max(ecfg.sjf_aging_ms, 1e-6)
            ordered.sort(key=lambda r: (
                budget(r)
                - rate * (now - r.submitted_at) * 1000.0
            ))
        for req in list(self._held) + ordered:
            if not free:
                break
            if req.cancelled:
                req.events.put(("done", StreamMetrics()))
                self._drop_queued(req)
                continue
            if is_short(req):
                # prefer a reserved slot so general slots stay open
                slot = max(free) if max(free) >= long_cutoff else free[0]
            else:
                eligible = [s for s in free if s < long_cutoff]
                if not eligible:
                    continue   # long request waits for a general slot
                slot = eligible[0]
            free.remove(slot)
            self._drop_queued(req)
            rstate = getattr(req, "_resume_state", None)
            if rstate is not None:
                # preemption resume: re-prefill prompt + generated-so-far
                # (the last token re-enters as last_tok; its KV is written
                # by the next decode step, exactly like a live stream)
                batch.append((slot, req,
                              rstate.prompt_ids + rstate.token_ids[:-1]))
            else:
                batch.append((slot, req, self._build_prompt(req)))
        if self.config.engine.paged_kv and batch:
            # capacity gate (the TRT in-flight-batching behavior): admit
            # only what the KV block pool can hold; the rest waits its turn
            bs_blk = self.config.engine.kv_block_size
            slack = self.config.engine.decode_steps_per_call + 1
            pfx = (self.config.engine.prefix_len
                   if self.config.engine.prefix_cache else 0)
            on_demand = self.config.engine.kv_on_demand

            def entry_demand(r, p, fresh_bucket):
                if getattr(r, "_resume_state", None) is not None:
                    b = self.core.resume_bucket_len(len(p)) \
                        or self.core.max_seq
                    total = min(b + slack + 1, self.core.max_seq)
                elif on_demand:
                    # prefill window + one decode-call window only —
                    # growth is on-demand, preemption covers exhaustion
                    total = min(fresh_bucket + pfx + slack + 1,
                                self.core.max_seq)
                else:
                    total = min(fresh_bucket + pfx + budget(r) + slack,
                                self.core.max_seq)
                return -(-total // bs_blk) * bs_blk

            while batch:
                fresh = [len(p) for _, r, p in batch
                         if getattr(r, "_resume_state", None) is None]
                fresh_bucket = (self.core.bucket_len(max(fresh))
                                if fresh else 0)
                demand = sum(entry_demand(r, p, fresh_bucket)
                             for _, r, p in batch)
                if demand <= self.core.free_tokens():
                    break
                slot, req, _ = batch.pop()   # defer the newest candidate
                self._held.appendleft(req)
        if not batch:
            return False
        resumes = [e for e in batch
                   if getattr(e[1], "_resume_state", None) is not None]
        batch = [e for e in batch
                 if getattr(e[1], "_resume_state", None) is None]
        did_resume = False
        if resumes:
            did_resume = self._admit_resume(resumes)
        if not batch:
            return did_resume
        prompts, slots_idx, seeds, extras = [], [], [], []
        for slot, req, prompt in batch:
            state = _SlotState(req, self)
            state.prompt_ids = list(prompt)
            c = max(1, req.stream_cfg.frames_per_chunk)
            if req.stream_cfg.stagger_chunks and len(self.slots) >= 4 * c:
                # de-phase this stream's steady-state chunk boundary by its
                # slot index so burst admissions don't vocode in lockstep.
                # Only past ~4 rows per de-phased tick: at small slot
                # counts splitting the batched vocode into per-phase calls
                # costs more in dispatches than the burst did (measured
                # −0.7 aggregate RTF at 8 streams; −153 ms worst gap at 32)
                state.lookahead.chunk_phase = slot % c
            self.slots[slot] = state
            prompts.append(prompt)
            slots_idx.append(slot)
            seeds.append(req.sampling.seed if req.sampling.seed is not None
                         else req.id)
            extras.append(budget(req))
            self._set_sp_row(slot, req.sampling)
        sp_arr = self._sampling_params()
        # kv_window=None → smallest bucket covering every live slot (the
        # fused decode steps read W tokens of KV per step per layer; with
        # max_seq=4608 that was ~2 GB of extra KV traffic per admission at
        # B=8 — measured +90 ms of 8-stream TTFA). Each (bucket, window)
        # admission graph is warmed in warmup_graphs.
        toks, tok, act = self.core.prefill_decode_launch(
            prompts, slots_idx, sp_arr, self._last_tok, self._active,
            reserve_extra=extras, n=self.admission_steps, seeds=seeds,
        )
        try:
            fused_pcm = self._launch_admit_pcm(toks, batch)
        except Exception as e:  # noqa: BLE001 — degrade, don't fail the wave
            # the fused first chunk is an optimization; any failure here
            # (bad geometry, compile error) must fall back to the host
            # vocode path, not fail_all() every live request
            log.warning("fused admission vocode failed (%s: %s); falling "
                        "back to vocode worker", type(e).__name__, e)
            fused_pcm = None
        admitted = set(slots_idx)
        # output column 0 repeats the last (already processed) token of
        # slots that were active before this admission
        skip_first = np.array([
            self._active[s] and s not in admitted
            for s in range(len(self.slots))
        ])
        for slot, req, _ in batch:
            self._active[slot] = True
        E.copy_async(toks, tok, act)
        self._inflight.append(
            (toks, tok, act, sp_arr, self._launch_ids(), skip_first,
             fused_pcm)
        )
        return True

    def _release(self, slot: int) -> None:
        self.slots[slot] = None
        self._active[slot] = False
        if self.config.engine.paged_kv:
            # release KV blocks immediately so held requests can admit
            self.core._free_slot_blocks([slot])

    def _vocode_tick(self, finishing: List[int]) -> None:
        """Plan every stream's pending vocoder window and hand the batch to
        the async vocode worker.

        Per-stream decode_frames calls cost a full dispatch round-trip each
        (~27 ms over the tunnel); at 8 streams that serialized into the
        dominant cost of a tick. The windows are stacked into ONE device
        call, executed (and its results fetched/emitted) on the worker
        thread so this loop goes straight back to launching decode steps.
        Emission bookkeeping (commit) happens HERE so the next tick plans
        correctly. Per-row valid-length masking keeps each stream's samples
        bit-identical to its solo decode (test-enforced).
        """
        jobs = []   # (state, plan, layers)
        for slot, state in enumerate(self.slots):
            if state is None or state.req.cancelled:
                continue
            plan = state.lookahead.plan(flush=slot in finishing)
            if plan is not None:
                layers = state.lookahead.window_layers(plan)
                state.lookahead.commit(plan)
                jobs.append((state, plan, layers))
        if jobs:
            self._vq_put(("decode", jobs))

    def _vocode_worker(self) -> None:
        """Stage 1 of the two-stage vocode pipeline: LAUNCH only.

        Dispatches each batch decode (plus its queued D2H copy) and hands
        the handle to the fetch/emit stage — this thread never blocks in a
        device fetch, so new decode jobs dispatch the moment they are
        planned and the dispatch round-trip overlaps the previous batch's
        decode + fetch. One fetch thread preserves per-stream chunk→done
        FIFO order ('finish' rides the same queue, no barriers needed)."""
        while True:
            item = self._vocode_q.get()
            if item is None:
                self._emit_q.put(None)
                return
            kind, payload = item
            if kind == "decode":
                try:
                    t0 = time.perf_counter()
                    handle = self.vocoder.decode_frames_batch_launch(
                        [layers for _, _, layers in payload],
                        first_frames=[pl.w0 for _, pl, _ in payload],
                        noise_seeds=[
                            st.lookahead.noise_seed
                            for st, _, _ in payload
                        ],
                    )
                    self._emit_q.put(("decode", (payload, handle, t0)))
                except Exception as e:  # noqa: BLE001
                    for st, _, _ in payload:
                        st.req.events.put(("error", f"vocoder error: {e}"))
                    self._vq_done()
            else:  # "finish"
                self._emit_q.put(item)

    def _emit_worker(self) -> None:
        """Stage 2: blocking fetch + chunk emission + finish events."""
        while True:
            item = self._emit_q.get()
            if item is None:
                return
            kind, payload = item
            if kind == "decode":
                jobs, handle, t0 = payload
                try:
                    outs = self.vocoder.decode_frames_batch_fetch(handle)
                    decode_ms = (time.perf_counter() - t0) * 1000.0
                    for (state, plan, _), audio in zip(jobs, outs):
                        if state.req.cancelled:
                            continue
                        state.metrics.decode_times_ms.append(
                            decode_ms / len(jobs)
                        )
                        samples = audio[plan.lo : plan.hi]
                        if len(samples):
                            state._emit(samples)
                except Exception as e:  # noqa: BLE001
                    for st, _, _ in jobs:
                        st.req.events.put(
                            ("error", f"vocoder error: {e}")
                        )
                finally:
                    self._vq_done()
            else:  # "finish"
                state = payload
                try:
                    state.finish()
                except Exception as e:  # noqa: BLE001
                    state.req.events.put(
                        ("error", f"vocoder error: {e}")
                    )
                finally:
                    self._vq_done()

    def _launch_ids(self):
        return [s.req.id if s is not None else None for s in self.slots]

    def _consume_one(self) -> bool:
        """Fetch + process the oldest in-flight launch (one pipeline slot).
        Factored out of step() so preemption can drain the pipeline before
        snapshotting a victim's sampling chain."""
        prev = self._inflight.popleft() if self._inflight else None
        prof = self._prof
        if prev is None:
            return False
        (toks_d, tok_d, act_d, sp_used, launch_ids, skip_first,
         fused_pcm) = prev
        if prof is not None:
            _t = time.perf_counter()
        toks = np.asarray(toks_d)        # overlaps the in-flight calls
        active = np.asarray(act_d)
        self._last_tok = np.array(tok_d)
        if prof is not None:
            _now = time.perf_counter()
            prof["fetch_s"] += _now - _t
            prof["ticks"] += 1
            _t = _now
        finishing = []
        for slot, state in enumerate(self.slots):
            if state is None or launch_ids[slot] != state.req.id:
                continue
            if not self._active[slot]:
                continue
            row = toks[slot]
            if skip_first is not None and skip_first[slot]:
                row = row[1:]   # fused-admission repeat of last token
            finished = state.on_tokens(
                [int(t) for t in row], self.eos_id
            )
            # device-side EOS/max-seq freeze also ends the slot
            if finished or not active[slot]:
                finishing.append(slot)
        if prof is not None:
            _now = time.perf_counter()
            prof["host_tokens_s"] += _now - _t
            _t = _now
        if fused_pcm is not None:
            # fused admission vocode: emit eligible slots' first chunks
            # straight from the chained device decode; their lookahead
            # bookkeeping commits here so the tick below plans the rest
            f_slots, pcm_d, ok_d, nf, emit = fused_pcm
            try:
                okv = np.asarray(ok_d)
                pcm = np.asarray(pcm_d)
            except Exception:
                okv = None
            if okv is not None:
                for sl in f_slots:
                    state = self.slots[sl]
                    if (state is None or launch_ids[sl] != state.req.id
                            or sl in finishing or not okv[sl]
                            or state.req.cancelled
                            or state.metrics.chunks):
                        continue
                    la = state.lookahead
                    plan = la.plan()
                    # the fused graph decoded EXACTLY frames [0, nf);
                    # any other window would see different context
                    if (plan is None or plan.w0 != 0 or plan.lo != 0
                            or plan.w1 != nf or plan.hi != emit):
                        continue
                    la.commit(plan)
                    state.metrics.decode_times_ms.append(0.0)
                    state._emit(pcm[sl])
        if prof is not None:
            _now = time.perf_counter()
            prof["fused_pcm_s"] += _now - _t
            _t = _now
        self._vocode_tick(finishing)
        if prof is not None:
            _now = time.perf_counter()
            prof["vocode_plan_s"] += _now - _t
            _t = _now
        for slot in finishing:
            state = self.slots[slot]
            if state is not None:
                # the done event must follow the slot's flush chunks:
                # it rides the same FIFO as the decode jobs
                self._vq_put(("finish", state))
            self._release(slot)
        return True

    # -- preemption (EngineConfig.kv_on_demand, VERDICT r4 #4) ---------------

    def _drain_inflight(self) -> None:
        """Fetch + process every in-flight launch: the device sampling
        chain has advanced through every LAUNCHED step, so a preemption
        snapshot is only consistent once the host has processed those
        tokens too."""
        while self._inflight:
            self._consume_one()

    def _pick_victim(self) -> Optional[int]:
        """Youngest resumable active stream (highest request id whose
        prompt+generated re-prefill fits a resume bucket)."""
        best = None
        for slot, state in enumerate(self.slots):
            if state is None or state.req.cancelled or not state.token_ids:
                continue
            resume_len = len(state.prompt_ids or []) \
                + len(state.token_ids) - 1
            if self.core.resume_bucket_len(resume_len) is None:
                continue
            if best is None or state.req.id > best[1]:
                best = (slot, state.req.id)
        return best[0] if best is not None else None

    def _preempt(self, slot: int) -> None:
        """Evict a stream from its slot, keeping everything needed to
        resume bit-identically: the raw token stream (re-prefill input)
        and the sampling-chain snapshot. The request rejoins the head of
        the held queue; its emitted audio stands, the stream just gaps."""
        state = self.slots[slot]
        state.resume_snapshot = self.core.snapshot_slot(slot)
        self.core.preempt_slot(slot)
        self.slots[slot] = None
        self._active[slot] = False
        state.req._resume_state = state
        self._held.appendleft(state.req)
        self.preemptions += 1

    def _maybe_preempt(self) -> bool:
        """When the next decode call's on-demand block growth cannot be
        covered, preempt youngest-first until it can (the vLLM
        preempt-and-recompute policy, SURVEY §2.2). Drains the launch
        pipeline first so snapshots match the processed stream exactly."""
        ecfg = self.config.engine
        if not (ecfg.paged_kv and ecfg.kv_on_demand):
            return False
        n = ecfg.decode_steps_per_call
        if self._backlog or self._held or not self.pending.empty():
            # an admission launch also decodes every live slot for
            # admission_steps — size the dry-run to the bigger window
            n = max(n, self.admission_steps)
        if not self.core.starved_slots(n):
            return False
        self._drain_inflight()
        while True:
            starved = self.core.starved_slots(n)
            if not starved:
                return True
            victim = self._pick_victim()
            if victim is None:
                # nothing resumable (every live stream outgrew the resume
                # buckets): evict the starved streams with a clean error
                # rather than wedging the whole engine
                for sl in starved:
                    st = self.slots[sl]
                    if st is not None:
                        st.req.events.put((
                            "error",
                            "evicted: KV pool exhausted and stream too "
                            "long to preempt-resume (raise kv_pool_tokens "
                            "or resume_buckets)",
                        ))
                        self._release(sl)
                return True
            self._preempt(victim)

    def step(self) -> bool:
        """One scheduler iteration; returns True if any work was done.

        (Synchronous callers — tests — must call _ensure_vocode_worker or
        start(); step() does it lazily.)

        Pipelined: while this step fetches and processes the in-flight
        decode call's tokens (host work + tunnel round-trip), the NEXT call
        is already running on the device — launched speculatively with
        device-chained tok/active handles. Speculation is only done when no
        admissions are queued (admission changes slot assignments and
        sampling params); per-slot request ids guard against attributing a
        finished request's speculative tokens to a newly admitted one.
        """
        self._ensure_vocode_worker()
        did = self._maybe_preempt()
        # speculative top-up: keep the launch queue full while no admissions
        # wait (each launch chains device handles from the newest one)
        while (self._inflight and self.pending.empty()
               and not self._backlog and not self._held
               and self._active.any()
               and len(self._inflight) < self.pipeline_depth):
            _, tok_d, act_d, sp_used, _, _, _ = self._inflight[-1]
            nxt = self.core.decode_steps_launch(sp_used, tok_d, act_d)
            E.copy_async(*nxt[:3])
            self._inflight.append(
                (nxt[0], nxt[1], nxt[2], sp_used, self._launch_ids(), None,
                 None)
            )
        did = self._consume_one() or did
        prof = self._prof
        if prof is not None:
            _t2 = time.perf_counter()
        if not self._inflight:
            did = self._admit() or did
            if not self._inflight and self._active.any():
                sp = self._sampling_params()
                nxt = self.core.decode_steps_launch(
                    sp, self._last_tok, self._active
                )
                E.copy_async(*nxt[:3])
                self._inflight.append(
                    (nxt[0], nxt[1], nxt[2], sp, self._launch_ids(), None,
                     None)
                )
                did = True
        if prof is not None:
            prof["admit_launch_s"] += time.perf_counter() - _t2
        return did

    def fail_all(self, message: str) -> None:
        """Fail every live/pending request with an error event (watchdog /
        fatal-error path — consumers get a clean error, never a hang)."""
        for slot, state in enumerate(self.slots):
            if state is not None:
                state.req.events.put(("error", message))
                self._release(slot)
        while self._held:
            self._held.popleft().events.put(("error", message))
        for req in self._backlog:
            req.events.put(("error", message))
        self._backlog.clear()
        while not self.pending.empty():
            try:
                req = self.pending.get_nowait()
                req.events.put(("error", message))
            except queue.Empty:
                break
        self._inflight.clear()

    def run_forever(self) -> None:
        while not self._stop.is_set():
            try:
                did_work = self.step()
            except Exception as e:  # noqa: BLE001 — fail requests, keep serving
                self.fail_all(f"scheduler error: {type(e).__name__}: {e}")
                if not getattr(e, "lockstep_fatal", False):
                    # under lockstep, a dead follower can first surface as
                    # a generic collective abort (gloo timeout) — probe the
                    # side channel to tell 'transient error' from 'mesh is
                    # missing a member' (plain EngineCore has no probe)
                    probe = getattr(self.core, "lockstep_check", None)
                    if probe is not None:
                        try:
                            probe()
                        except Exception as pe:  # noqa: BLE001
                            if getattr(pe, "lockstep_fatal", False):
                                e = pe
                if getattr(e, "lockstep_fatal", False):
                    # LockstepPeerLost (parallel/lockstep.py): the multi-
                    # process mesh is missing a member — no future step can
                    # succeed. Stop serving and tell the process to exit
                    # nonzero; the supervisor restarts the whole group.
                    self.fatal = str(e)
                    self._stop.set()
                    if self.on_fatal is not None:
                        self.on_fatal(self.fatal)
                    return
                did_work = True
            now = time.perf_counter()
            if did_work:
                self._last_progress = now
            elif (self.n_active or self._held or self._backlog
                  or not self.pending.empty()) \
                    and now - self._last_progress > self.watchdog_s:
                self.fail_all(
                    f"watchdog: no progress for {self.watchdog_s:.0f}s"
                )
                self._last_progress = now
            if not did_work:
                self._wakeup.wait(timeout=0.01)
                self._wakeup.clear()
