"""TTS pipeline: text → prompt → token stream → stable PCM chunks.

The L4 streaming orchestration layer (reference: `stream_audio`
`modal_audio_stream.py:340-423` and the lookahead production variant,
PIPELINE_REPORT.md:496-519), rebuilt around the windowed lookahead decoder
and the multi-token-per-dispatch engine.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tts_inference_tpu import protocol
from tts_inference_tpu.config import Config, SamplingConfig, StreamConfig
from tts_inference_tpu.engine.engine import GenerationEngine
from tts_inference_tpu.models.snac import SnacDecoder, decode_codes, to_pcm16
from tts_inference_tpu.streaming.lookahead import LookaheadStreamingDecoder
from tts_inference_tpu.utils.audio import pcm16_bytes
from tts_inference_tpu.utils.timing import PhaseTimer
from tts_inference_tpu.utils.tokenizer import TokenizerProtocol


@dataclasses.dataclass
class AudioChunk:
    pcm: bytes               # int16 LE mono 24 kHz
    index: int
    samples: int

    @property
    def duration_ms(self) -> float:
        return self.samples / protocol.SAMPLE_RATE * 1000.0


@dataclasses.dataclass
class StreamMetrics:
    """server_metrics payload fields (reference wire contract:
    PIPELINE_REPORT.md:667-691 and comprehensive_sweep.py:192-197)."""

    ttft_ms: float = 0.0
    ttfa_ms: float = 0.0
    tokens: int = 0
    frames: int = 0
    chunks: int = 0
    audio_duration_ms: float = 0.0
    generation_time_ms: float = 0.0
    tokens_per_sec: float = 0.0
    frames_per_sec: float = 0.0
    rtf: float = 0.0
    decode_times_ms: List[float] = dataclasses.field(default_factory=list)

    def finalize(self) -> "StreamMetrics":
        s = self.generation_time_ms / 1000.0
        if s > 0:
            self.tokens_per_sec = self.tokens / s
            self.frames_per_sec = self.frames / s
            self.rtf = (self.audio_duration_ms / 1000.0) / s
        return self

    def as_wire(self) -> dict:
        """The `server_metrics` JSON object the benchmark clients read."""
        return {
            "server_ttft_ms": round(self.ttft_ms, 2),
            "server_ttfa_ms": round(self.ttfa_ms, 2),
            "server_rtf": round(self.rtf, 4),
            "tokens": self.tokens,
            "tokens_per_sec": round(self.tokens_per_sec, 2),
            "frames_per_sec": round(self.frames_per_sec, 2),
            "generation_time_s": round(self.generation_time_ms / 1000.0, 3),
            "decode_times_ms": [round(d, 2) for d in self.decode_times_ms],
        }


class TTSPipeline:
    """Single-stream synthesis over one engine slot.

    `stream()` yields AudioChunks then returns; final metrics live on
    `self.last_metrics` (also handed to the caller via the generator's
    StopIteration value when consumed manually).
    """

    def __init__(
        self,
        engine: GenerationEngine,
        vocoder: SnacDecoder,
        tokenizer: TokenizerProtocol,
        config: Optional[Config] = None,
    ):
        self.engine = engine
        self.vocoder = vocoder
        self.tokenizer = tokenizer
        self.config = config or Config()
        self.last_metrics: Optional[StreamMetrics] = None
        self._first_pcm_cache: dict = {}
        # fused first-chunk vocode toggle (A/B and tests); the fallback
        # host path is always kept compiled-in either way
        self.fuse_first_chunk: bool = True

    # -- fused first-chunk vocode (TTFA fast path) --------------------------
    #
    # The first audio chunk's vocoder decode is chained onto the engine's
    # first-burst dispatch DEVICE-TO-DEVICE: token extraction (audio-range
    # check, deinterleave, clamp) and the SNAC decode run in one extra jitted
    # graph on the burst's token buffer, so the first PCM reaches the host in
    # the same round-trip window as the first tokens — no second dispatch on
    # the TTFA-critical path. (The reference pays a full vLLM→SNAC process
    # hop here, modal_audio_stream.py:340-423.)
    #
    # Bit-exactness: the in-graph path reproduces TokenExtractor +
    # deinterleave_frames + SnacDecoder.decode_frames exactly (same bucket
    # padding, valid mask, noise seed); anything unclean (SOS/EOS/non-audio
    # in the burst, plan mismatch) flips `ok` and the host path takes over
    # untouched.

    def _first_pcm_fn(self, n_codes: int, nf: int, emit: int):
        key = (n_codes, nf, emit)
        fn = self._first_pcm_cache.get(key)
        if fn is not None:
            return fn
        voc = self.vocoder
        cfg = voc.cfg
        nb = voc.bucket_frames(nf)
        lat = max(cfg.vq_strides)
        ab = protocol.TOKEN_AUDIO_BASE
        offs = np.asarray(protocol.POSITION_OFFSETS, np.int32)
        use_noise = voc.use_noise

        def impl(toks, noise_seed):
            t = toks[0, :n_codes].astype(jnp.int32)
            ok = jnp.all(
                (t >= ab) & (t < ab + protocol.AUDIO_VOCAB)
            )
            frames = (t - ab).reshape(nf, protocol.FRAME_SIZE) - offs
            frames = jnp.clip(frames, 0, cfg.codebook_size - 1)
            l1 = frames[:, 0]
            l2 = frames[:, (1, 4)].reshape(-1)
            l3 = frames[:, (2, 3, 5, 6)].reshape(-1)
            pad = lambda x, m: (  # noqa: E731
                jnp.zeros((1, m * nb), jnp.int32).at[0, : x.shape[0]].set(x)
            )
            audio = decode_codes(
                voc.params, cfg,
                (pad(l1, 1), pad(l2, 2), pad(l3, 4)),
                noise_seed=jnp.full((1,), noise_seed, jnp.uint32),
                latent_offset=jnp.zeros((1,), jnp.uint32),
                use_noise=use_noise,
                valid_latent=jnp.full((1,), nf * lat, jnp.int32),
            )
            return to_pcm16(audio[0, :emit]), ok

        fn = jax.jit(impl)
        self._first_pcm_cache[key] = fn
        return fn

    def build_prompt(self, text: str, voice: str = "tara",
                     force_speech: bool = False) -> List[int]:
        text = text[: protocol.MAX_TEXT_CHARS]
        ids = self.tokenizer.encode(protocol.format_prompt_text(text, voice))
        return protocol.format_prompt_ids(ids, force_speech=force_speech)

    def stream(
        self,
        text: str,
        voice: str = "tara",
        sampling: Optional[SamplingConfig] = None,
        stream_cfg: Optional[StreamConfig] = None,
        noise_seed: int = 0,
        force_speech: bool = False,
    ) -> Iterator[AudioChunk]:
        sampling = sampling or self.config.sampling
        scfg = stream_cfg or self.config.stream
        timer = PhaseTimer()
        metrics = StreamMetrics()
        self.last_metrics = metrics

        prompt = self.build_prompt(text, voice, force_speech=force_speech)
        extractor = protocol.TokenExtractor(
            restart_on_sos=(scfg.extraction == "last_sos")
        )
        if force_speech:
            # prompt already ends in SOS — audio tokens start immediately
            extractor.started = True
        la = LookaheadStreamingDecoder(self.vocoder, scfg, noise_seed)
        self.last_lookahead = la   # decode-work stats (O(n) windowing)

        chunk_index = 0

        def cut(samples: np.ndarray) -> Iterator[AudioChunk]:
            nonlocal chunk_index
            metrics.ttfa_ms = metrics.ttfa_ms or timer.mark("ttfa_ms")
            chunk_index += 1
            metrics.chunks = chunk_index
            metrics.audio_duration_ms += len(samples) / protocol.SAMPLE_RATE * 1e3
            yield AudioChunk(pcm16_bytes(samples), chunk_index, len(samples))

        # first-dispatch burst: tokens needed for the first stable chunk
        # (first_chunk_frames + effective lookahead) — when this size is
        # registered/warmed on the engine, the whole first chunk's tokens
        # arrive in ONE device round trip (TTFA fast path)
        first_la = (scfg.first_chunk_lookahead
                    if scfg.first_chunk_lookahead is not None
                    else scfg.lookahead_frames)
        first_burst = (scfg.first_chunk_frames + first_la) * \
            protocol.FRAME_SIZE

        # fused first-chunk vocode: only meaningful when the prompt already
        # ends in SOS (the burst is then expected to be pure audio codes)
        nf_first = first_burst // protocol.FRAME_SIZE
        emit_first = scfg.first_chunk_frames * self.vocoder.cfg.samples_per_frame
        fused: dict = {}

        def on_first_tokens(toks_d):
            if toks_d.shape[1] < first_burst:
                return
            fn = self._first_pcm_fn(first_burst, nf_first, emit_first)
            pcm_d, ok_d = fn(toks_d, np.uint32(noise_seed))
            try:  # overlap PCM transfer with the engine's token fetch
                pcm_d.copy_to_host_async()
                ok_d.copy_to_host_async()
            except Exception:
                pass
            fused["pcm"], fused["ok"] = pcm_d, ok_d

        hook = (on_first_tokens
                if self.fuse_first_chunk and extractor.started else None)

        restarts_seen = 0
        for token_chunk in self.engine.stream(
            prompt, sampling, first_burst=first_burst,
            on_first_tokens=hook,
        ):
            metrics.ttft_ms = metrics.ttft_ms or timer.mark("ttft_ms")
            metrics.tokens += len(token_chunk)
            new_codes = extractor.feed_many(token_chunk)
            if extractor.restart_count != restarts_seen:
                # last-SOS mid-stream restart: drop buffered (un-emitted)
                # frames so segments don't mix. Samples already on the wire
                # cannot be unemitted — after first emission this degrades
                # to first-SOS semantics, like the streaming reference
                # (modal_audio_stream.py:320-333 gates on first SOS only).
                restarts_seen = extractor.restart_count
                if metrics.chunks == 0:
                    la = LookaheadStreamingDecoder(
                        self.vocoder, scfg, noise_seed
                    )
                    self.last_lookahead = la
            if new_codes:
                la.feed(new_codes)
                if fused:
                    pcm_d, ok_d = fused.pop("pcm"), fused.pop("ok")
                    t0 = time.perf_counter()
                    plan = la.plan()
                    if (plan is not None and plan.w0 == 0
                            and plan.w1 == nf_first and plan.lo == 0
                            and plan.hi == emit_first
                            and not extractor.finished
                            and extractor.restart_count == restarts_seen
                            and bool(ok_d)):
                        la.commit(plan)
                        metrics.decode_times_ms.append(
                            (time.perf_counter() - t0) * 1000.0
                        )
                        yield from cut(np.asarray(pcm_d))
                        continue
                t0 = time.perf_counter()
                out = la.poll()
                if out is not None and len(out):
                    metrics.decode_times_ms.append(
                        (time.perf_counter() - t0) * 1000.0
                    )
                    yield from cut(out)
            if extractor.finished:
                break

        t0 = time.perf_counter()
        tail = la.flush()
        if tail is not None and len(tail):
            metrics.decode_times_ms.append((time.perf_counter() - t0) * 1000.0)
            yield from cut(tail)

        metrics.frames = la.total_frames
        metrics.generation_time_ms = timer.elapsed_ms()
        metrics.ttfa_ms = metrics.ttfa_ms or metrics.generation_time_ms
        metrics.finalize()

    def synthesize(
        self,
        text: str,
        voice: str = "tara",
        sampling: Optional[SamplingConfig] = None,
        stream_cfg: Optional[StreamConfig] = None,
        force_speech: bool = False,
    ) -> tuple[bytes, StreamMetrics]:
        """Batch path (reference `/generate`): full PCM + metrics."""
        parts = [
            c.pcm for c in self.stream(
                text, voice, sampling, stream_cfg, force_speech=force_speech
            )
        ]
        assert self.last_metrics is not None
        return b"".join(parts), self.last_metrics
