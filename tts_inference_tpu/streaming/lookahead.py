"""Lookahead streaming decoder: emit only context-stable samples.

The reference's central engineering discovery (spec.md:11-45,
PIPELINE_REPORT.md:475-519): the SNAC decoder is context-dependent in both
directions, so naively chunked streaming clicks. Its fix —
`LookaheadStreamingDecoder` — re-decodes ALL frames from 0 on every chunk and
emits only samples with ≥5 frames of future context (O(n²) total decode work,
0.9987 correlation vs batch decode).

This is the TPU-native redesign (SURVEY.md §7.3):

- **Windowed re-decode**: each chunk decodes only a bounded window
  [emit_frame − left_context, total_frames). The vocoder's influence reach
  is ±2.29 frames (measured in tests/test_snac.py::test_receptive_field
  _bounded — a pure function of the conv geometry), so with
  left_context ≥ 3 and lookahead ≥ 3 the emitted samples are **bit-exact**
  equal to a full batch decode. O(n) total work instead of O(n²).
- **Deterministic position-addressed noise** (models/snac.py) removes the
  reference's residual decode nondeterminism entirely.
- The emission rule itself is preserved: with `lookahead_frames` L, sample s
  is emitted once ≥ L complete frames exist after s's frame; on EOS all
  remaining samples flush (PIPELINE_REPORT.md:505-511).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from tts_inference_tpu import protocol
from tts_inference_tpu.config import StreamConfig
from tts_inference_tpu.models.snac import SnacDecoder


@dataclasses.dataclass(frozen=True)
class WindowPlan:
    """Decode frames [w0, w1); emit samples [lo, hi) of that decode."""

    w0: int
    w1: int
    lo: int
    hi: int


@dataclasses.dataclass
class LookaheadStreamingDecoder:
    """Incremental codes → stable PCM samples.

    feed(codes) buffers flat interleaved audio codes (7/frame, offsets still
    applied); poll() / flush() return newly stable float32 samples.
    """

    decoder: SnacDecoder
    stream_cfg: StreamConfig = dataclasses.field(default_factory=StreamConfig)
    noise_seed: int = 0
    # use the C++ deinterleave (native/tts_runtime.cpp) for window assembly
    use_native: bool = False
    # one-time extra frames on the SECOND chunk (then back to
    # frames_per_chunk): the scheduler sets slot % frames_per_chunk here so
    # concurrently admitted streams chunk on DIFFERENT ticks — the
    # synchronized vocode burst was the worst-gap driver at the capacity
    # frontier (PERF.md round 5). Pure cadence change: emitted bytes are
    # identical (windowed decode is chunk-boundary independent).
    chunk_phase: int = 0

    codes: List[int] = dataclasses.field(default_factory=list, init=False)
    samples_emitted: int = dataclasses.field(default=0, init=False)
    decode_calls: int = dataclasses.field(default=0, init=False)
    frames_decoded_total: int = dataclasses.field(default=0, init=False)

    @property
    def spf(self) -> int:
        return self.decoder.cfg.samples_per_frame

    @property
    def total_frames(self) -> int:
        return len(self.codes) // protocol.FRAME_SIZE

    def feed(self, new_codes) -> None:
        self.codes.extend(int(c) for c in new_codes)

    def plan(self, flush: bool = False) -> Optional["WindowPlan"]:
        """Decide the next decode window + emission span WITHOUT decoding.

        The multi-stream scheduler collects plans from every stream per tick
        and batch-decodes them in one device call; `execute()` runs a single
        plan (the single-stream path). A returned plan must be passed to
        exactly one of execute()/commit().
        """
        if flush:
            stable_frames = self.total_frames
        else:
            first = self.samples_emitted == 0
            lookahead = self.stream_cfg.lookahead_frames
            if first and self.stream_cfg.first_chunk_lookahead is not None:
                lookahead = self.stream_cfg.first_chunk_lookahead
            stable_frames = self.total_frames - lookahead
            # the phase SHRINKS the second chunk (never extends it): a
            # longer phase-in chunk would itself become the stream's worst
            # gap — measured at the 24-stream point, +245 ms worst gap the
            # extend way, see PERF.md round 5
            need = (self.stream_cfg.first_chunk_frames if first
                    else max(1, self.stream_cfg.frames_per_chunk
                             - (self.chunk_phase
                                if self.decode_calls == 1 else 0)))
            pending = stable_frames - self.samples_emitted // self.spf
            if pending < max(1, need):
                return None
        stable_end = stable_frames * self.spf
        if stable_end <= self.samples_emitted:
            return None
        emit_frame = self.samples_emitted // self.spf
        w0 = max(0, emit_frame - self.stream_cfg.left_context_frames)
        return WindowPlan(
            w0=w0,
            w1=self.total_frames,
            lo=self.samples_emitted - w0 * self.spf,
            hi=stable_end - w0 * self.spf,
        )

    def window_layers(self, plan: "WindowPlan"):
        flat = np.asarray(
            self.codes[plan.w0 * protocol.FRAME_SIZE
                       : plan.w1 * protocol.FRAME_SIZE],
            dtype=np.int32,
        )
        if self.use_native:
            from tts_inference_tpu.utils.native import native_deinterleave

            return native_deinterleave(flat)
        return protocol.deinterleave_frames(flat)

    def commit(self, plan: "WindowPlan") -> None:
        """Advance emission bookkeeping for a plan decoded externally."""
        self.decode_calls += 1
        self.frames_decoded_total += plan.w1 - plan.w0
        self.samples_emitted = plan.hi + plan.w0 * self.spf

    def execute(self, plan: "WindowPlan") -> np.ndarray:
        l1, l2, l3 = self.window_layers(plan)
        audio = self.decoder.decode_frames(
            l1, l2, l3, noise_seed=self.noise_seed, first_frame=plan.w0
        )
        self.commit(plan)
        return audio[plan.lo : plan.hi]

    def poll(self) -> Optional[np.ndarray]:
        """Newly stable samples given current buffer (None if not enough)."""
        plan = self.plan()
        return None if plan is None else self.execute(plan)

    def flush(self) -> Optional[np.ndarray]:
        """EOS: emit all remaining samples (now stable with full context)."""
        plan = self.plan(flush=True)
        return None if plan is None else self.execute(plan)
