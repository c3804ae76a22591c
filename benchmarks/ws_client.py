"""Async WebSocket benchmark client for the /ws/tts protocol.

Plays the role of the reference's run_single_benchmark /
run_single_iteration clients (comprehensive_sweep.py:118-210,
benchmark_with_wandb.py:77-193): send one JSON request, time every binary
chunk arrival, extract server metrics from the done message.
Works against this framework's server AND the reference's (same protocol).
"""

from __future__ import annotations

import json
import time
from typing import Optional

from benchmarks.metrics import ChunkEvent, RunResult


async def run_single(
    url: str,
    text: str,
    *,
    prompt_id: str = "p0",
    voice: str = "tara",
    temperature: float = 0.6,
    top_p: float = 0.95,
    frames_per_chunk: int = 5,
    max_tokens: Optional[int] = None,
    is_cold_start: bool = False,
    save_audio_to: Optional[str] = None,
    extra_request: Optional[dict] = None,
    timeout_s: float = 300.0,
) -> RunResult:
    import websockets

    result = RunResult(
        prompt_id=prompt_id, prompt_text=text, text_length=len(text),
        is_cold_start=is_cold_start,
    )
    audio = bytearray()
    try:
        async with websockets.connect(
            url, ping_interval=30, ping_timeout=120, open_timeout=timeout_s
        ) as ws:
            request = {
                "text": text,
                "voice": voice,
                "temperature": temperature,
                "top_p": top_p,
                "frames_per_chunk": frames_per_chunk,
                "benchmark": True,
            }
            if max_tokens is not None:
                request["max_tokens"] = max_tokens
            if extra_request:
                request.update(extra_request)
            await ws.send(json.dumps(request))
            t0 = time.perf_counter()
            last = None
            chunk_id = 0
            while True:
                msg = await ws.recv()
                now = time.perf_counter()
                if isinstance(msg, (bytes, bytearray)):
                    chunk_id += 1
                    arrival = (now - t0) * 1000.0
                    if result.client_ttfa_ms == 0.0:
                        result.client_ttfa_ms = arrival
                    gap = 0.0 if last is None else (now - last) * 1000.0
                    last = now
                    result.chunk_events.append(ChunkEvent(
                        chunk_id=chunk_id, arrival_ms=arrival,
                        size_bytes=len(msg), gap_ms=gap,
                    ))
                    audio.extend(msg)
                else:
                    data = json.loads(msg)
                    if data.get("done"):
                        result.client_wall_ms = (now - t0) * 1000.0
                        result.total_chunks = data.get("chunks", chunk_id)
                        sm = data.get("server_metrics") or {}
                        result.server_ttft_ms = sm.get("server_ttft_ms")
                        result.server_ttfa_ms = sm.get("server_ttfa_ms")
                        result.server_rtf = sm.get("server_rtf")
                        result.tokens_per_sec = sm.get("tokens_per_sec")
                        break
                    if data.get("error"):
                        result.error = str(data["error"])
                        break
    except Exception as e:  # noqa: BLE001 — recorded, iteration continues
        result.error = f"{type(e).__name__}: {e}"
        return result

    result.total_bytes = len(audio)
    from tts_inference_tpu import protocol

    result.audio_duration_ms = (len(audio) // 2) / protocol.SAMPLE_RATE * 1e3
    if save_audio_to and audio:
        from tts_inference_tpu.utils.audio import write_wav

        write_wav(save_audio_to, bytes(audio))
    return result
