"""tts_inference_tpu — TPU-native streaming TTS serving framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference ``Demon-Sheriff/tts-inference`` stack (see SURVEY.md): an
Orpheus-3B-style autoregressive audio-token decoder, a SNAC-equivalent
neural vocoder, a lookahead streaming decoder, continuous batching, and a
WebSocket/HTTP serving layer speaking the reference's wire protocol.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

    L0  XLA / TPU runtime (jit, pjit, Pallas kernels)
    L1  engine/         — jitted prefill + multi-token decode, KV cache
    L2  engine/aot.py   — AOT compile + persistent cache ("engine build")
    L3  models/snac.py  — vocoder (codes → 24 kHz PCM), ops/ kernels
    L4  streaming/      — token→frame→PCM orchestration, lookahead policy
    L5  serving/        — FastAPI WS/HTTP, reference wire protocol
    L7  benchmarks/     — TTFA/RTF/gap clients, W&B-style analysis
    L8  training/       — LoRA fine-tune + merge sidecar
"""

__version__ = "0.1.0"

from tts_inference_tpu import protocol  # noqa: F401
