"""Generation engines (the reference's `inference_engines/` registry analog).

Two first-party backends over one jitted compute core:

- ``engine.GenerationEngine`` — single-stream, lowest latency (the
  reference's vLLM/TRT single-request paths).
- ``scheduler.Scheduler``    — continuous batching over fixed slots
  (the capability the reference's roadmap calls for).
"""

from tts_inference_tpu.engine.engine import EngineCore, GenerationEngine
from tts_inference_tpu.engine.scheduler import Scheduler, TTSRequest

BACKENDS = {
    "single": GenerationEngine,
    "scheduler": Scheduler,
}

__all__ = ["EngineCore", "GenerationEngine", "Scheduler", "TTSRequest",
           "BACKENDS"]
