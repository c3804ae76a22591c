"""Short CI soak: randomized churn (mixed configs + cancels) over the
scheduler must end clean — no errors, no slot/vocode leaks, all submissions
accounted for. The full harness is tools/soak.py (SURVEY.md §5.3)."""

import pytest

from tts_inference_tpu.engine.scheduler import Scheduler
from tts_inference_tpu.runtime import create_tiny_runtime
from tts_inference_tpu.tools.soak import run_soak


@pytest.mark.slow
def test_soak_short():
    rt = create_tiny_runtime(seed=0)
    sched = Scheduler(
        rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer
    )
    sched.start()
    try:
        report = run_soak(
            sched, duration_s=6.0, warm_s=3.0, target_streams=3,
            cancel_rate=0.15, seed=1, rss_limit_mb=256.0,
        )
    finally:
        sched.stop()
    assert report["ok"], report
