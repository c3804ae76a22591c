"""Quantization quality ladder (VERDICT r3 #3): audio-space metrics for
bf16 / int8 / int4 on identical seeds, tiny CPU profile. The full-geometry
table lives in PERF.md (chip run of the same tool)."""

import numpy as np
import pytest

from tts_inference_tpu.tools import quant_ladder as QL


@pytest.mark.slow
def test_ladder_tiny_end_to_end():
    out = QL.run_ladder(tiny=True, tokens=70, utterances=2, seed=0)
    rungs = out["rungs"]
    assert set(rungs) == {"bf16", "int8", "int8+kv8", "int4_g512",
                          "int4_g128"}
    # bf16 reference produced real audio
    assert rungs["bf16"]["utterances"][0]["audio_s"] > 0.5
    for name in ("int8", "int8+kv8", "int4_g512", "int4_g128"):
        e = rungs[name]
        # every rung produced a comparable waveform (valid-range tokens →
        # frames → vocoder), with finite metrics
        assert np.isfinite(e["mse"]) and np.isfinite(e["corr"])
        assert 0.0 <= e["token_match_frac"] <= 1.0
        assert "tf_logit_rel_rms" in e and e["tf_logit_rel_rms"] < 1.0
    # int8's teacher-forced logit error must be well under int4's — the
    # ordering the recommendation rests on
    assert rungs["int8"]["tf_logit_rel_rms"] < \
        rungs["int4_g512"]["tf_logit_rel_rms"]


def test_wave_and_token_metrics():
    a = np.sin(np.linspace(0, 20, 2048)).astype(np.float32)
    m = QL._wave_metrics(a, a.copy())
    assert m["mse"] == 0.0 and m["corr"] > 0.999999
    t = QL._token_metrics([1, 2, 3, 4], [1, 2, 9, 4])
    assert t["first_divergence"] == 2
    assert t["token_match_frac"] == 0.75
