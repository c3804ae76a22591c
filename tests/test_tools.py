"""Diagnostic-tool tests: analyzer, lookahead sweep, SOS ablation, parity."""

import json

import numpy as np
import pytest

from tts_inference_tpu import protocol as P
from tts_inference_tpu.tools import analyze_tokens as AT


def make_stream(rng, n_frames=6, two_segments=False):
    def frames(k):
        out = []
        for _ in range(k):
            for p in range(P.FRAME_SIZE):
                out.append(int(rng.integers(0, P.CODEBOOK_SIZE))
                           + P.POSITION_OFFSETS[p] + P.TOKEN_AUDIO_BASE)
        return out

    toks = [P.TOKEN_SOH, 100, P.TOKEN_EOT, P.TOKEN_EOH, P.TOKEN_SOS]
    toks += frames(n_frames // (2 if two_segments else 1))
    if two_segments:
        toks += [P.TOKEN_DELIMITER, P.TOKEN_SOS] + frames(n_frames // 2)
    toks.append(P.TOKEN_EOS)
    return toks


def test_census_and_offsets(rng):
    toks = make_stream(rng, 6, two_segments=True)
    rep = AT.analyze(toks)
    assert rep["census"]["counts"]["SOS"] == 2
    assert rep["census"]["counts"]["EOS"] == 1
    assert rep["extraction"]["frames"] == 6
    assert rep["offsets"]["violations"] == 0
    for p in range(7):
        assert rep["offsets"]["per_position"][f"pos{p}"]["in_range_pct"] == 100.0


def test_audio_sanity_warnings():
    silent = AT.audio_sanity(np.zeros(24000, np.float32))
    assert any("silence" in w for w in silent["warnings"])
    clipped = AT.audio_sanity(np.ones(24000, np.float32))
    assert any("clipping" in w for w in clipped["warnings"])


def test_lookahead_sweep_shows_exactness(rng):
    import jax

    from tts_inference_tpu.config import SnacConfig
    from tts_inference_tpu.models import snac
    from tts_inference_tpu.tools.lookahead_sweep import sweep

    cfg = SnacConfig(latent_dim=32, decoder_dim=64, codebook_dim=4,
                     codebook_size=64)
    decoder = snac.SnacDecoder(
        snac.init_snac_params(jax.random.PRNGKey(0), cfg), cfg
    )
    codes = []
    for _ in range(24):
        for p in range(P.FRAME_SIZE):
            codes.append(int(rng.integers(0, 64)) + P.POSITION_OFFSETS[p])
    table = sweep(decoder, codes, lookaheads=(0, 3, 5), left_context=4)
    # ≥3 frames covers the influence reach → bit-exact (beats the
    # reference's corr 0.9987 @ 5 frames); 0 frames shows edge error
    assert table[3]["mse"] < 1e-9 and table[5]["mse"] < 1e-9
    assert table[3]["pass"] and table[5]["pass"]
    assert table[0]["mse"] > table[3]["mse"]


def test_sos_ablation(tmp_path, rng):
    import jax

    from tts_inference_tpu.config import SnacConfig
    from tts_inference_tpu.models import snac
    from tts_inference_tpu.tools.sos_ablation import ablate

    cfg = SnacConfig(latent_dim=32, decoder_dim=64, codebook_dim=4)
    decoder = snac.SnacDecoder(
        snac.init_snac_params(jax.random.PRNGKey(0), cfg), cfg
    )
    toks = make_stream(rng, 6, two_segments=True)
    rep = ablate(decoder, toks, str(tmp_path))
    assert rep["first_sos"]["frames"] == 6
    assert rep["last_sos"]["frames"] == 3
    import os

    assert os.path.exists(rep["first_sos"]["wav"])
    assert os.path.exists(rep["last_sos"]["wav"])


def test_compare_backends_parity():
    from tts_inference_tpu.runtime import create_tiny_runtime
    from tts_inference_tpu.tools.compare_backends import compare

    rt = create_tiny_runtime(seed=0)
    rep = compare(rt, "parity", "tara", max_tokens=12)
    assert rep["match"], rep
    assert rep["engine"]["tokens"] >= 1


def test_analyze_cli_stdin(tmp_path, rng):
    toks = make_stream(rng, 3)
    f = tmp_path / "dump.json"
    f.write_text(json.dumps({"token_ids": toks}))
    from tts_inference_tpu.tools.analyze_tokens import main

    assert main(["--tokens-json", str(f)]) == 0


def test_aot_compile_spawn(tmp_path):
    """Fire-and-forget engine build (reference: spawn_build.py
    `build_engine.spawn()`): the parent returns immediately; the detached
    child writes build_info.json."""
    import json
    import os
    import subprocess
    import sys
    import time

    bi = tmp_path / "bi.json"
    log = tmp_path / "spawn.log"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "tts_inference_tpu.cli", "aot-compile",
         "--tiny", "--cpu", "--no-warmup", "--spawn",
         "--spawn-log", str(log), "--build-info", str(bi)],
        capture_output=True, text=True, timeout=60, env=env,
        cwd="/root/repo",
    )
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["spawned_pid"] > 0
    deadline = time.time() + 180
    while time.time() < deadline and not bi.exists():
        time.sleep(1)
    assert bi.exists(), log.read_text()[-500:] if log.exists() else "no log"
    meta = json.loads(bi.read_text())
    assert meta["framework"] == "tts_inference_tpu"


def test_vocoder_dtype_fidelity_tiny_cpu(capsys):
    """bf16-vocoder fidelity bound (the --vocoder-bf16 gate): same codes
    through the f32 and bf16 conv stacks land inside the reference's
    streaming-quality thresholds (PIPELINE_REPORT.md:513-519)."""
    from tts_inference_tpu.tools import vocoder_dtype_fidelity as vdf

    assert vdf.main(["--tiny", "--cpu", "--frames", "8",
                     "--batch", "2"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["pass"] is True


@pytest.mark.slow
def test_measurement_benches_tiny_cpu(capsys):
    """The round-5 measurement benches (vocode burst bench, lockstep
    mirroring overhead) run end-to-end on the tiny CPU runtime and emit
    their JSON contracts."""
    from tts_inference_tpu.tools import lockstep_overhead, vocode_bench

    assert vocode_bench.main(
        ["--tiny", "--cpu", "--rows", "2", "--frames", "4",
         "--iters", "2"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["rows"] == 2 and row["ms_per_call"] > 0

    assert lockstep_overhead.main(["--tiny", "--cpu", "--iters", "20"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mirror_cost_us_per_call" in row
    assert row["e2e_plain_ms_per_launch"] > 0
