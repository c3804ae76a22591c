"""Real-checkpoint end-to-end runbook path (round-2 verdict item #7).

Writes a REAL-STRUCTURE HF checkpoint to tmp — config.json + SHARDED
safetensors (model-0000x-of-0000N) + a genuine BPE tokenizer.json — plus a
SNAC torch dir, then drives `cli generate` end-to-end through the
production loader + `HFTokenizer` path (reference workflow:
`tensorrt_tts/inference.py:128-168` loads tokenizer + engine + SNAC from
checkpoint dirs; quality contract `PIPELINE_REPORT.md:513-519`).

This is the path MIGRATION.md documents; every other test/bench uses the
offline ByteTokenizer fallback.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytest.importorskip("safetensors")
pytest.importorskip("tokenizers")

from tts_inference_tpu import protocol  # noqa: E402
from tts_inference_tpu.config import ModelConfig, SnacConfig  # noqa: E402

# Real Orpheus vocab over tiny dims: protocol special/audio ids are genuine.
REAL_VOCAB = 156940


@pytest.fixture(scope="module")
def ckpt_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("real_ckpt")

    from tests.test_llama import hf_tiny

    mc = ModelConfig.tiny(vocab_size=REAL_VOCAB)
    model = hf_tiny(mc, seed=3)
    model_dir = root / "model"
    # small shard size forces the multi-file layout real 3B checkpoints ship
    # (model-00001-of-000NN.safetensors + index json)
    model.save_pretrained(
        str(model_dir), safe_serialization=True, max_shard_size="10MB"
    )

    from tts_inference_tpu.tools.tokenizer_fixture import write_tiny_tokenizer

    write_tiny_tokenizer(str(model_dir))

    from tests.torch_snac_ref import TorchSnacRef

    # full 4096-code codebooks (real protocol range) over tiny channel dims
    scfg = SnacConfig(latent_dim=32, decoder_dim=64, codebook_dim=4)
    torch.manual_seed(4)
    ref = TorchSnacRef(scfg).eval()
    snac_dir = root / "snac"
    snac_dir.mkdir()
    torch.save(ref.state_dict(), str(snac_dir / "pytorch_model.bin"))
    (snac_dir / "config.json").write_text(json.dumps({
        "sampling_rate": 24000, "latent_dim": 32, "decoder_dim": 64,
        "decoder_rates": [8, 8, 4, 2], "codebook_size": 4096,
        "codebook_dim": 4, "vq_strides": [4, 2, 1],
        "noise": True, "depthwise": True,
    }))
    return root, str(model_dir), str(snac_dir)


def test_sharded_layout_on_disk(ckpt_dirs):
    _, model_dir, _ = ckpt_dirs
    import os

    files = os.listdir(model_dir)
    shards = [f for f in files if f.endswith(".safetensors")]
    assert len(shards) > 1, f"expected sharded checkpoint, got {shards}"
    assert "model.safetensors.index.json" in files
    assert "tokenizer.json" in files and "config.json" in files


def test_runtime_uses_checkpoint_config_and_hf_tokenizer(ckpt_dirs):
    """config.json wins over the default ModelConfig; tokenizer.json next to
    the model is auto-picked; real BPE compresses the serving prompt into
    the small prefill buckets (the round-2 TTFA attribution)."""
    _, model_dir, snac_dir = ckpt_dirs
    from tts_inference_tpu.runtime import Runtime
    from tts_inference_tpu.utils.tokenizer import HFTokenizer
    from tts_inference_tpu.config import tiny_config

    rt = Runtime.create(
        tiny_config(), model_path=model_dir, snac_path=snac_dir,
    )
    assert isinstance(rt.tokenizer, HFTokenizer)
    # checkpoint config.json (tiny dims, real vocab) replaced the default
    assert rt.config.model.vocab_size == REAL_VOCAB
    assert rt.config.model.hidden_size == 64
    assert rt.config.snac.codebook_size == 4096

    text = "Hello there, how are you doing today?"
    ids = rt.pipeline.build_prompt(text, "tara")
    # envelope = specials around "voice: text"; a real BPE lands the whole
    # prompt well under the 32 bucket (byte fallback needs >43 ids for the
    # text alone)
    assert len(ids) <= 32, len(ids)
    assert rt.engine.core.bucket_len(len(ids)) <= 32


def test_cli_generate_end_to_end(ckpt_dirs, capsys):
    """One command: checkpoint dirs → WAV (the MIGRATION.md runbook line)."""
    root, model_dir, snac_dir = ckpt_dirs
    from tts_inference_tpu import cli

    out = root / "out.wav"
    rc = cli.main([
        "generate",
        "--model-path", model_dir,
        "--snac-path", snac_dir,
        "--cpu", "--no-warmup",
        "--max-input-len", "64", "--max-output-len", "128",
        "--max-batch-size", "1", "--prefill-buckets", "16,32,64",
        "--max-tokens", "32",
        "--force-speech", "--audio-only",   # random weights need both
        "--seed", "0",
        "--text", "Hello there, how are you doing today?",
        "--voice", "tara",
        "--output", str(out),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["audio_duration_s"] > 0
    assert out.exists() and out.stat().st_size > 44  # WAV header + frames

    import wave

    with wave.open(str(out)) as w:
        assert w.getframerate() == 24000
        assert w.getnframes() > 0


def test_hf_tokenizer_roundtrip_and_protocol_safety(ckpt_dirs):
    _, model_dir, _ = ckpt_dirs
    from tts_inference_tpu.utils.tokenizer import HFTokenizer

    tok = HFTokenizer(model_dir)
    for text in ("tara: Hello!", "zac: Числа и text mix 123."):
        ids = tok.encode(text)
        assert tok.decode(ids) == text
        # all ids live far below the protocol special range
        assert max(ids) < protocol.TOKEN_SOS


@pytest.mark.slow
def test_cli_quantize_then_generate(tmp_path, capsys):
    """Offline quantization runbook: `cli quantize` → pre-quantized orbax
    checkpoint → `cli generate --model-path <it>` boots WITHOUT
    re-quantizing (Runtime restores the Quant* leaves from the marker-keyed
    plain tree) and produces audio. The weight-side analog of the TRT
    save-engine/reload flow (reference build_engine.py:141-150)."""
    from tts_inference_tpu import cli
    from tts_inference_tpu.models.quant import (
        QuantEmbed, QuantLinearI4, from_plain, to_plain,
        quantize_llama_params)
    from tts_inference_tpu.config import ModelConfig
    from tts_inference_tpu.models import llama
    import jax
    import numpy as np

    # codec roundtrip is exact
    params = llama.init_llama_params(jax.random.PRNGKey(0), ModelConfig.tiny())
    q = quantize_llama_params(params, bits=4)
    rt = from_plain(to_plain(q))
    assert isinstance(rt["layers"][0]["wq"], QuantLinearI4)
    assert isinstance(rt["embed"], QuantEmbed)
    np.testing.assert_array_equal(
        np.asarray(rt["layers"][0]["wq"].w_p),
        np.asarray(q["layers"][0]["wq"].w_p))

    ck = tmp_path / "qckpt"
    rc = cli.main([
        "quantize", "--tiny", "--cpu", "--quantize", "--weight-bits", "4",
        "--out", str(ck),
    ])
    assert rc == 0
    meta = json.loads((ck / "metadata.json").read_text())
    assert meta["quantized"] == 4 and meta["model_config"]["hidden_size"] == 64

    out = tmp_path / "q.wav"
    rc = cli.main([
        "generate", "--model-path", str(ck),
        "--cpu", "--no-warmup",
        "--max-input-len", "64", "--max-output-len", "128",
        "--max-batch-size", "1", "--prefill-buckets", "16,32",
        "--max-tokens", "32", "--force-speech", "--audio-only",
        "--seed", "0", "--text", "hello", "--output", str(out),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["audio_duration_s"] > 0


@pytest.mark.slow
def test_full_geometry_disk_roundtrip(tmp_path):
    """FULL 3B dims on disk → production loader, CPU, load only (VERDICT
    r3 #5): the tiny fixtures cannot catch full-size sharding/layout/load
    issues. ~6.4 GB of bf16 shards stream to disk and back."""
    from tts_inference_tpu.config import ModelConfig
    from tts_inference_tpu.models.loader import load_llama_checkpoint
    from tts_inference_tpu.tools.make_checkpoint import write_checkpoint

    import jax

    jax.config.update("jax_platforms", "cpu")
    out = str(tmp_path / "o3b")
    info = write_checkpoint(out, shard_bytes=2 << 30)
    full = ModelConfig()
    # 3B bf16 ≈ 6.4 GB → multiple 2 GiB shards, like real releases
    assert info["shards"] >= 3
    assert info["tensors"] == 2 + 9 * full.num_hidden_layers

    params, cfg = load_llama_checkpoint(out)
    assert cfg.hidden_size == full.hidden_size
    assert cfg.vocab_size == full.vocab_size
    assert len(params["layers"]) == full.num_hidden_layers
    assert params["embed"].shape == (full.vocab_size, full.hidden_size)
    assert params["layers"][0]["wq"].shape == (
        full.hidden_size,
        full.num_attention_heads * full.head_dim,
    )
    assert params["layers"][0]["w_down"].shape == (
        full.intermediate_size, full.hidden_size,
    )
    assert str(params["embed"].dtype) == "bfloat16"
    # tokenizer rides along (production boot needs it in the model dir)
    import os

    assert os.path.exists(os.path.join(out, "tokenizer.json"))
