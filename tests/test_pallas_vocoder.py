"""Fused Pallas vocoder residual-unit kernel vs the XLA path (interpret
mode on CPU). Parity pattern mirrors tests/test_pallas_attention.py."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tts_inference_tpu.config import SnacConfig
from tts_inference_tpu.models import snac
from tts_inference_tpu.ops.pallas.vocoder import fused_residual_unit


def unit_params(c, rng):
    return {
        "alpha1": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32)),
        "conv1": {
            "w": jnp.asarray(
                rng.normal(size=(7, 1, c)).astype(np.float32) * 0.1
            ),
            "b": jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1),
        },
        "alpha2": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32)),
        "conv2": {
            "w": jnp.asarray(
                rng.normal(size=(1, c, c)).astype(np.float32) * 0.1
            ),
            "b": jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1),
        },
    }


@pytest.mark.parametrize("dil", [1, 3, 9])
@pytest.mark.parametrize("t", [256, 1024])
def test_fused_unit_matches_reference(dil, t):
    rng = np.random.default_rng(0)
    b, c = 2, 64
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    p = unit_params(c, rng)
    want = snac._residual_unit(x, p, dil, groups=c)
    got = fused_residual_unit(x, p, dil, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_unit_valid_masking():
    rng = np.random.default_rng(1)
    b, t, c = 2, 512, 32
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    p = unit_params(c, rng)
    valid = jnp.asarray([100, 512], jnp.int32)
    want = snac._residual_unit(x, p, 3, groups=c, valid=valid)
    got = fused_residual_unit(x, p, 3, valid=valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    # masked tail is exactly zero
    assert np.all(np.asarray(got)[0, 100:] == 0.0)


@pytest.mark.slow
def test_full_decode_pallas_vs_xla():
    """decode_latent with the fused kernel (forced on, interpret) matches
    the XLA path across all 4 stages × 3 dilations."""
    cfg_x = dataclasses.replace(SnacConfig.tiny(), use_pallas=False)
    cfg_p = dataclasses.replace(SnacConfig.tiny(), use_pallas=True)
    params = snac.init_snac_params(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(2)
    z = jnp.asarray(
        rng.normal(size=(2, 16, cfg_x.latent_dim)).astype(np.float32)
    )
    want = np.asarray(snac.decode_latent(params, cfg_x, z, noise_seed=3))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(snac.decode_latent(params, cfg_p, z, noise_seed=3))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_windowed_streaming_stays_bit_exact_with_pallas():
    """The lookahead property: a windowed decode's interior samples equal
    the batch decode bit-for-bit when BOTH run the fused path (position-
    wise deterministic kernel)."""
    cfg = dataclasses.replace(SnacConfig.tiny(), use_pallas=True)
    params = snac.init_snac_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    lat = 64
    z = jnp.asarray(
        rng.normal(size=(1, lat, cfg.latent_dim)).astype(np.float32)
    )
    w_lo, w_hi = 16, 48            # 32-latent window
    with pltpu.force_tpu_interpret_mode():
        full = np.asarray(
            snac.decode_latent(params, cfg, z, noise_seed=9)
        )
        win = np.asarray(snac.decode_latent(
            params, cfg, z[:, w_lo:w_hi], noise_seed=9, latent_offset=w_lo
        ))
    hop = cfg.hop_length
    # interior of the window, skipping the vocoder's receptive-field margin
    # (influence reach ±2.29 frames ≈ ±9.2 latent; use 12 for slack)
    margin = 12 * hop
    lo, hi = w_lo * hop + margin, w_hi * hop - margin
    np.testing.assert_array_equal(
        full[:, lo:hi], win[:, margin:(w_hi - w_lo) * hop - margin]
    )
