"""Pallas kernel parity tests (interpret mode on CPU; real on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.ops.pallas_synth import (harmonic_bank,
                                                   harmonic_bank_xla)


def test_harmonic_bank_matches_xla_interpret():
    rng = np.random.default_rng(0)
    R, H, hop = 12, 64, 120
    amps_l = jnp.asarray(rng.uniform(0, 0.1, (R, H)), jnp.float32)
    amps_r = jnp.asarray(rng.uniform(0, 0.1, (R, H)), jnp.float32)
    phi = jnp.asarray(np.cumsum(rng.uniform(0.02, 0.2, (R, hop)), axis=1),
                      jnp.float32)
    frac = jnp.asarray(np.tile((np.arange(hop) + 1.0) / hop, (R, 1)),
                       jnp.float32)
    ref = np.asarray(harmonic_bank_xla(amps_l, amps_r, phi, frac))
    out = np.asarray(harmonic_bank(amps_l, amps_r, phi, frac,
                                   interpret=True))
    scale = np.abs(ref).max() + 1e-9
    # Chebyshev recurrence error grows ~linearly in H; fp32 @ H=64 ~ 1e-5
    np.testing.assert_allclose(out / scale, ref / scale, rtol=0, atol=1e-3)


def test_harmonic_bank_gradient_matches_xla():
    """Training differentiates through the kernel (custom VJP): gradients
    must match the einsum reference for every input."""
    rng = np.random.default_rng(2)
    R, H, hop = 4, 16, 64
    args = (
        jnp.asarray(rng.uniform(0, 0.1, (R, H)), jnp.float32),
        jnp.asarray(rng.uniform(0, 0.1, (R, H)), jnp.float32),
        jnp.asarray(np.cumsum(rng.uniform(0.02, 0.2, (R, hop)), 1),
                    jnp.float32),
        jnp.asarray(np.tile((np.arange(hop) + 1.0) / hop, (R, 1)),
                    jnp.float32),
    )

    def loss_pl(*a):
        return jnp.sum(jnp.sin(harmonic_bank(*a, interpret=True)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(harmonic_bank_xla(*a)))

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-4)


def test_harmonic_bank_padding_edges():
    """Non-multiple-of-8 rows and hop<128 must round-trip the padding."""
    rng = np.random.default_rng(1)
    R, H, hop = 5, 16, 100
    amps = jnp.asarray(rng.uniform(0, 0.1, (R, H)), jnp.float32)
    phi = jnp.asarray(rng.uniform(0, 3, (R, hop)), jnp.float32)
    frac = jnp.full((R, hop), 0.5, jnp.float32)
    ref = np.asarray(harmonic_bank_xla(amps, amps, phi, frac))
    out = np.asarray(harmonic_bank(amps, amps, phi, frac, interpret=True))
    assert out.shape == (R, hop)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)
