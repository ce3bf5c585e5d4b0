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


# ---------------------------------------------------------------------------
# Fused analysis front-end (ops/pallas_analysis.py)
# ---------------------------------------------------------------------------

def test_power_spectrum_fused_matches_xla_interpret():
    from realtime_yukarin_tpu.ops.pallas_analysis import (
        power_spectrum_fused, power_spectrum_xla)
    rng = np.random.default_rng(1)
    n = 1022
    frames = jnp.asarray(rng.standard_normal((40, n)) * 0.3, jnp.float32)
    ref = np.asarray(power_spectrum_xla(frames, n))
    out = np.asarray(power_spectrum_fused(frames, n, interpret=True))
    scale = ref.max() + 1e-12
    # the kernel's in-kernel bf16_3x emulation rounds through bf16 even in
    # interpret mode, while the CPU XLA reference runs full f32 — the
    # ~1e-5 rel-to-peak difference IS the bf16_3x error (matches the
    # on-device kernel-vs-XLA measurement of 1.8e-5)
    np.testing.assert_allclose(out / scale, ref / scale, rtol=0, atol=1e-4)


def test_power_spectrum_fused_vmap_flattens():
    """The custom_vmap rule must produce the same values as per-row calls
    (batched serving relies on it lowering to ONE flattened kernel)."""
    from realtime_yukarin_tpu.ops.pallas_analysis import (
        power_spectrum_fused, power_spectrum_xla)
    rng = np.random.default_rng(2)
    n = 1022
    x = jnp.asarray(rng.standard_normal((3, 7, n)) * 0.3, jnp.float32)
    out = jax.vmap(lambda f: power_spectrum_fused(f, n, interpret=True))(x)
    ref = np.asarray(jax.vmap(lambda f: power_spectrum_xla(f, n))(x))
    scale = ref.max() + 1e-12
    np.testing.assert_allclose(np.asarray(out) / scale, ref / scale,
                               rtol=0, atol=1e-4)
    # and the rule must agree exactly with the unbatched kernel
    flat = power_spectrum_fused(x.reshape(-1, n), n, interpret=True)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1, n // 2 + 1),
                                  np.asarray(flat))


def test_envelope_cepstrum_fused_matches_xla_interpret(dsp_cfg=None):
    from realtime_yukarin_tpu.config import DspConfig
    from realtime_yukarin_tpu.ops.pallas_analysis import (
        envelope_cepstrum_fused, envelope_cepstrum_xla)
    cfg = DspConfig()
    n = cfg.fft_size
    K = n // 2 + 1
    rng = np.random.default_rng(3)
    P = jnp.asarray(rng.uniform(0, 1, (24, K)) ** 2 * 1e-2, jnp.float32)
    f0 = rng.uniform(80, 300, 24)
    t_q = np.arange(K) / cfg.sample_rate
    lift = jnp.asarray(np.sinc(f0[:, None] * t_q[None, :]), jnp.float32)
    ref = np.asarray(envelope_cepstrum_xla(P, lift, n,
                                           cfg.envelope_floor_db))
    out = np.asarray(envelope_cepstrum_fused(P, lift, n,
                                             cfg.envelope_floor_db,
                                             interpret=True))
    scale = np.abs(ref).max() + 1e-12
    np.testing.assert_allclose(out / scale, ref / scale, rtol=0, atol=1e-4)
