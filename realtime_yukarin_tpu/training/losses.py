"""Training losses.

The reference's training lives in the dependency repos (SURVEY.md §2b):
yukarin trains stage 1 with an L1/L2 mc objective, become-yukarin trains
stage 2 adversarially on spectrogram patches.  Here: plain regression
losses for both stages plus a multi-resolution STFT loss for the neural
vocoder (standard practice for DDSP-style vocoders, PAPERS.md)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.dsp.framing import hann


def mc_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def log_env_l2(pred_env: jnp.ndarray, target_env: jnp.ndarray
               ) -> jnp.ndarray:
    lp = jnp.log(jnp.maximum(pred_env, 1e-12))
    lt = jnp.log(jnp.maximum(target_env, 1e-12))
    return jnp.mean((lp - lt) ** 2)


def f0_l2(pred_f0: jnp.ndarray, target_f0: jnp.ndarray) -> jnp.ndarray:
    both = (pred_f0 > 0) & (target_f0 > 0)
    d = jnp.log(jnp.maximum(pred_f0, 1.0)) - jnp.log(
        jnp.maximum(target_f0, 1.0))
    return jnp.sum(jnp.where(both, d ** 2, 0.0)) / jnp.maximum(
        jnp.sum(both), 1)


def _stft_mag(x: jnp.ndarray, fft: int, hop: int) -> jnp.ndarray:
    T = x.shape[-1]
    n = max((T - fft) // hop + 1, 1)
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(fft)[None, :]
    frames = x[..., idx] * hann(fft, x.dtype)
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def multi_resolution_stft(pred: jnp.ndarray, target: jnp.ndarray,
                          ffts=(512, 1024, 2048)) -> jnp.ndarray:
    """Spectral-convergence + log-magnitude L1, summed over resolutions.

    MAGNITUDE-only by design (ADVICE r4): the renderer's phase track is
    reset-relative (dsp.synthesis.integrate_phase zeroes it at every
    voicing onset), while a recording's pulse timing is arbitrary — a
    time-domain or complex-STFT term against real audio would mostly
    penalize that unlearnable alignment offset, not teach phase.  What
    this objective trains is transient/inter-harmonic magnitude
    structure; the wave decoder's phase-coherence CAPABILITY is gated
    separately with phase-aligned time-domain targets
    (tests/test_training.py::test_wave_decoder_learns_what_dsp_cannot,
    ::test_wave_decoder_fractional_track_coherence)."""
    total = 0.0
    for fft in ffts:
        hop = fft // 4
        mp = _stft_mag(pred, fft, hop)
        mt = _stft_mag(target, fft, hop)
        sc = jnp.linalg.norm(mp - mt) / (jnp.linalg.norm(mt) + 1e-6)
        lm = jnp.mean(jnp.abs(jnp.log(mp + 1e-6) - jnp.log(mt + 1e-6)))
        total = total + sc + lm
    return total / len(ffts)
