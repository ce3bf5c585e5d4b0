"""Spectral envelope estimation (JAX) — CheapTrick-equivalent.

Role of WORLD's ``cheaptrick.cpp`` (SURVEY.md §2b), reformulated fixed-shape
(SURVEY.md §7 hard part (b)): instead of a pitch-adaptive *window length*
(dynamic shapes), a fixed Hann window feeds an f0-adaptive *linear-domain
rectangular smoothing* (full width = one harmonic spacing) followed by an
f0-adaptive cepstral sinc lifter.  Per-frame adaptivity is pure elementwise
math on [F, K] arrays, so XLA fuses the whole stage.

Matches ``golden.reference.spectral_envelope`` allclose.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from realtime_yukarin_tpu.config import DspConfig
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.framing import (extract_centered_frames, hann,
                                              rect_smooth_rows)


def power_spectrogram(x: jnp.ndarray, num_frames: int, cfg: DspConfig,
                      center_offset: int = 0) -> jnp.ndarray:
    """[T] -> |STFT|^2 [F, K], Hann window, frames centered at i*hop."""
    N = cfg.fft_size
    frames = extract_centered_frames(x, num_frames, cfg.hop, N,
                                     center_offset)
    return jnp.abs(jnp.fft.rfft(frames * hann(N)[None, :], axis=1)) ** 2


def envelope_from_power(P: jnp.ndarray, f0: jnp.ndarray, cfg: DspConfig
                        ) -> jnp.ndarray:
    """Power spectrogram [F, K] + f0 [F] -> power envelope [F, K]."""
    N = cfg.fft_size
    fs = float(cfg.sample_rate)
    f0_eff = jnp.where(f0 > 0, f0, prim.DEFAULT_F0)

    hw = jnp.maximum(f0_eff * N / (2.0 * fs), 0.5)
    P = rect_smooth_rows(P, hw)
    # relative per-frame floor: bounds the log dynamic range so float32
    # FFT noise in silent bins cannot blow up the log-domain envelope
    floor = jnp.maximum(
        jnp.max(P, axis=1, keepdims=True)
        * 10.0 ** (cfg.envelope_floor_db / 10.0), prim.POWER_FLOOR)
    L = jnp.log(jnp.maximum(P, floor))

    c = jnp.fft.irfft(L.astype(jnp.complex64), n=N, axis=1)   # real cepstrum
    t_q = jnp.asarray(np.minimum(np.arange(N), N - np.arange(N)) / fs,
                      dtype=L.dtype)
    lift = jnp.sinc(f0_eff[:, None] * t_q[None, :])
    L_env = jnp.fft.rfft(c * lift, axis=1).real
    return jnp.exp(L_env)


def spectral_envelope(x: jnp.ndarray, f0: jnp.ndarray, num_frames: int,
                      cfg: DspConfig, center_offset: int = 0) -> jnp.ndarray:
    return envelope_from_power(
        power_spectrogram(x, num_frames, cfg, center_offset), f0, cfg)
