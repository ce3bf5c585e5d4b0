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
from realtime_yukarin_tpu.dsp.framing import extract_centered_frames, hann
from realtime_yukarin_tpu.ops import dft


def power_spectrogram(x: jnp.ndarray, num_frames: int, cfg: DspConfig,
                      center_offset: int = 0) -> jnp.ndarray:
    """[T] -> |STFT|^2 [F, K], Hann window, frames centered at i*hop."""
    N = cfg.fft_size
    frames = extract_centered_frames(x, num_frames, cfg.hop, N,
                                     center_offset)
    # DFT-as-matmul: ~10x faster than XLA's TPU FFT at these sizes
    return dft.power_spectrum(frames * hann(N, frames.dtype), N)


def log_envelope_from_power(P: jnp.ndarray, f0: jnp.ndarray, cfg: DspConfig
                            ) -> jnp.ndarray:
    """Power spectrogram [F, K] + f0 [F] -> LOG power envelope [F, K].

    Both pitch-adaptive steps are quefrency sinc filters (4 MXU matmuls
    total, no gathers): (1) linear-domain smoothing with effective rect
    width f0 fills inter-harmonic valleys; (2) log-domain liftering
    removes residual harmonic ripple.

    The log-domain result is the primary output: the mel-cepstrum encode
    consumes it directly (dsp/mcep.py), so the streaming hot path never
    materializes exp(L) just to take log again (~7M transcendentals per
    128-stream step).
    """
    N = cfg.fft_size
    fs = float(cfg.sample_rate)
    f0_eff = jnp.where(f0 > 0, f0, prim.DEFAULT_F0)

    t_q = jnp.asarray(np.arange(N // 2 + 1) / fs, dtype=P.dtype)
    lift_half = jnp.sinc(f0_eff[:, None] * t_q[None, :])

    P = dft.quefrency_filter(P, lift_half, N)
    # relative per-frame floor: bounds the log dynamic range so float32
    # DFT noise in silent bins cannot blow up the log-domain envelope
    floor = jnp.maximum(
        jnp.max(P, axis=1, keepdims=True)
        * 10.0 ** (cfg.envelope_floor_db / 10.0), prim.POWER_FLOOR)
    L = jnp.log(jnp.maximum(P, floor))

    return dft.quefrency_filter(L, lift_half, N)


def envelope_from_power(P: jnp.ndarray, f0: jnp.ndarray, cfg: DspConfig
                        ) -> jnp.ndarray:
    """Power spectrogram [F, K] + f0 [F] -> power envelope [F, K]."""
    return jnp.exp(log_envelope_from_power(P, f0, cfg))


def spectral_envelope(x: jnp.ndarray, f0: jnp.ndarray, num_frames: int,
                      cfg: DspConfig, center_offset: int = 0) -> jnp.ndarray:
    return envelope_from_power(
        power_spectrogram(x, num_frames, cfg, center_offset), f0, cfg)
