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

import functools

import jax.numpy as jnp
import numpy as np

from realtime_yukarin_tpu.config import DspConfig
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.framing import extract_centered_frames, hann
from realtime_yukarin_tpu.ops import dft


def power_spectrogram(x: jnp.ndarray, num_frames: int, cfg: DspConfig,
                      center_offset: int = 0) -> jnp.ndarray:
    """[T] -> |STFT|^2 [F, K], Hann window, frames centered at i*hop.

    On TPU the window + DFT + |.|^2 run as one fused Pallas kernel
    (ops/pallas_analysis.py); elsewhere as DFT matmuls (~10x faster than
    XLA's TPU FFT at these sizes either way).  NOTE for callers inside
    one jit program: identical XLA subgraphs CSE, identical pallas_calls
    may NOT — compute P once and pass it down (analyze_given_f0 /
    voicing_revision take an explicit ``P=``) instead of relying on CSE.
    """
    from realtime_yukarin_tpu.ops import pallas_analysis as pa
    N = cfg.fft_size
    frames = extract_centered_frames(x, num_frames, cfg.hop, N,
                                     center_offset)
    # f32 conditioning (exact no-op in the mathematical spec, so the
    # golden reference does not mirror it): a DC rail inflates the DFT
    # matmuls' ABSOLUTE rounding error at every bin (error scales with
    # the row's largest value), which under +0.1 DC visibly perturbed
    # the envelope.  Subtracting the frame mean only moves windowed
    # bins 0/1 — zeroed below regardless.
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if pa.use_pallas():
        P = pa.power_spectrum_fused(frames, N)
    else:
        P = dft.power_spectrum(frames * hann(N, frames.dtype), N)
    # Exact DC rejection: the periodic Hann window is the sum of three
    # complex exponentials at bins {-1, 0, +1}, so a constant (DC) input
    # component lands EXACTLY in bins 0 and 1 of the windowed spectrum
    # and nowhere else — zeroing those two bins makes every downstream
    # stage (envelope, mc, aperiodicity, F0 refinement, voicing
    # evidence, synthesis controls) invariant to input DC offset (cheap
    # ADCs sit a few percent off zero; VERDICT r4 missing #1).  Voice
    # content starts at f0_floor = 71 Hz = bin 3; bins 0-1 (< 24 Hz/bin
    # * 2) carry rumble, not speech.
    return P * jnp.asarray(
        np.arange(N // 2 + 1) >= 2, P.dtype)[None, :]


@functools.lru_cache(maxsize=None)
def _folded_mcep_basis(n: int, spec_bins: int, order: int,
                       alpha: float) -> np.ndarray:
    """[Q, M+1] float64: inverse-cepstrum basis folded into the mcep fit.

    mc = (lifted half-cepstrum) @ (D @ A.T): both factors are constants,
    so the analysis hot path projects straight from the [.., Q] cepstrum
    to the [.., M+1] mel-cepstrum instead of reconstructing the full
    [.., K] log envelope first and then fitting it (one [K, K]-sized
    matmul fewer per step)."""
    assert spec_bins == n // 2 + 1, (spec_bins, n)
    D = dft.cepstrum_inverse_basis(n)                   # [Q, K]
    _, A = prim.mcep_basis(spec_bins, order, alpha)     # [M+1, K]
    return D @ A.T                                      # [Q, M+1]


def _lifted_half_cepstrum(P: jnp.ndarray, f0: jnp.ndarray, cfg: DspConfig
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared core of both envelope outputs: pitch-adaptive linear-domain
    smoothing, per-frame relative floor, log, cepstrum + lifter.

    Returns (c [F, Q] lifted half-cepstrum of the log envelope, lift_half).
    Both pitch-adaptive steps are quefrency sinc filters (MXU matmuls, no
    gathers): (1) linear-domain smoothing with effective rect width f0
    fills inter-harmonic valleys; (2) log-domain liftering removes
    residual harmonic ripple."""
    from realtime_yukarin_tpu.ops import pallas_analysis as pa
    N = cfg.fft_size
    fs = float(cfg.sample_rate)
    f0_eff = jnp.where(f0 > 0, f0, prim.DEFAULT_F0)

    t_q = jnp.asarray(np.arange(N // 2 + 1) / fs, dtype=P.dtype)
    lift_half = jnp.sinc(f0_eff[:, None] * t_q[None, :])

    if pa.use_pallas():
        # the whole quefrency chain as one fused kernel on TPU
        return pa.envelope_cepstrum_fused(P, lift_half, N,
                                          cfg.envelope_floor_db), lift_half

    P = dft.quefrency_filter(P, lift_half, N)
    # relative per-frame floor: bounds the log dynamic range so float32
    # DFT noise in silent bins cannot blow up the log-domain envelope
    floor = jnp.maximum(
        jnp.max(P, axis=1, keepdims=True)
        * 10.0 ** (cfg.envelope_floor_db / 10.0), prim.POWER_FLOOR)
    L = jnp.log(jnp.maximum(P, floor))

    C = jnp.asarray(dft.cepstrum_basis(N), L.dtype)
    return jnp.matmul(L, C, precision=dft.DFT_PRECISION) * lift_half, \
        lift_half


def log_envelope_from_power(P: jnp.ndarray, f0: jnp.ndarray, cfg: DspConfig
                            ) -> jnp.ndarray:
    """Power spectrogram [F, K] + f0 [F] -> LOG power envelope [F, K].

    The log-domain result is the primary output: the mel-cepstrum encode
    consumes it directly (dsp/mcep.py), so the streaming hot path never
    materializes exp(L) just to take log again (~7M transcendentals per
    128-stream step).
    """
    c, _ = _lifted_half_cepstrum(P, f0, cfg)
    D = jnp.asarray(dft.cepstrum_inverse_basis(cfg.fft_size), c.dtype)
    return jnp.matmul(c, D, precision=dft.DFT_PRECISION)


def log_envelope_and_mcep(P: jnp.ndarray, f0: jnp.ndarray, cfg: DspConfig
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(LOG power envelope [F, K], mel-cepstrum [F, M+1]) in one pass.

    Both project from the shared lifted half-cepstrum; mc uses the folded
    basis (:func:`_folded_mcep_basis`), so when only mc is consumed — the
    streaming step, where conversion runs on mel-cepstra — XLA DCEs the
    full [.., K] envelope reconstruction entirely.  No floor sits between
    the lifter and the mcep fit: the log spectrum is floored *before*
    liftering, and the log-domain lifter is frequency-domain smoothing
    with an (almost entirely) positive rect kernel, so the envelope
    cannot meaningfully undershoot that floor.  Matches
    ``golden.reference.analyze``'s mc exactly (same math, float64)."""
    N = cfg.fft_size
    c, _ = _lifted_half_cepstrum(P, f0, cfg)
    D = jnp.asarray(dft.cepstrum_inverse_basis(N), c.dtype)
    E = jnp.asarray(_folded_mcep_basis(N, cfg.spec_bins, cfg.mcep_order,
                                       cfg.mcep_alpha), c.dtype)
    L_env = jnp.matmul(c, D, precision=dft.DFT_PRECISION)
    mc = jnp.matmul(c, E, precision=dft.DFT_PRECISION)
    return L_env, mc


def envelope_from_power(P: jnp.ndarray, f0: jnp.ndarray, cfg: DspConfig
                        ) -> jnp.ndarray:
    """Power spectrogram [F, K] + f0 [F] -> power envelope [F, K]."""
    return jnp.exp(log_envelope_from_power(P, f0, cfg))


def spectral_envelope(x: jnp.ndarray, f0: jnp.ndarray, num_frames: int,
                      cfg: DspConfig, center_offset: int = 0) -> jnp.ndarray:
    return envelope_from_power(
        power_spectrogram(x, num_frames, cfg, center_offset), f0, cfg)
