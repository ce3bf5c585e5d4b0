"""Band aperiodicity estimation (JAX) — D4C-equivalent role.

WORLD's ``d4c.cpp`` (SURVEY.md §2b) estimates how much of each frequency
band is noise vs. harmonic.  TPU-first reformulation: band-filter each
analysis slice with static rfft masks, then measure normalized lag-domain
periodicity at the per-frame F0 lag (a dynamic gather, static shapes
otherwise):   ap_b = sqrt(1 - periodicity_b).

Matches ``golden.reference.band_aperiodicity`` allclose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from realtime_yukarin_tpu.config import DspConfig
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.framing import extract_centered_frames
from realtime_yukarin_tpu.ops import dft


def _ap_fft_size(cfg: DspConfig) -> int:
    n = 1
    while n < cfg.f0_frame_len:
        n *= 2
    return n


def band_aperiodicity(x: jnp.ndarray, f0: jnp.ndarray, num_frames: int,
                      cfg: DspConfig, center_offset: int = 0) -> jnp.ndarray:
    """[T], f0 [F] -> band aperiodicity [F, B] in (0, 1].

    FFT-free device formulation (matches the golden definition exactly):
    per-band periodicity = autocorrelation of the band-masked power
    spectrum at the F0 lag (Wiener-Khinchin) with the unbiased
    zero-padding correction — one DFT-matmul power spectrum plus a cosine
    contraction, no irfft and no per-frame gathers."""
    hop = cfg.hop
    FL = cfg.f0_frame_len
    B = cfg.num_ap_bands
    AP_N = _ap_fft_size(cfg)
    fs = float(cfg.sample_rate)

    frames = extract_centered_frames(x, num_frames, hop, FL, center_offset)
    pad = jnp.zeros(frames.shape[:-1] + (AP_N - FL,), frames.dtype)
    s = jnp.concatenate([frames, pad], axis=-1)
    P = dft.power_spectrum(s, AP_N)                           # [F, K]
    masks = jnp.asarray(prim.ap_band_masks(cfg.sample_rate, B, AP_N),
                        dtype=frames.dtype)                   # [B, K]
    w = jnp.asarray(dft.autocorr_weights(AP_N), frames.dtype)  # [K]

    lag = jnp.clip(jnp.round(fs / jnp.maximum(f0, 1.0)),
                   cfg.lag_min, cfg.lag_max)                  # [F] float
    K = P.shape[-1]
    k = jnp.arange(K, dtype=P.dtype)
    cosv = jnp.cos((2.0 * jnp.pi / AP_N) * lag[:, None] * k)  # [F, K]

    Pw = P * w                                                # [F, K]
    r_lag = jnp.einsum("fk,bk,fk->fb", Pw, masks, cosv,
                       precision=jax.lax.Precision.HIGHEST)
    r0 = jnp.einsum("fk,bk->fb", Pw, masks,
                    precision=jax.lax.Precision.HIGHEST)
    p = r_lag / (r0 + 1e-20) * FL / (FL - lag[:, None])
    ap = jnp.sqrt(jnp.clip(1.0 - p, 1e-6, 1.0))
    return jnp.where((f0 > 0)[:, None], ap, 1.0)


def expand_aperiodicity(ap: jnp.ndarray, cfg: DspConfig) -> jnp.ndarray:
    """[..., B] band values -> [..., K] per-bin values (linear in freq)."""
    Wm = jnp.asarray(prim.ap_expand_matrix(cfg.sample_rate, cfg.num_ap_bands,
                                           cfg.spec_bins), dtype=ap.dtype)
    return jnp.matmul(ap, Wm.T, precision=jax.lax.Precision.HIGHEST)
