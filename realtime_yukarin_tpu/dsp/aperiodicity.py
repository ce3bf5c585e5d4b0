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


def _ap_fft_size(cfg: DspConfig) -> int:
    n = 1
    while n < cfg.f0_frame_len:
        n *= 2
    return n


def band_aperiodicity(x: jnp.ndarray, f0: jnp.ndarray, num_frames: int,
                      cfg: DspConfig, center_offset: int = 0) -> jnp.ndarray:
    """[T], f0 [F] -> band aperiodicity [F, B] in (0, 1]."""
    hop, W = cfg.hop, cfg.f0_window
    FL = cfg.f0_frame_len
    B = cfg.num_ap_bands
    AP_N = _ap_fft_size(cfg)
    fs = float(cfg.sample_rate)

    frames = extract_centered_frames(x, num_frames, hop, FL, center_offset)
    s = jnp.zeros((num_frames, AP_N), frames.dtype).at[:, :FL].set(frames)
    S = jnp.fft.rfft(s, axis=1)                               # [F, AP_N/2+1]
    masks = jnp.asarray(prim.ap_band_masks(cfg.sample_rate, B, AP_N),
                        dtype=frames.dtype)                   # [B, bins]
    sb = jnp.fft.irfft(S[:, None, :] * masks[None, :, :], n=AP_N,
                       axis=2)                                # [F, B, AP_N]

    lag = jnp.clip(jnp.round(fs / jnp.maximum(f0, 1.0)),
                   cfg.lag_min, cfg.lag_max).astype(jnp.int32)  # [F]
    win_idx = jnp.arange(W)[None, :]                          # [1, W]
    head = sb[:, :, :W]                                       # [F, B, W]
    shift_idx = (lag[:, None] + win_idx)[:, None, :]          # [F, 1, W]
    shifted = jnp.take_along_axis(
        sb, jnp.broadcast_to(shift_idx, (num_frames, B, W)), axis=2)

    num = jnp.sum(head * shifted, axis=2)
    e1 = jnp.sum(head * head, axis=2)
    e2 = jnp.sum(shifted * shifted, axis=2)
    p = num / jnp.sqrt(e1 * e2 + 1e-20)
    ap = jnp.sqrt(jnp.clip(1.0 - p, 1e-6, 1.0))
    return jnp.where((f0 > 0)[:, None], ap, 1.0)


def expand_aperiodicity(ap: jnp.ndarray, cfg: DspConfig) -> jnp.ndarray:
    """[..., B] band values -> [..., K] per-bin values (linear in freq)."""
    Wm = jnp.asarray(prim.ap_expand_matrix(cfg.sample_rate, cfg.num_ap_bands,
                                           cfg.spec_bins), dtype=ap.dtype)
    return jnp.matmul(ap, Wm.T, precision=jax.lax.Precision.HIGHEST)
