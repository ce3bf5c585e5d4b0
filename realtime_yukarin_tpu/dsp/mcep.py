"""Mel-cepstrum encode/decode (JAX) — SPTK mcep role as pure matmuls.

The reference pipeline codes the spectral envelope as a mel-cepstrum
(SURVEY.md §2b, yukarin's ``AcousticFeature.mc``) via SPTK's iterative
solver.  TPU-first: a warped-cosine basis fit — encode is one matmul with a
precomputed pseudo-inverse, decode is one matmul with the basis.  Both ride
the MXU directly (SURVEY.md §7 step 2).

Matches ``golden.reference.encode_mcep`` / ``decode_mcep`` allclose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import DspConfig
from realtime_yukarin_tpu.dsp import primitives as prim


def _bases(cfg: DspConfig, dtype):
    B, A = prim.mcep_basis(cfg.spec_bins, cfg.mcep_order, cfg.mcep_alpha)
    return jnp.asarray(B, dtype), jnp.asarray(A, dtype)


def encode_mcep(env: jnp.ndarray, cfg: DspConfig) -> jnp.ndarray:
    """[..., K] power envelope -> [..., M+1] mel-cepstrum."""
    logE = jnp.log(jnp.maximum(env, prim.POWER_FLOOR))
    return encode_mcep_from_log(logE, cfg)


def encode_mcep_from_log(logE: jnp.ndarray, cfg: DspConfig) -> jnp.ndarray:
    """[..., K] LOG power envelope -> [..., M+1] mel-cepstrum.

    max(logE, log floor) == log(max(env, floor)) exactly in real math, so
    feeding the analysis log-envelope here skips the exp/log round-trip.
    """
    import numpy as np
    _, A = _bases(cfg, logE.dtype)
    logE = jnp.maximum(logE, float(np.log(prim.POWER_FLOOR)))
    # bf16_3x keeps the fit within ~1e-4 abs of the float64 golden
    # (|logE| <= ~28, basis rows O(1)) — far inside the 5e-3 golden
    # tolerance, at half the cost of full fp32
    return jnp.matmul(logE, A.T, precision=jax.lax.Precision.HIGH)


def decode_mcep(mc: jnp.ndarray, cfg: DspConfig) -> jnp.ndarray:
    """[..., M+1] mel-cepstrum -> [..., K] smooth power envelope.

    bf16_3x: ~1e-4 abs error in the log envelope (vs the 2e-3 golden
    tolerance and the SR stage's own bf16 compute downstream)."""
    B, _ = _bases(cfg, mc.dtype)
    return jnp.exp(jnp.matmul(mc, B.T, precision=jax.lax.Precision.HIGH))
