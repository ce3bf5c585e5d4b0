"""Evaluation metrics for voice conversion quality.

The reference has no quantitative eval (SURVEY.md §4 — check.py + human
listening).  Standard VC metrics supplied here instead:

* **MCD** (mel-cepstral distortion, dB) — the de-facto yukarin-family
  quality number: 10*sqrt(2)/ln10 * ||mc_pred[1:] - mc_tgt[1:]||_2 per
  frame, averaged.
* voiced-frame **log-F0 RMSE** and **V/UV error rate**.

All jit-able, frame-major [..., F, M+1] / [..., F] shapes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_MCD_CONST = 10.0 * math.sqrt(2.0) / math.log(10.0)


@jax.jit
def mcd_db(mc_pred: jnp.ndarray, mc_tgt: jnp.ndarray) -> jnp.ndarray:
    """Mel-cepstral distortion in dB (0th/energy coefficient excluded)."""
    d = mc_pred[..., 1:] - mc_tgt[..., 1:]
    per_frame = jnp.sqrt(jnp.sum(d * d, axis=-1))
    return _MCD_CONST * jnp.mean(per_frame)


@jax.jit
def f0_metrics(f0_pred: jnp.ndarray, f0_tgt: jnp.ndarray) -> dict:
    """log-F0 RMSE over frames voiced in both + V/UV disagreement rate."""
    vp, vt = f0_pred > 0, f0_tgt > 0
    both = vp & vt
    d = jnp.log(jnp.maximum(f0_pred, 1.0)) - jnp.log(
        jnp.maximum(f0_tgt, 1.0))
    rmse = jnp.sqrt(jnp.sum(jnp.where(both, d * d, 0.0))
                    / jnp.maximum(jnp.sum(both), 1))
    vuv_err = jnp.mean((vp != vt).astype(jnp.float32))
    return {"logf0_rmse": rmse, "vuv_error": vuv_err}
