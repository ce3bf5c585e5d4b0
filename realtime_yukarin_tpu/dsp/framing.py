"""Static-shape framing utilities (JAX).

The reference's time-indexed segment buffers (``upstream:realtime_voice_
conversion/stream/base_stream.py``, SURVEY.md §2a) become static shape
arithmetic here: frame i of a signal is always centered at ``i*hop`` and
out-of-range samples are zero — the same convention the golden reference
uses, so streamed and offline paths agree exactly on the interior.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from realtime_yukarin_tpu.dsp import primitives as prim


def hann(n: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(prim.hann(n), dtype=dtype)


def extract_centered_frames(x: jnp.ndarray, num_frames: int, hop: int,
                            frame_len: int, center_offset: int = 0
                            ) -> jnp.ndarray:
    """[..., T] -> [..., F, frame_len]; frame i is centered at
    center_offset + i*hop, zero-padded outside [0, T).  The streaming layer
    uses center_offset to address interior frames of its rolling buffer."""
    T = x.shape[-1]
    starts = (np.arange(num_frames) * hop + center_offset
              - frame_len // 2)
    idx = starts[:, None] + np.arange(frame_len)[None, :]      # [F, L] host
    valid = jnp.asarray((idx >= 0) & (idx < T))
    gathered = jnp.take(x, jnp.asarray(np.clip(idx, 0, T - 1)), axis=-1)
    return jnp.where(valid, gathered, 0.0)


def rect_smooth_rows(P: jnp.ndarray, half_width_bins: jnp.ndarray
                     ) -> jnp.ndarray:
    """Row-wise fractional rectangular smoothing via cumulative sums.

    P: [F, K]; half_width_bins: [F].  Mirrors golden ``_rect_smooth``.
    """
    F, K = P.shape
    C = jnp.concatenate([jnp.zeros((F, 1), P.dtype), jnp.cumsum(P, axis=1)],
                        axis=1)                                  # [F, K+1]
    k = jnp.arange(K, dtype=P.dtype)[None, :]
    hw = half_width_bins[:, None]
    lo = jnp.clip(k + 0.5 - hw, 0.0, float(K))
    hi = jnp.clip(k + 0.5 + hw, 0.0, float(K))

    def S(t):
        j = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, K - 1)
        frac = t - j.astype(P.dtype)
        return (jnp.take_along_axis(C, j, axis=1)
                + frac * jnp.take_along_axis(P, j, axis=1))

    return (S(hi) - S(lo)) / jnp.maximum(hi - lo, 1e-9)


def lerp_rows(values: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Row-wise linear interpolation.

    values: [F, K]; pos: [F, H] fractional indices in [0, K-1] ->
    returns [F, H].
    """
    K = values.shape[-1]
    pos = jnp.clip(pos, 0.0, K - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, K - 1)
    t = pos - lo.astype(values.dtype)
    vlo = jnp.take_along_axis(values, lo, axis=-1)
    vhi = jnp.take_along_axis(values, hi, axis=-1)
    return vlo * (1.0 - t) + vhi * t


def median3(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """3-tap median filter along ``axis``, edge-replicated."""
    x = jnp.moveaxis(x, axis, -1)
    a = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    c = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    med = jnp.maximum(jnp.minimum(a, x),
                      jnp.minimum(jnp.maximum(a, x), c))
    return jnp.moveaxis(med, -1, axis)
