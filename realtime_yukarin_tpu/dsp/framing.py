"""Static-shape framing utilities (JAX).

The reference's time-indexed segment buffers (``upstream:realtime_voice_
conversion/stream/base_stream.py``, SURVEY.md §2a) become static shape
arithmetic here: frame i of a signal is always centered at ``i*hop`` and
out-of-range samples are zero — the same convention the golden reference
uses, so streamed and offline paths agree exactly on the interior.
"""

from __future__ import annotations

import jax
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
    uses center_offset to address interior frames of its rolling buffer.

    Implemented as static slices + stack (pure data movement XLA schedules
    well) — TPU gathers serialize through the scalar unit and were ~10x
    slower at these shapes."""
    T = x.shape[-1]
    starts = np.arange(num_frames) * hop + center_offset - frame_len // 2
    pad_left = int(max(0, -starts.min()))
    pad_right = int(max(0, starts.max() + frame_len - T))
    if pad_left or pad_right:
        cfgpad = [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)]
        x = jnp.pad(x, cfgpad)
    frames = [
        jax.lax.slice_in_dim(x, int(s0) + pad_left,
                             int(s0) + pad_left + frame_len, axis=-1)
        for s0 in starts
    ]
    return jnp.stack(frames, axis=-2)


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
