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
    start0 = center_offset - frame_len // 2
    nblk = -(-frame_len // hop)            # hop-blocks covering one frame
    # samples needed: [start0, start0 + (F-1+nblk)*hop)
    need_end = start0 + (num_frames - 1 + nblk) * hop
    pad_left = max(0, -start0)
    pad_right = max(0, need_end - T)
    if pad_left or pad_right:
        cfgpad = [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)]
        x = jnp.pad(x, cfgpad)
    y = jax.lax.slice_in_dim(x, start0 + pad_left, need_end + pad_left,
                             axis=-1)
    # block trick: frame i = concat of hop-blocks i..i+nblk-1, so the whole
    # frame matrix is nblk static slices of the block-reshaped signal —
    # O(nblk) slices instead of O(num_frames) (or TPU-hostile gathers).
    blocks = y.reshape(y.shape[:-1] + (num_frames - 1 + nblk, hop))
    parts = [
        jax.lax.slice_in_dim(blocks, m, m + num_frames, axis=-2)
        for m in range(nblk)
    ]
    frames = jnp.concatenate(parts, axis=-1)      # [..., F, nblk*hop]
    return frames[..., :frame_len]


def lerp_rows(values: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Row-wise linear interpolation.

    values: [F, K] or [F, K, C] (C channels share the positions);
    pos: [F, H] fractional indices in [0, K-1] -> [F, H] / [F, H, C].

    TPU note: the obvious ``take_along_axis`` lowers to a lane-axis
    gather, which Mosaic serializes (~12 ms/step for the synthesis
    controls at 128 streams — the single hottest op in the pipeline).
    Element selection is instead one-hot 0/1-weight matmuls on the MXU at
    HIGHEST precision — bit-exact w.r.t. the gather (each output row sums
    exactly one f32 value plus exact zeros).  For K >= 32 the one-hot is
    two-level (groups of G=8, then an in-group pick): building the dense
    [F, H, K] one-hot was itself the hottest VPU work at 512 streams
    (~740M elements); the grouped form builds ~K/G + G instead of 2K
    weights per (f, h) and measured 2.7x faster end-to-end, still
    value-identical.  The ``hi`` neighbor weight is empty where
    ``lo == K-1``; there ``t == 0``, matching the clamped gather.
    """
    K = values.shape[1]
    squeeze = values.ndim == 2
    V = values[:, :, None] if squeeze else values
    pos = jnp.clip(pos, 0.0, K - 1.0)
    lo = jnp.floor(pos)
    t = (pos - lo).astype(V.dtype)
    hi_p = jax.lax.Precision.HIGHEST

    if K < 32:          # dense one-hot: grouping overhead not worth it
        k = jnp.arange(K, dtype=pos.dtype)
        dl = k[None, None, :] - lo[:, :, None]               # [F, H, K]
        Wlo = (dl == 0).astype(V.dtype)
        Whi = (dl == 1).astype(V.dtype)
        vlo = jnp.einsum("fhk,fkc->fhc", Wlo, V, precision=hi_p)
        vhi = jnp.einsum("fhk,fkc->fhc", Whi, V, precision=hi_p)
        out = vlo * (1.0 - t)[:, :, None] + vhi * t[:, :, None]
        return out[:, :, 0] if squeeze else out

    # Two-level selection: the [F, H, K] one-hot construction dominated
    # the synthesis-controls stage (~740M VPU elements at 512 streams).
    # Level 1 one-hots over Q = ceil(K/G) groups of G bins (an MXU matmul
    # picking each position's G+1-wide group); level 2 is a tiny [G+1]
    # lerp-weight contraction.  ~(2K)/(K/G + G) ~ 14x less elementwise
    # work, and the result sums the same two f32 products plus exact
    # zeros — value-identical to the dense path.
    F, C = V.shape[0], V.shape[2]
    H = pos.shape[1]
    G = 8
    Qn = (K - 1) // G + 1                    # q = lo//G fits [0, Qn)
    K_pad = G * (Qn - 1) + G + 1             # group q covers [G*q, G*q+G]
    Vp = jnp.pad(V, ((0, 0), (0, K_pad - K), (0, 0)))
    Vg = jnp.stack([jax.lax.slice_in_dim(Vp, g, g + G * (Qn - 1) + 1,
                                         stride=G, axis=1)
                    for g in range(G + 1)], axis=2)          # [F, Qn, G+1, C]
    q_idx = jnp.floor(lo / G)                                # exact: G = 2^3
    r = lo - G * q_idx                                       # in-group offset
    qs = jnp.arange(Qn, dtype=pos.dtype)
    Wq = (qs[None, None, :] == q_idx[:, :, None]).astype(V.dtype)
    picked = jnp.einsum("fhq,fqm->fhm", Wq,
                        Vg.reshape(F, Qn, (G + 1) * C),
                        precision=hi_p).reshape(F, H, G + 1, C)
    g_ar = jnp.arange(G + 1, dtype=pos.dtype)
    dg = g_ar[None, None, :, None] - r[:, :, None, None]     # [F, H, G+1, 1]
    # in-group picks as masked sums (one nonzero + exact zeros), then the
    # same mul/add sequence as the dense path — value-identical to it
    vlo = jnp.sum(jnp.where(dg == 0, picked, 0.0), axis=2)
    vhi = jnp.sum(jnp.where(dg == 1, picked, 0.0), axis=2)
    out = vlo * (1.0 - t)[:, :, None] + vhi * t[:, :, None]
    return out[:, :, 0] if squeeze else out


def median3(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """3-tap median filter along ``axis``, edge-replicated."""
    x = jnp.moveaxis(x, axis, -1)
    a = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    c = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    med = jnp.maximum(jnp.minimum(a, x),
                      jnp.minimum(jnp.maximum(a, x), c))
    return jnp.moveaxis(med, -1, axis)
