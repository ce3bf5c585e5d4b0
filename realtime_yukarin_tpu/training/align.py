"""DTW time-alignment of paired source/target utterances (corpus prep).

The reference's stage-1 trainer (``Hiroshiba/yukarin``, SURVEY.md §2b)
learns from *time-aligned* mel-cepstrum pairs; its dataset prep aligns each
source/target utterance pair with dynamic time warping over mc features.

TPU-first re-design (instead of the usual branchy O(F^2) host loop):

* the cost matrix is one MXU matmul — squared euclidean distance
  ``C = |x|^2 + |y|^2 - 2 x @ y.T``;
* the DP uses the step set {(1,0), (1,1), (1,2)}: every source frame
  advances exactly one row, the target index advances 0/1/2 columns.  Each
  row then depends ONLY on the previous row, so one ``lax.scan`` iteration
  computes a whole row vectorized (no within-row recurrence, unlike the
  textbook {(1,0),(0,1),(1,1)} step set which serializes per cell);
* backtracking is a second (reverse) scan over the stored per-row choices.

The 0/1/2 step set bounds local target speed-up at 2x per frame — ample
for same-utterance speech pairs — and keeps every shape static under jit.
Batched alignment is ``jax.vmap(dtw_path)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.dsp.world import AcousticFeature

_BIG = jnp.float32(1e30)


def cost_matrix(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances [Fx, Fy] via an MXU matmul."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=-1, keepdims=True)           # [Fx, 1]
    yy = jnp.sum(y * y, axis=-1)[None, :]                 # [1, Fy]
    xy = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(xx + yy - 2.0 * xy, 0.0)


@jax.jit
def dtw_path(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Monotonic alignment path: for each source frame i, the aligned
    target frame index idx[i] (idx[0] = 0, idx[-1] = Fy-1, steps of 0/1/2).

    x: [Fx, M] source features; y: [Fy, M] target features.
    """
    C = cost_matrix(x, y)
    Fx, Fy = C.shape
    j = jnp.arange(Fy)

    # forward DP: row i cost given row i-1, choice in {0,1,2} columns back
    def fwd(prev, c_row):
        c0 = prev                                          # stay
        c1 = jnp.concatenate([jnp.full((1,), _BIG), prev[:-1]])
        c2 = jnp.concatenate([jnp.full((2,), _BIG), prev[:-2]])
        stacked = jnp.stack([c0, c1, c2])                  # [3, Fy]
        choice = jnp.argmin(stacked, axis=0)
        best = jnp.min(stacked, axis=0)
        return c_row + best, choice.astype(jnp.int32)

    first = jnp.where(j == 0, C[0], _BIG)                  # start pinned at (0,0)
    last, choices = jax.lax.scan(fwd, first, C[1:])        # choices: [Fx-1, Fy]

    # backtrack from (Fx-1, Fy-1)
    def back(jcur, choice_row):
        step = choice_row[jcur]
        return jcur - step, jcur

    j0, rev = jax.lax.scan(back, jnp.int32(Fy - 1), choices, reverse=True)
    return jnp.concatenate([j0[None], rev])                # [Fx]


@jax.jit
def warp_rows(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of ``values`` ([Fy, ...]) at ``idx`` ([Fx]) -> [Fx, ...]."""
    return jnp.take(values, idx, axis=0)


def align_pair(src_mc: jnp.ndarray, tgt: AcousticFeature) -> AcousticFeature:
    """Warp every target feature onto the source timeline, aligning on
    mel-cepstra (excluding the 0th/energy coefficient, as yukarin's prep
    does — energy differences shouldn't drive the time warp)."""
    idx = dtw_path(src_mc[:, 1:], tgt.mc[:, 1:])
    return AcousticFeature(
        f0=warp_rows(tgt.f0, idx),
        env=warp_rows(tgt.env, idx),
        ap=warp_rows(tgt.ap, idx),
        mc=warp_rows(tgt.mc, idx),
    )


batched_dtw_path = jax.jit(jax.vmap(dtw_path))
