"""Streaming polyphase resampling as one static banded matmul.

The reference's config carries separate input/output sample rates
(``upstream:realtime_voice_conversion/config.py``; the WORLD synthesizer
runs at the output rate while the mic delivers the input rate).  The TPU
build processes everything at the internal ``dsp.sample_rate``; this module
moves audio between a client rate and the internal rate *inside* the fused
streaming step.

TPU-first formulation: rational L/M resampling is a windowed-sinc
(Kaiser) polyphase filter.  Gathers and per-sample loops serialize on TPU
(docs/PERF.md), but per chunk the (input-window -> output-chunk) map is a
FIXED banded linear operator — the phase pattern repeats exactly once per
chunk because ``chunk_out * M ≡ 0 (mod L)`` by construction.  So the whole
resampler is one precomputed [buf, chunk_out] matrix and each step is a
single MXU matmul; streaming state is just the last ``history`` input
samples.

Delay convention: the emitted stream is y[n] = ideal[n - delay_out], with
zero history at t<0.  For the *input-side* plan the delay is rounded up to
a whole frame hop so the delayed stream stays on the analysis frame grid —
that keeps streamed == offline exact (analysis is frame-positional and the
synthesis noise is frame-indexed).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


KAISER_BETA = 8.6          # ~ -90 dB stopband
HALF_WIDTH = 24            # kernel half-width in input samples
ROLLOFF = 0.9475           # passband edge as a fraction of Nyquist


@dataclasses.dataclass(frozen=True)
class ResamplePlan:
    """Static geometry of a fixed-chunk streaming resampler."""

    rate_in: int
    rate_out: int
    chunk_in: int            # input samples consumed per step
    chunk_out: int           # output samples emitted per step
    delay_out: int           # emitted[n] = ideal[n - delay_out]
    history: int             # carried input samples (left context)

    @property
    def identity(self) -> bool:
        return self.rate_in == self.rate_out


def make_plan(rate_in: int, rate_out: int, chunk_in: int,
              align_delay_to: int = 1) -> ResamplePlan:
    """Build the plan for fixed ``chunk_in``-sample steps.

    ``align_delay_to``: round the delay up to a multiple (the input-side
    resampler uses the frame hop so the pipeline sees a frame-aligned
    shift).  Requires chunk_in * L % M == 0 (integer output chunk) — the
    config layer guarantees it by aligning chunk_ms to both rates.
    """
    if rate_in == rate_out:
        return ResamplePlan(rate_in, rate_out, chunk_in, chunk_in, 0, 0)
    g = math.gcd(rate_in, rate_out)
    L, M = rate_out // g, rate_in // g
    if chunk_in * L % M:
        raise ValueError(
            f"chunk_in={chunk_in} not resamplable {rate_in}->{rate_out}: "
            f"chunk*L/M = {chunk_in * L / M} not integer")
    chunk_out = chunk_in * L // M
    d = -(-(HALF_WIDTH * L) // M)               # ceil(HW·L/M)
    delay_out = -(-d // align_delay_to) * align_delay_to
    history = HALF_WIDTH + (delay_out * M + L - 1) // L + 1
    return ResamplePlan(rate_in, rate_out, chunk_in, chunk_out, delay_out,
                        history)


def _kernel(t: np.ndarray, cutoff: float) -> np.ndarray:
    """Windowed-sinc interpolation kernel, unit passband gain.

    ``cutoff`` in (0, 1]: passband edge relative to the input Nyquist
    (``ROLLOFF`` when upsampling, ``ROLLOFF·L/M`` when downsampling)."""
    w = np.where(np.abs(t) < HALF_WIDTH,
                 np.i0(KAISER_BETA
                       * np.sqrt(np.maximum(0.0, 1 - (t / HALF_WIDTH) ** 2)))
                 / np.i0(KAISER_BETA), 0.0)
    return cutoff * np.sinc(cutoff * t) * w


@functools.lru_cache(maxsize=16)
def _matrix_np(plan: ResamplePlan) -> np.ndarray:
    """[history + chunk_in, chunk_out] banded operator for one step.

    Output column n (a sample ``n - delay_out`` of the ideal stream,
    relative to the current chunk's first output) reads input position
    p = (n - delay_out)·M/L relative to the chunk's first input sample,
    i.e. buffer row history + p."""
    g = math.gcd(plan.rate_in, plan.rate_out)
    L, M = plan.rate_out // g, plan.rate_in // g
    cutoff = ROLLOFF * min(1.0, L / M)
    rows = np.arange(plan.history + plan.chunk_in)[:, None]   # buffer index
    n = np.arange(plan.chunk_out)[None, :]
    p = (n - plan.delay_out) * (M / L)          # input pos rel. chunk start
    return _kernel(p - (rows - plan.history), cutoff).astype(np.float32)


def init_carry(plan: ResamplePlan, dtype=jnp.float32) -> jnp.ndarray | None:
    return None if plan.identity else jnp.zeros((plan.history,), dtype)


def resample_chunk(carry: jnp.ndarray | None, chunk: jnp.ndarray,
                   plan: ResamplePlan
                   ) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """One streaming step: [chunk_in] -> [chunk_out], carry [history]."""
    if plan.identity:
        return chunk, carry
    buf = jnp.concatenate([carry, chunk])
    y = jnp.matmul(buf, jnp.asarray(_matrix_np(plan)),
                   precision=jax.lax.Precision.HIGH)
    return y, buf[-plan.history:]


def resample_signal(x: jnp.ndarray, plan: ResamplePlan) -> jnp.ndarray:
    """One-shot equivalent of the streaming resampler (zero history): the
    output is chunking-independent, so this pads x up to a chunk multiple,
    scans resample_chunk, and trims to floor(T·L/M) samples — bit-equal to
    the streamed concatenation on the original extent."""
    if plan.identity:
        return x
    T = x.shape[-1]
    g = math.gcd(plan.rate_in, plan.rate_out)
    T_out = T * (plan.rate_out // g) // (plan.rate_in // g)
    k = -(-T // plan.chunk_in)
    xp = jnp.pad(x, (0, k * plan.chunk_in - T))

    def step(carry, chunk):
        y, carry = resample_chunk(carry, chunk, plan)
        return carry, y

    _, ys = jax.lax.scan(step, init_carry(plan, x.dtype),
                         xp.reshape(k, plan.chunk_in))
    return ys.reshape(k * plan.chunk_out)[:T_out]
