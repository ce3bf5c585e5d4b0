"""Host-facing streaming voice changer — EncodeStream/ConvertStream/
DecodeStream in one object.

The reference splits streaming into three stream classes + three worker
processes (SURVEY.md §2a).  Here a single host object owns the on-device
carry and feeds the fused ``streaming_step``; a :class:`SegmentBuffer`
re-chunks arbitrary-size audio callbacks onto the static chunk grid.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.streaming.pipeline import init_stream, streaming_step
from realtime_yukarin_tpu.streaming.segment import SegmentBuffer


class VoiceChangerStream:
    """Push PCM in with ``add``; pull converted PCM with ``process``.

    Output is delayed by ``latency_samples`` relative to input (the halo /
    lookahead budget — the reference's extra_time, SURVEY.md §2a).  Call
    ``flush()`` at end of input to drain the tail.
    """

    def __init__(self, params: dict, cfg: Config, use_sr: bool = True,
                 use_neural_vocoder: bool = False, seed: int = 0,
                 key: jax.Array | None = None,
                 vocoder_mode: str | None = None):
        from realtime_yukarin_tpu.config import resolve_vocoder_mode
        self._params = params
        self._cfg = cfg
        self._use_sr = use_sr
        self._mode = resolve_vocoder_mode(use_neural_vocoder, vocoder_mode)
        self._key = key if key is not None else jax.random.key(seed)
        self._carry, self._geo = init_stream(params, cfg, use_sr,
                                             vocoder_mode=self._mode)
        self._in = SegmentBuffer()
        self._in_pos = 0          # next input sample to consume
        self._written = 0         # total input samples added

    @property
    def chunk_samples(self) -> int:
        """Input chunk size (samples at cfg.dsp.in_rate)."""
        return self._geo.chunk_in_samples

    @property
    def chunk_out_samples(self) -> int:
        """Output chunk size (samples at cfg.dsp.out_rate)."""
        return self._geo.chunk_out_samples

    @property
    def latency_samples(self) -> int:
        """End-to-end delay in OUTPUT-rate samples."""
        return self._geo.latency_out_samples(self._cfg.dsp)

    def add(self, samples: np.ndarray) -> None:
        """Append input PCM at in_rate (any length)."""
        self._in.add(self._written, np.asarray(samples, np.float32))
        self._written += len(samples)

    def process(self) -> np.ndarray:
        """Consume every complete chunk available; return converted PCM at
        out_rate (possibly empty).  Output sample t corresponds to input
        sample (t - latency_samples) rescaled between the rates."""
        S = self._geo.chunk_in_samples
        out = []
        while self._in_pos + S <= self._written:
            chunk = self._in.fetch(self._in_pos, S)
            self._in.remove(self._in_pos + S)
            self._in_pos += S
            y, self._carry = streaming_step(
                self._params, self._carry, jnp.asarray(chunk), self._key,
                self._cfg, self._use_sr, vocoder_mode=self._mode)
            out.append(np.asarray(y))
        if not out:
            return np.zeros(0, np.float32)
        return np.concatenate(out)

    def flush(self) -> np.ndarray:
        """Feed zeros to drain the algorithmic latency."""
        So = self._geo.chunk_out_samples
        n_chunks = -(-self.latency_samples // So)
        self.add(np.zeros(n_chunks * self._geo.chunk_in_samples, np.float32))
        return self.process()
