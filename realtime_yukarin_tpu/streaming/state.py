"""Streaming state & geometry — the reference's L4 stream layer reborn.

SURVEY.md §2a: the reference keeps time-indexed segment buffers per stage
(``BaseStream.add/process/remove``) plus hidden C++ synthesizer state.
TPU-native redesign: ONE rolling wave buffer + the synthesizer carry +
a frame counter, all living on-device as a donated pytree, with every
halo (``extra_time``) turned into static shape arithmetic.

Geometry (all static, derived from Config):

  Fc     chunk frames                 (e.g. 0.1 s -> 20 frames)
  mctx   model halo frames            (stage1 + stage2 [+ vocoder] + 1 for
                                       the f0 median / edge effects; the
                                       synthesis one-frame lookahead is
                                       already inside this halo)
  AH     analysis half-window samples (max of fft and f0 windows)
  ah     ceil(AH / hop)
  D      output delay in frames:      mctx + ah
  Fn     analysis frames per step:    Fc + 2*mctx + 1
  L_buf  wave buffer samples:         (Fc + 2*mctx + ah)*hop + AH

Step k consumes input chunk k (samples [k, k+1)*Fc*hop) and emits output
frames [k*Fc - D, (k+1)*Fc - D): a constant algorithmic latency of D frames,
after which streamed output equals offline output exactly on the interior
(tested).  Analysis frame 0 of a step is centered AH samples into the
buffer, so its window touches exactly the buffer start.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.struct
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.synthesis import SynthCarry


@dataclasses.dataclass(frozen=True)
class StreamGeometry:
    chunk_frames: int
    chunk_samples: int
    model_ctx: int
    analysis_half: int
    delay_frames: int
    analysis_frames: int
    buf_samples: int
    buf_frame0_offset: int   # sample offset of analysis frame 0's center

    @classmethod
    def from_config(cls, cfg: Config, use_sr: bool = True,
                    use_neural_vocoder: bool = False) -> "StreamGeometry":
        dsp = cfg.dsp
        hop = dsp.hop
        Fc = cfg.streaming.chunk_frames(dsp)
        mctx = cfg.acoustic.context_frames + 1     # +1: f0 median3 edge
        if use_sr:
            mctx += cfg.super_resolution.context_frames
        if use_neural_vocoder:
            mctx += cfg.vocoder_nn.context_frames
        AH = max(dsp.fft_size // 2, (dsp.f0_frame_len + 1) // 2)
        ah_frames = -(-AH // hop)                   # ceil
        D = mctx + ah_frames
        Fn = Fc + 2 * mctx + 1
        L_buf = (Fc + 2 * mctx + ah_frames) * hop + AH
        return cls(chunk_frames=Fc, chunk_samples=Fc * hop, model_ctx=mctx,
                   analysis_half=AH, delay_frames=D, analysis_frames=Fn,
                   buf_samples=L_buf, buf_frame0_offset=AH)

    def latency_samples(self, hop: int) -> int:
        return self.delay_frames * hop

    @property
    def cache_frames(self) -> int:
        """Leading analysis frames reused from the previous step (their
        windows and medians were already final then): Fn - Fc - 1."""
        return self.analysis_frames - self.chunk_frames - 1

    @property
    def fresh_frames(self) -> int:
        """Frames analyzed per step: the Fc new finals + the window-edge
        frame whose median is still provisional (re-analyzed next step)."""
        return self.chunk_frames + 1


class StreamCarry(flax.struct.PyTreeNode):
    """Donated on-device streaming state (BASELINE: carry 'lives on-device
    across invocations').

    The feature caches hold the leading ``cache_frames`` analysis frames of
    the next step's window — analysis is frame-local, so a frame analyzed
    when its window was complete never changes.  This cuts per-step
    analysis from Fn (=Fc+2*mctx+1) frames to Fc+1 (2.6x less front-end
    work).  ``f0_raw_prev`` is the pre-median F0 of the cache's last frame
    (the 3-tap median needs that neighbor for the first fresh frame)."""

    wave_buf: jnp.ndarray      # [buf_samples] rolling input window
    synth: SynthCarry          # synthesizer phase + OLA tail
    frame_pos: jnp.ndarray     # [] int32: global index of next output frame
    f0_cache: jnp.ndarray      # [C] final median F0 per cached frame
    mc_cache: jnp.ndarray      # [C, M+1] mel-cepstra of cached frames
    ap_cache: jnp.ndarray      # [C, B] band aperiodicity of cached frames
    f0_raw_prev: jnp.ndarray   # [] raw F0 of the last cached frame

    @classmethod
    def init(cls, cfg: Config, geo: StreamGeometry, dtype=jnp.float32
             ) -> "StreamCarry":
        f0_sil, mc_sil, ap_sil = _silence_features(cfg, geo, jnp.dtype(dtype))
        return cls(
            wave_buf=jnp.zeros((geo.buf_samples,), dtype),
            synth=SynthCarry.zeros(cfg.dsp, dtype),
            frame_pos=jnp.asarray(-geo.delay_frames, jnp.int32),
            f0_cache=jnp.asarray(f0_sil, dtype),
            mc_cache=jnp.asarray(mc_sil, dtype),
            ap_cache=jnp.asarray(ap_sil, dtype),
            f0_raw_prev=jnp.zeros((), dtype),
        )


@functools.lru_cache(maxsize=8)
def _silence_features(cfg: Config, geo: StreamGeometry, dtype):
    """Analysis of silence for the init caches — exactly what a full halo
    recompute over the initial zero buffer would produce for the cacheable
    (pre-signal) frames.  Memoized as host numpy: stream resets (serving
    drop/rejoin) happen under the device lock and must not re-dispatch the
    whole analysis chain per connection."""
    import numpy as np
    from realtime_yukarin_tpu.dsp.world import analyze
    silence = analyze(jnp.zeros((geo.buf_samples,), dtype), geo.cache_frames,
                      cfg.dsp, center_offset=geo.buf_frame0_offset)
    return (np.asarray(silence.f0), np.asarray(silence.mc),
            np.asarray(silence.ap))


def noise_bins(cfg: Config) -> int:
    return prim.noise_fft_size(cfg.dsp.hop) // 2 + 1
