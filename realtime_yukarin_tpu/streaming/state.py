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

from realtime_yukarin_tpu.config import Config, DspConfig
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp import resample
from realtime_yukarin_tpu.dsp.f0 import _BIG as _VITERBI_BIG
from realtime_yukarin_tpu.dsp.synthesis import SynthCarry


def input_plan(dsp: DspConfig, chunk_samples: int) -> resample.ResamplePlan:
    """Client-rate -> internal-rate plan for one streaming chunk.  The
    delay is hop-aligned so the resampled stream sits on the analysis
    frame grid (streamed == offline stays exact)."""
    if dsp.in_rate == dsp.sample_rate:
        return resample.make_plan(dsp.sample_rate, dsp.sample_rate,
                                  chunk_samples)
    ci = chunk_samples * dsp.in_rate
    if ci % dsp.sample_rate:
        raise ValueError(
            f"chunk of {chunk_samples} samples @{dsp.sample_rate} is not a "
            f"whole number of samples @{dsp.in_rate}; pick chunk_ms "
            f"divisible by both rates")
    return resample.make_plan(dsp.in_rate, dsp.sample_rate,
                              ci // dsp.sample_rate,
                              align_delay_to=dsp.hop)


def output_plan(dsp: DspConfig, chunk_samples: int) -> resample.ResamplePlan:
    """Internal-rate -> client-rate plan for one streaming chunk."""
    plan = resample.make_plan(dsp.sample_rate, dsp.out_rate, chunk_samples)
    return plan


@dataclasses.dataclass(frozen=True)
class StreamGeometry:
    chunk_frames: int
    chunk_samples: int       # internal-rate samples per chunk
    chunk_in_samples: int    # client-rate samples consumed per chunk
    chunk_out_samples: int   # client-rate samples emitted per chunk
    model_ctx: int
    analysis_half: int
    delay_frames: int
    analysis_frames: int
    buf_samples: int
    buf_frame0_offset: int   # sample offset of analysis frame 0's center
    in_delay: int            # input-resampler delay (internal samples)
    out_delay: int           # output-resampler delay (output-rate samples)
    stage1_ctx: int          # stage-1 one-sided receptive field (frames)
    f0_edge: int             # trailing provisional-F0 frames (median+snap)
    f0_left: int             # leading raw/candidate cache frames (the
    #                          Viterbi LEFT half-window + median neighbor)

    @classmethod
    def from_config(cls, cfg: Config, use_sr: bool = True,
                    use_neural_vocoder: bool = False,
                    vocoder_mode: str | None = None) -> "StreamGeometry":
        from realtime_yukarin_tpu.config import resolve_vocoder_mode
        mode = resolve_vocoder_mode(use_neural_vocoder, vocoder_mode)
        dsp = cfg.dsp
        hop = dsp.hop
        Fc = cfg.streaming.chunk_frames(dsp)
        E = dsp.f0_edge_frames                     # median3 + octave-snap
        mctx = cfg.acoustic.context_frames + E
        if use_sr:
            mctx += cfg.super_resolution.context_frames
        if mode == "ddsp":
            mctx += cfg.vocoder_nn.context_frames
        elif mode == "wave":
            mctx += cfg.vocoder_wave.context_frames
        AH = max(dsp.fft_size // 2, (dsp.f0_frame_len + 1) // 2,
                 (dsp.voicing_energy_win + 1) // 2)
        ah_frames = -(-AH // hop)                   # ceil
        D = mctx + ah_frames
        Fn = Fc + 2 * mctx + 1
        L_buf = (Fc + 2 * mctx + ah_frames) * hop + AH
        p_in = input_plan(dsp, Fc * hop)
        p_out = output_plan(dsp, Fc * hop)
        return cls(chunk_frames=Fc, chunk_samples=Fc * hop,
                   chunk_in_samples=p_in.chunk_in,
                   chunk_out_samples=p_out.chunk_out, model_ctx=mctx,
                   analysis_half=AH, delay_frames=D, analysis_frames=Fn,
                   buf_samples=L_buf, buf_frame0_offset=AH,
                   in_delay=p_in.delay_out, out_delay=p_out.delay_out,
                   stage1_ctx=cfg.acoustic.context_frames,
                   f0_edge=E, f0_left=dsp.f0_left_frames)

    def latency_samples(self, hop: int) -> int:
        """Algorithmic latency in INTERNAL-rate samples (pipeline + the
        frame-aligned input-resampler delay)."""
        return self.delay_frames * hop + self.in_delay

    def latency_out_samples(self, dsp: DspConfig) -> int:
        """End-to-end latency in OUTPUT-rate samples: input-resampler +
        pipeline delay scaled to the output rate, plus the output
        resampler's own delay."""
        internal = self.delay_frames * dsp.hop + self.in_delay
        return (internal * dsp.out_rate // dsp.sample_rate
                + self.out_delay)

    @property
    def cache_frames(self) -> int:
        """Leading analysis frames reused from the previous step (their
        windows / medians / octave-snaps were already final then):
        Fn - Fc - E."""
        return self.analysis_frames - self.chunk_frames - self.f0_edge

    @property
    def stage1_cache_frames(self) -> int:
        """Stage-1 OUTPUT frames carried across steps.  Per step the
        pipeline needs converted mc on window frames [c1+E, Fn-c1-E)
        (c1 = stage-1 context, E = f0_edge): the SR/vocoder ranges plus
        their halos.  Only the trailing Fc of those are newly computable
        (inputs final up to frame Fn-E); the leading
        2*(mctx-c1-E)+1 come from this cache."""
        return 2 * (self.model_ctx - self.stage1_ctx - self.f0_edge) + 1

    @property
    def fresh_frames(self) -> int:
        """Frames whose RAW F0 is estimated per step: the Fc new finals
        + the E trailing frames whose median/snap is still provisional
        (re-estimated next step).  Full feature analysis runs only on
        the Fc finals."""
        return self.chunk_frames + self.f0_edge


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
    synth: SynthCarry          # synthesizer state (WaveCarry in wave mode)
    frame_pos: jnp.ndarray     # [] int32: global index of next output frame
    f0_cache: jnp.ndarray      # [C] final (snapped+refined) F0 per frame
    mc_cache: jnp.ndarray      # [C, M+1] mel-cepstra of cached frames
    ap_cache: jnp.ndarray      # [C, B] band aperiodicity of cached frames
    f0_raw_prev: jnp.ndarray   # [El] raw F0 of the El frames before fresh
    f0_cand_prev: jnp.ndarray  # [El, K] top-K dip candidates before fresh
    f0_cost_prev: jnp.ndarray  # [El, K] their Viterbi emission costs
    mc_c_cache: jnp.ndarray    # [Cs, M+1] stage-1 OUTPUTS carried over
    stage1_acts: tuple         # per-block [k-1, hidden] activation tails
    rs_in: jnp.ndarray | None = None   # input-resampler history (client rate)
    rs_out: jnp.ndarray | None = None  # output-resampler history (internal)

    @classmethod
    def init(cls, cfg: Config, geo: StreamGeometry, params: dict,
             dtype=jnp.float32, vocoder_mode: str = "dsp") -> "StreamCarry":
        from realtime_yukarin_tpu.dsp.synthesis import WaveCarry
        from realtime_yukarin_tpu.models.acoustic import stage1_cache_init
        from realtime_yukarin_tpu.models.voice_changer import compute_dtype

        f0_sil, mc_sil, ap_sil = _silence_features(cfg, geo, jnp.dtype(dtype))
        acts, res_row = stage1_cache_init(
            params["stage1"], jnp.asarray(mc_sil[0], dtype),
            jnp.asarray(f0_sil[0], dtype), cfg.acoustic, compute_dtype(cfg))
        mc_c_row = jnp.asarray(mc_sil[0], dtype) + res_row
        synth0 = (WaveCarry.zeros(cfg.dsp, dtype,
                                  cfg.vocoder_wave.phase_fractional)
                  if vocoder_mode == "wave"
                  else SynthCarry.zeros(cfg.dsp, dtype))
        return cls(
            wave_buf=jnp.zeros((geo.buf_samples,), dtype),
            synth=synth0,
            frame_pos=jnp.asarray(-geo.delay_frames, jnp.int32),
            f0_cache=jnp.asarray(f0_sil, dtype),
            mc_cache=jnp.asarray(mc_sil, dtype),
            ap_cache=jnp.asarray(ap_sil, dtype),
            f0_raw_prev=jnp.zeros((geo.f0_left,), dtype),
            # zero candidates = inactive frames for the window Viterbi —
            # exactly what analysis of the initial silence produces
            f0_cand_prev=jnp.zeros((geo.f0_left, cfg.dsp.f0_cand_k), dtype),
            f0_cost_prev=jnp.full((geo.f0_left, cfg.dsp.f0_cand_k),
                                  _VITERBI_BIG, dtype),
            mc_c_cache=jnp.tile(mc_c_row[None],
                                (geo.stage1_cache_frames, 1)),
            stage1_acts=acts,
            rs_in=resample.init_carry(
                input_plan(cfg.dsp, geo.chunk_samples), dtype),
            rs_out=resample.init_carry(
                output_plan(cfg.dsp, geo.chunk_samples), dtype),
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
