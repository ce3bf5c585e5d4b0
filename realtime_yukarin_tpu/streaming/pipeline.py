"""The jitted streaming step — the reference's worker pipeline reborn.

SURVEY.md §3.1: the reference runs encode/convert/decode in three OS
processes linked by queues.  TPU-native re-design (BASELINE north star):
the whole per-chunk pipeline is ONE device program with a donated carry —
analysis with halo, model stages, and stateful synthesis fuse into a single
XLA executable, and the carry (rolling wave window, synth phase, OLA tail)
never leaves HBM.  The host only feeds PCM in and reads PCM out.

Noise determinism: each frame's gaussian drivers are a fixed function of
the global frame index (precomputed table row, see ``frame_noise``), so
streamed and offline synthesis use identical noise and the equivalence
test is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config, resolve_vocoder_mode
from realtime_yukarin_tpu.dsp.envelope import power_spectrogram
from realtime_yukarin_tpu.dsp.f0 import (f0_raw_and_candidates,
                                         viterbi_snap, voicing_revision)
from realtime_yukarin_tpu.dsp.framing import median3
from realtime_yukarin_tpu.dsp.synthesis import render, synthesize
from realtime_yukarin_tpu.dsp.world import (AcousticFeature,
                                            analyze_given_f0)
from realtime_yukarin_tpu.dsp.mcep import decode_mcep
from realtime_yukarin_tpu.models.acoustic import convert_mc_streamed
from realtime_yukarin_tpu.models.super_resolution import refine_envelope
from realtime_yukarin_tpu.models.vocoder_nn import neural_vocoder_controls
from realtime_yukarin_tpu.models.vocoder_wave import waveform_vocode
from realtime_yukarin_tpu.models.voice_changer import (compute_dtype,
                                                       convert_f0_stats)
from realtime_yukarin_tpu.dsp.resample import resample_chunk
from realtime_yukarin_tpu.streaming.state import (StreamCarry,
                                                  StreamGeometry, input_plan,
                                                  noise_bins, output_plan)


NOISE_TABLE_FRAMES = 4096   # ~20 s of excitation before the table wraps
_NOISE_TABLE_SEED = 0x5EED


@functools.lru_cache(maxsize=4)
def _noise_table_np(bins: int) -> "np.ndarray":
    import numpy as np
    rng = np.random.default_rng(_NOISE_TABLE_SEED)
    return rng.standard_normal(
        (NOISE_TABLE_FRAMES, bins, 2)).astype(np.float32)


def frame_noise(key: jax.Array, start_frame, count: int, bins: int
                ) -> jnp.ndarray:
    """Noise for global frames [start, start+count) -> [count, bins, 2].

    Position-deterministic: frame i's gaussians are a fixed function of
    the global frame index, so streamed and offline synthesis see
    identical noise regardless of chunking.  The table (an XLA constant,
    ~8 MB) replaces online counter-based RNG: generating the ~3M
    gaussians a 128-stream step needs cost ~20 ms/step in XLA
    threefry/rbg — ~70%% of the whole pipeline — whereas this gather is
    bandwidth-noise.

    Periodicity: rows are read through a per-stream odd-stride
    permutation whose phase ALSO advances by an odd shift every table
    wrap, so the driver sequence repeats only after T^2 frames (~23 h at
    5 ms frames), not T (~20 s).  Without the per-wrap shift, a long
    STATIONARY unvoiced segment repeats exactly at the table period
    (measured autocorrelation 0.9998 at lag T*hop; with it: ~0 — gated
    by tests/test_soak.py::test_noise_table_no_periodicity).
    ``offset``/``stride``/``shift`` derive from ``key``, decorrelating
    concurrent streams ((offset, stride) collisions ~1e-3 at 128
    streams).
    """
    T = NOISE_TABLE_FRAMES
    table = jnp.asarray(_noise_table_np(bins))
    bits = jax.random.bits(key, (3,), jnp.uint32)
    offset = (bits[0] % T).astype(jnp.int32)
    # ODD stride/shift: T is a power of two, so odd multipliers are
    # full-cycle permutations and odd shifts never alias block phases
    stride = ((bits[1] % (T // 2)) * 2 + 1).astype(jnp.int32)
    shift = ((bits[2] % (T // 2)) * 2 + 1).astype(jnp.int32)
    gpos = jnp.asarray(start_frame, jnp.int32) + jnp.arange(
        count, dtype=jnp.int32)
    pos = jnp.mod(gpos, T)
    block = jnp.mod(gpos // T, T)             # pre-reduced: no overflow
    idx = jnp.mod(pos * stride + offset + block * shift, T)
    return table[idx]


def streaming_step_impl(params: dict, carry: StreamCarry,
                        chunk: jnp.ndarray, key: jax.Array, cfg: Config,
                        use_sr: bool = True,
                        use_neural_vocoder: bool = False,
                        vocoder_mode: str | None = None
                        ) -> tuple[jnp.ndarray, StreamCarry]:
    """One chunk in, one chunk out (constant D-frame latency).

    chunk: [chunk_in_samples] new input PCM at cfg.dsp.in_rate.  Returns
    converted PCM [chunk_out_samples] at cfg.dsp.out_rate and the next
    carry.  The carry argument is donated: state stays on-device, buffers
    are reused in place.  When the client rates differ from the internal
    rate, the polyphase resamplers run here inside the same fused program
    (one extra matmul per edge).
    """
    mode = resolve_vocoder_mode(use_neural_vocoder, vocoder_mode)
    geo = StreamGeometry.from_config(cfg, use_sr, vocoder_mode=mode)
    hop = cfg.dsp.hop
    Fc = geo.chunk_frames
    mctx = geo.model_ctx

    # 0. resample the client chunk to the internal rate (frame-aligned
    # delay, so the rest of the pipeline is oblivious)
    chunk, rs_in = resample_chunk(carry.rs_in, chunk,
                                  input_plan(cfg.dsp, geo.chunk_samples))

    # 1. roll the wave buffer and append the new chunk
    buf = jnp.concatenate([carry.wave_buf[geo.chunk_samples:], chunk])

    # 2. analyze ONLY the newly-final frames; the leading cache_frames
    # come from the carry — analysis is frame-local given F0, so cached
    # values are bit-identical to a recompute.  Raw F0 is additionally
    # estimated for the E = f0_edge trailing frames (still provisional:
    # their median/octave-snap need future neighbors; re-estimated next
    # step), and the E raws BEFORE the fresh range come from the carry.
    C = geo.cache_frames
    E = geo.f0_edge
    El = geo.f0_left                             # left-context raw cache
    fresh = geo.fresh_frames                     # Fc + E raw frames
    off = geo.buf_frame0_offset + C * hop
    # raw F0 + top-K dip candidates from ONE CMND pass (explicitly
    # shared front half — no CSE reliance)
    raw_fresh, cand_fresh, cost_fresh = f0_raw_and_candidates(
        buf, fresh, cfg.dsp, off)
    raw_ext = jnp.concatenate([carry.f0_raw_prev, raw_fresh])
    cand_ext = jnp.concatenate([carry.f0_cand_prev, cand_fresh])
    cost_ext = jnp.concatenate([carry.f0_cost_prev, cost_fresh])
    # median for frames [C-El, Fn); interior values (all we consume) are
    # exact, edge replicas fall outside the consumed range
    m_ext = median3(raw_ext)
    # Viterbi contour snap for the Fc finals [C, Fn-E): each needs the
    # median track + candidates on [i-hl, i+hr] — the LEFT half comes
    # from the carried cache (free), only the RIGHT half costs
    # lookahead (E = 1 + hr).  The snap helper pads its input edges
    # with inactive frames, so slice exactly the half-window margins
    # and keep the middle Fc outputs (those windows are complete).
    hl = cfg.dsp.f0_snap_left_eff
    hr = cfg.dsp.f0_snap_halo
    lo = El - hl                                 # m_ext index of frame C-hl
    snap_in = m_ext[lo: lo + Fc + hl + hr]
    snapped, choice = viterbi_snap(snap_in,
                                   cand_ext[lo: lo + Fc + hl + hr],
                                   cost_ext[lo: lo + Fc + hl + hr],
                                   cfg.dsp)
    # ONE power spectrogram for voicing revision + refinement + envelope
    # + aperiodicity (explicit threading — identical pallas_calls may
    # not CSE; see dsp.envelope.power_spectrogram)
    P = power_spectrogram(buf, Fc, cfg.dsp, off)
    # band-evidence voicing revision on the finals (frame-local given
    # f0+choice)
    f0_final = voicing_revision(buf, snapped[hl: hl + Fc],
                                choice[hl: hl + Fc], Fc, cfg.dsp, off,
                                P=P)
    # refine=True: the StoneMask-role refinement runs on the fresh
    # frames' shared power spectrogram; frame-local given the snapped
    # f0, so refined values cache exactly like every other feature
    ffresh = analyze_given_f0(buf, f0_final, Fc, cfg.dsp, off,
                              refine=True, P=P)

    f0_all = jnp.concatenate([carry.f0_cache, ffresh.f0])     # [Fn - E]
    mc_all = jnp.concatenate([carry.mc_cache, ffresh.mc])
    ap_all = jnp.concatenate([carry.ap_cache, ffresh.ap])

    # 3. convert features.  Stage 1 advances via per-layer streaming conv
    # caches: only the Fc newly-final input frames [Fn-1-Fc, Fn-1) are fed
    # (frame Fn-1 is the provisional median edge), each conv runs VALID
    # over its cached k-1 tail + the fresh frames, and the resulting
    # outputs (which lag c1 frames) extend the carried stage-1 output
    # cache to exactly the range SR + synthesis need: window frames
    # [c1+1, Fn-c1-1).  Bit-identical to the full-window forward
    # (tests/test_models.py::test_stage1_streamed_bit_exact); cuts stage-1
    # conv work from Fn to ~Fc frames per step.
    ctx_v = {"ddsp": cfg.vocoder_nn.context_frames,
             "wave": cfg.vocoder_wave.context_frames}.get(mode, 0)
    ctx_sr = cfg.super_resolution.context_frames if use_sr else 0
    c1 = cfg.acoustic.context_frames
    dtype = compute_dtype(cfg)
    Fn = geo.analysis_frames
    L = Fc + 1
    Lv = L + 2 * ctx_v
    s = mctx - ctx_v                      # first frame synthesis consumes

    res, stage1_acts = convert_mc_streamed(
        params["stage1"], mc_all[Fn - E - Fc: Fn - E],
        f0_all[Fn - E - Fc: Fn - E], carry.stage1_acts, cfg.acoustic, dtype)
    mc_c_fresh = mc_all[Fn - E - c1 - Fc: Fn - E - c1] + res
    mc_c_need = jnp.concatenate([carry.mc_c_cache, mc_c_fresh])
    f0c_need = convert_f0_stats(f0_all[c1 + E: Fn - c1 - E],
                                params["f0_stats"])
    env_low = decode_mcep(mc_c_need, cfg.dsp)
    if use_sr:
        env_mid = refine_envelope(params["stage2"], env_low,
                                  cfg.super_resolution, cfg.dsp, dtype)
    else:
        env_mid = env_low
    # frame s sits at needed-array index ctx_sr (= s - (c1+1))
    conv = AcousticFeature(f0=f0c_need[ctx_sr: ctx_sr + Lv],
                           env=env_mid[ctx_sr: ctx_sr + Lv],
                           ap=ap_all[s: s + Lv],
                           mc=mc_c_need[ctx_sr: ctx_sr + Lv])

    # 4. synthesize Fc frames with position-deterministic noise
    out_frame0 = carry.frame_pos
    noise = frame_noise(key, out_frame0, Fc, noise_bins(cfg))
    if mode == "ddsp":
        amps, nmag, f0f, voiced = neural_vocoder_controls(
            params["vocoder"], conv.f0, conv.env, conv.ap, conv.mc,
            cfg.vocoder_nn, cfg.dsp, dtype=compute_dtype(cfg))
        out, synth_carry = render(
            amps[ctx_v: ctx_v + L], nmag[ctx_v: ctx_v + L - 1],
            f0f[ctx_v: ctx_v + L], voiced[ctx_v: ctx_v + L],
            noise, cfg.dsp, carry.synth)
    elif mode == "wave":
        out, synth_carry = waveform_vocode(
            params["vocoder_wave"], conv.f0, conv.env, conv.ap, conv.mc,
            noise, cfg.vocoder_wave, cfg.dsp, carry.synth, out_ctx=ctx_v,
            dtype=compute_dtype(cfg))
    else:
        out, synth_carry = synthesize(conv.f0, conv.env, conv.ap, noise,
                                      cfg.dsp, carry.synth)

    # 5. resample the converted chunk to the client output rate
    out, rs_out = resample_chunk(carry.rs_out, out,
                                 output_plan(cfg.dsp, geo.chunk_samples))

    new_carry = StreamCarry(
        wave_buf=buf, synth=synth_carry, frame_pos=out_frame0 + Fc,
        mc_c_cache=mc_c_need[Fc:], stage1_acts=stage1_acts,
        rs_in=rs_in, rs_out=rs_out,
        # next step's window is this one shifted by Fc: cache frames
        # [Fc, Fn-E) (the E trailing frames have provisional median/snap
        # and are re-estimated next step); the raw cache holds the El
        # frames preceding the next fresh range, [Fn-E-El, Fn-E) —
        # sliced from the ext arrays so it stays valid even when the
        # left window exceeds the chunk (El > Fc at small chunks)
        f0_cache=f0_all[Fc:],
        mc_cache=mc_all[Fc:],
        ap_cache=ap_all[Fc:],
        f0_raw_prev=raw_ext[Fc: Fc + El],
        f0_cand_prev=cand_ext[Fc: Fc + El],
        f0_cost_prev=cost_ext[Fc: Fc + El])
    return out, new_carry


streaming_step = functools.partial(
    jax.jit, static_argnames=("cfg", "use_sr", "use_neural_vocoder",
                              "vocoder_mode"),
    donate_argnames=("carry",))(streaming_step_impl)


def init_stream(params: dict, cfg: Config, use_sr: bool = True,
                use_neural_vocoder: bool = False,
                vocoder_mode: str | None = None
                ) -> tuple[StreamCarry, StreamGeometry]:
    mode = resolve_vocoder_mode(use_neural_vocoder, vocoder_mode)
    geo = StreamGeometry.from_config(cfg, use_sr, vocoder_mode=mode)
    return StreamCarry.init(cfg, geo, params, vocoder_mode=mode), geo
