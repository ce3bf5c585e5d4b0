"""Waveform synthesis (JAX) — harmonic + noise with explicit carry.

Role of WORLD's ``synthesis.cpp`` / ``synthesisrealtime.cpp`` (SURVEY.md
§3.4): the C++ ring-buffer synthesizer's hidden state (excitation phase,
overlap-add tails) becomes an explicit, donated pytree carry so streamed
synthesis lives on-device across invocations (BASELINE north star).

TPU-first reformulation: instead of placing impulse responses at
data-dependent pitch marks (branchy, dynamic), synthesis is a coherent
harmonic bank (fundamental phase integrated via cumsum; harmonic h phase =
h * fundamental, exact under mod-2pi wrapping) plus gaussian noise shaped
per frame in the rfft domain and overlap-added with an exact-COLA window.
Everything is fixed-shape elementwise/FFT/matmul work.

Matches ``golden.reference.synthesize`` allclose (same RNG inputs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import DspConfig
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.framing import lerp_rows
from realtime_yukarin_tpu.ops import dft


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class SynthCarry(NamedTuple):
    """On-device synthesis state carried across chunks.

    The fundamental phase resets to 0 at every unvoiced->voiced onset (see
    golden.reference.synthesize), which makes the phase track — and hence
    streamed output — a pure function of the F0 contour.  ``voiced_prev``
    remembers the voicing of the frame preceding the next chunk.
    """
    phase: jnp.ndarray        # [] fundamental phase (radians, wrapped)
    voiced_prev: jnp.ndarray  # [] bool: was the previous frame voiced
    noise_tail: jnp.ndarray   # [noise_fft - hop] OLA tail

    @classmethod
    def zeros(cls, cfg: DspConfig, dtype=jnp.float32) -> "SynthCarry":
        n_noise = prim.noise_fft_size(cfg.hop)
        return cls(phase=jnp.zeros((), dtype),
                   voiced_prev=jnp.zeros((), jnp.bool_),
                   noise_tail=jnp.zeros((n_noise - cfg.hop,), dtype))


class WaveCarry(NamedTuple):
    """Carry of the "wave" vocoder mode: the DSP renderer's state plus the
    learned residual's own OLA tail and the fractional phase tracks
    (models/vocoder_wave.py).

    ``frac_phase`` [Q] is each fractional comb's OWN wrapped phase at the
    next chunk start.  The fundamental's wrapped boundary phase cannot
    serve here: for a non-integer ratio r, cos(r * (phi mod 2pi)) jumps by
    2pi*frac(r) at every fundamental wrap, so a track derived from the
    wrapped fundamental can never stay coherent with a true r*f0 partial
    (ADVICE r4).  Each track therefore accumulates r * delta-phi itself
    and wraps its own phase mod 2pi — wrapping per-track is exact because
    only cos/sin of the track phase are ever used.
    """
    synth: SynthCarry
    res_tail: jnp.ndarray     # [noise_fft - hop]
    frac_phase: jnp.ndarray   # [Q] per-fractional-track wrapped phase

    @classmethod
    def zeros(cls, cfg: DspConfig, dtype=jnp.float32,
              phase_fractional: int = 0) -> "WaveCarry":
        n = prim.noise_fft_size(cfg.hop)
        return cls(synth=SynthCarry.zeros(cfg, dtype),
                   res_tail=jnp.zeros((n - cfg.hop,), dtype),
                   frac_phase=jnp.zeros((phase_fractional,), dtype))


def harmonic_amplitudes(f0: jnp.ndarray, env: jnp.ndarray,
                        ap: jnp.ndarray, cfg: DspConfig) -> jnp.ndarray:
    """Per-frame harmonic amplitudes [F', H] from controls [F', ...].

    env [F', K] on the rfft bin grid; ap [F', B] BAND values.  Harmonics
    interpolate the band polyline directly (B ~ 5 nodes, a tiny dense
    one-hot) instead of expanding it to K bins and re-interpolating: the
    expanded [F', K] tensor doubled lerp_rows' HBM traffic as a second
    interpolation channel, and direct interpolation of a piecewise-linear
    function is the function itself (expand-then-lerp deviated slightly
    wherever two envelope bins straddled a band center)."""
    fs = float(cfg.sample_rate)
    N = cfg.fft_size
    K = cfg.spec_bins
    B = cfg.num_ap_bands
    wsumsq = prim.analysis_window_sumsq(N)
    h_idx = jnp.arange(1, cfg.num_harmonics + 1, dtype=env.dtype)

    voiced = (f0 > 0).astype(env.dtype)
    f0f = jnp.where(f0 > 0, f0, prim.DEFAULT_F0)
    freqs = h_idx[None, :] * f0f[:, None]                     # [F', H]
    pos = jnp.clip(freqs * N / fs, 0.0, K - 1.0)
    e_h = lerp_rows(env, pos)
    if B > 1:
        centers = prim.ap_band_centers(cfg.sample_rate, B)
        # uniform band grid: clip() also reproduces the constant
        # extrapolation of prim.ap_expand_matrix beyond the end centers
        pos_b = jnp.clip((pos * (fs / N) - float(centers[0]))
                         / float(centers[1] - centers[0]), 0.0, B - 1.0)
        ap_h = lerp_rows(ap, pos_b)
    else:
        ap_h = jnp.broadcast_to(ap[:, :1], freqs.shape)
    alias_ok = (freqs < prim.HARMONIC_NYQUIST_FRACTION * fs / 2.0
                ).astype(env.dtype)
    # envelope at a harmonic is mainlobe power averaged over the width-f0
    # smoothing window => amplitude a^2 = 4 E f0 / (fs W2)  (golden parity)
    return (jnp.sqrt(4.0 * jnp.maximum(e_h, 0.0)
                     * f0f[:, None] / (fs * wsumsq))
            * jnp.sqrt(jnp.clip(1.0 - ap_h ** 2, 0.0, 1.0))
            * voiced[:, None] * alias_ok)


def synthesis_controls(f0: jnp.ndarray, env: jnp.ndarray, ap: jnp.ndarray,
                       cfg: DspConfig
                       ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DSP-derived synthesis controls from acoustic features.

    Returns (amps [F+1, H], noise_mag [F, k_noise], f0_filled [F+1]) — the
    inputs of :func:`render`.  The neural vocoder stage (BASELINE config #4)
    produces modified versions of these same controls.
    """
    F = f0.shape[0] - 1
    hop = cfg.hop
    N = cfg.fft_size
    n_noise = prim.noise_fft_size(hop)
    dtype = env.dtype

    amps = harmonic_amplitudes(f0, env, ap, cfg)              # [F+1, H]
    f0f = jnp.where(f0 > 0, f0, prim.DEFAULT_F0)

    wsumsq = prim.analysis_window_sumsq(N)
    Wn = jnp.asarray(prim.noise_spec_interp_matrix(N, hop), dtype)
    # noise-grid ap straight from the band values: the band->bin expansion
    # folds into the interp matrix host-side ([k_noise, B], float64), so
    # the [F, K] expanded tensor never exists on device
    Wna = jnp.asarray(prim.noise_band_interp_matrix(
        N, hop, cfg.sample_rate, cfg.num_ap_bands), dtype)
    # HIGH (bf16_3x): these shape noise magnitudes; ~1e-6 relative error
    # is far below the noise branch's golden tolerance, at half the cost
    hp = jax.lax.Precision.HIGH
    e_noise = jnp.matmul(env[:F], Wn.T, precision=hp)         # [F, k_noise]
    ap_noise = jnp.matmul(ap[:F], Wna.T, precision=hp)
    noise_mag = jnp.sqrt(jnp.maximum(e_noise * ap_noise ** 2, 0.0)
                         * n_noise / wsumsq)
    return amps, noise_mag, f0f, f0 > 0


def synthesize(f0: jnp.ndarray, env: jnp.ndarray, ap: jnp.ndarray,
               noise: jnp.ndarray, cfg: DspConfig,
               carry: SynthCarry | None = None
               ) -> tuple[jnp.ndarray, SynthCarry]:
    """F+1 frames of controls -> F*hop samples + next carry.

    f0 [F+1], env [F+1, K], ap [F+1, B], noise [F, noise_bins, 2].
    Controls for sample n in [i*hop, (i+1)*hop) interpolate frames i, i+1;
    the final frame is the one-frame lookahead the streaming layer supplies
    (SURVEY.md §2a extra_time, reborn as static halo).
    """
    amps, noise_mag, f0f, voiced = synthesis_controls(f0, env, ap, cfg)
    return render(amps, noise_mag, f0f, voiced, noise, cfg, carry)


class PhaseTrack(NamedTuple):
    """Integrated excitation phase for F output frames.

    Shared between the DSP renderer and the learned waveform decoder
    (models/vocoder_wave.py), whose head phase-locks residual harmonics
    to ``boundaries``.
    """
    phi: jnp.ndarray         # [F, hop] per-sample fundamental phase
    boundaries: jnp.ndarray  # [F] phase at each frame start (mod 2pi)
    frac: jnp.ndarray        # [hop] intra-hop interpolation weight (0, 1]
    phase_out: jnp.ndarray   # [] carry-out phase
    vprev_out: jnp.ndarray   # [] carry-out voicing
    # UNWRAPPED phase advance since the last voicing reset (or chunk
    # start) — what a fractional comb track (phase = r * fundamental)
    # needs, since it cannot be reconstructed from the wrapped
    # ``boundaries`` for non-integer r (see WaveCarry.frac_phase)
    adv: jnp.ndarray         # [F] advance at each frame start (radians)
    no_reset: jnp.ndarray    # [F] bool: no voicing reset up to frame i
    adv_out: jnp.ndarray     # [] advance at the carry-out point
    no_reset_out: jnp.ndarray  # [] bool: chunk had no voicing reset


def integrate_phase(f0f: jnp.ndarray, voiced: jnp.ndarray, cfg: DspConfig,
                    carry: SynthCarry) -> PhaseTrack:
    """Per-sample phase from the F0 contour, scan-free.

    f0f [F+1] filled instantaneous F0 (Hz, never 0); voiced [F+1] bool.
    Phase integration is a triangular-ones matmul (lane cumsums serialize
    on TPU — see ops/dft.py); HIGHEST keeps phase at f32 accuracy.
    """
    F = f0f.shape[0] - 1
    hop = cfg.hop
    fs = float(cfg.sample_rate)
    dtype = f0f.dtype
    frac = (jnp.arange(hop, dtype=dtype) + 1.0) / hop         # (0, 1]
    f_inst = (f0f[:-1, None] * (1.0 - frac)[None, :]
              + f0f[1:, None] * frac[None, :])                # [F, hop]
    M = jnp.asarray(dft.prefix_sum_matrix(hop), dtype)
    cum = jnp.matmul(2.0 * jnp.pi * f_inst / fs, M,
                     precision=jax.lax.Precision.HIGHEST)     # [F, hop]
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype)

    # Frame-boundary phases WITHOUT a sequential scan (a 21-step scan of
    # trivial bodies is pure latency on TPU).  The recurrence
    #   boundary_i = phase_{i-1} if (v_i & v_{i-1}) else 0
    # is a prefix sum with segment resets: with r_i = last reset <= i
    # (a masked-max over the tiny [F, F] triangle) and csum the exclusive
    # frame-increment prefix sum (triangular matmul),
    #   boundary_i = base_i + csum[i] - csum[max(r_i, 0)],
    # base_i = carry.phase when no reset has happened yet.  One mod at
    # the end replaces the per-step mod (phase accumulates < ~550 rad
    # per chunk; f32 residual error ~1e-4 rad, far below tolerances).
    v = voiced[:-1]
    vprev = jnp.concatenate([carry.voiced_prev[None], v[:-1]])
    cont = v & vprev
    idx = jnp.arange(F)
    reset_at = jnp.where(~cont, idx, -1)
    tri = idx[None, :] <= idx[:, None]
    r = jnp.max(jnp.where(tri, reset_at[None, :], -1), axis=1)  # [F]
    Mf = jnp.asarray(dft.prefix_sum_matrix(F), dtype)
    csum_incl = jnp.matmul(cum[:, -1], Mf,
                           precision=jax.lax.Precision.HIGHEST)
    csum = jnp.concatenate([jnp.zeros((1,), dtype), csum_incl])  # [F+1]
    base = jnp.where(r < 0, carry.phase.astype(dtype), 0.0)
    cols = jnp.arange(F + 1)
    csum_r = jnp.sum(jnp.where(cols[None, :] == jnp.maximum(r, 0)[:, None],
                               csum[None, :], 0.0), axis=1)
    adv = csum[:F] - csum_r                                     # [F]
    boundaries = jnp.mod(base + adv, two_pi)                    # [F]
    adv_out = csum[F] - csum_r[F - 1]
    phase_out = jnp.mod(base[F - 1] + adv_out, two_pi)
    vprev_out = v[F - 1]
    phi = boundaries[:, None] + cum                            # [F, hop]
    return PhaseTrack(phi=phi, boundaries=boundaries, frac=frac,
                      phase_out=phase_out, vprev_out=vprev_out,
                      adv=adv, no_reset=r < 0, adv_out=adv_out,
                      no_reset_out=r[F - 1] < 0)


def ola_hop_blocks(seg: jnp.ndarray, tail: jnp.ndarray, hop: int
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-COLA overlap-add via block shifting.

    seg [F, n] windowed segments, n a multiple of hop (segment i starts
    at sample i*hop); tail [n - hop] carry-in.  Returns (out [F*hop],
    tail_out [n - hop]).  Block m of segment i lands on output frame i+m
    — no gathers, no scan.  Shared by the noise branch and the learned
    waveform decoder's residual iSTFT.
    """
    F, n = seg.shape
    n_blocks = n // hop
    blocks = seg.reshape(F, n_blocks, hop)
    acc = jnp.zeros((F + n_blocks - 1, hop), seg.dtype)
    for m in range(n_blocks):
        acc = acc.at[m: m + F].add(blocks[:, m, :])
    acc = acc.reshape(-1)                                      # [T + tail]
    acc = acc.at[: n - hop].add(tail)
    T = F * hop
    return acc[:T], acc[T:]


def render(amps: jnp.ndarray, noise_mag: jnp.ndarray, f0f: jnp.ndarray,
           voiced: jnp.ndarray, noise: jnp.ndarray, cfg: DspConfig,
           carry: SynthCarry | None = None
           ) -> tuple[jnp.ndarray, SynthCarry]:
    """Render a waveform from synthesis controls.

    amps [F+1, H] harmonic amplitudes; noise_mag [F, k_noise] rfft-domain
    noise magnitudes; f0f [F+1] filled instantaneous F0 (Hz, never 0);
    voiced [F+1] bool voicing flags; noise [F, k_noise, 2] unit gaussians.
    """
    dtype = amps.dtype
    if carry is None:
        carry = SynthCarry.zeros(cfg, dtype)
    track = integrate_phase(f0f, voiced, cfg, carry)
    return render_core(amps, noise_mag, track, noise, cfg, carry)


def render_core(amps: jnp.ndarray, noise_mag: jnp.ndarray,
                track: PhaseTrack, noise: jnp.ndarray, cfg: DspConfig,
                carry: SynthCarry) -> tuple[jnp.ndarray, SynthCarry]:
    """Renderer body given a precomputed :class:`PhaseTrack` (the waveform
    decoder computes the track once and shares it with its residual head).
    """
    F = track.phi.shape[0]
    hop = cfg.hop
    n_noise = prim.noise_fft_size(hop)
    dtype = amps.dtype
    phi, frac = track.phi, track.frac

    # ---- harmonic branch ------------------------------------------------
    if _use_pallas():
        # Pallas Chebyshev-recurrence kernel: one sin/cos per sample, FMA
        # per harmonic (ops/pallas_synth.py — the vocoder sampling loop)
        from realtime_yukarin_tpu.ops.pallas_synth import harmonic_bank
        frac_rows = jnp.broadcast_to(frac[None, :], phi.shape)
        harm = harmonic_bank(amps[:-1], amps[1:], phi, frac_rows)
    else:
        a_inst = (amps[:-1, None, :] * (1.0 - frac)[None, :, None]
                  + amps[1:, None, :] * frac[None, :, None])   # [F, hop, H]
        h_idx = jnp.arange(1, cfg.num_harmonics + 1, dtype=dtype)
        harm = jnp.einsum("fnh,fnh->fn", a_inst,
                          jnp.sin(phi[:, :, None] * h_idx[None, None, :]),
                          precision=jax.lax.Precision.HIGHEST)
    harm = harm.reshape(F * hop)

    # ---- noise branch ---------------------------------------------------
    A = noise_mag
    root2 = jnp.sqrt(jnp.asarray(2.0, dtype))
    inv_root2 = 1.0 / root2
    re = A * noise[:, :, 0] * inv_root2
    im = A * noise[:, :, 1] * inv_root2
    # DC and Nyquist bins are real with doubled weight (matches golden)
    re = re.at[:, 0].mul(root2).at[:, -1].mul(root2)
    im = im.at[:, 0].set(0.0).at[:, -1].set(0.0)
    w_noise = jnp.asarray(prim.noise_window(hop), dtype)
    # irfft as two MXU matmuls (ops/dft.py) — no XLA FFT in the hot path
    seg = dft.irfft_real(re, im, n_noise) * w_noise[None, :]

    acc, tail = ola_hop_blocks(seg, carry.noise_tail, hop)
    norm = jnp.tile(jnp.asarray(prim.noise_ola_norm(hop), dtype), F)
    wave = harm + acc / norm
    new_carry = SynthCarry(phase=track.phase_out,
                           voiced_prev=track.vprev_out, noise_tail=tail)
    return wave, new_carry
