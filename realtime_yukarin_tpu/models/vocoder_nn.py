"""Neural vocoder stage (BASELINE config #4) — DDSP-style control network.

The reference's synthesis is fixed WORLD DSP; config #4 asks for a *neural*
vocoder replacing it.  TPU-first choice (after PAPERS.md: differentiable
WORLD / Autovocoder / low-latency streaming vocoders): instead of an
autoregressive sample loop (hostile to the MXU and to <50 ms latency), a
1-D conv control network predicts per-frame multiplicative corrections to
the DSP-derived harmonic amplitudes and noise-spectrum magnitudes, and the
shared differentiable renderer (:func:`dsp.synthesis.render`) generates the
waveform.  The heads are zero-initialized, so the untrained neural vocoder
reproduces the DSP vocoder exactly — training can only improve it, and the
streaming carry/state story is identical to the DSP path.

Receptive field is finite (conv stack), so streaming needs only
``context_frames`` halo — same contract as the other model stages.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import DspConfig, VocoderNNConfig
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.synthesis import (SynthCarry, render,
                                                synthesis_controls)


class VocoderControlNet(nn.Module):
    """[B, T, D_in] -> (log harmonic scale [B,T,H], log noise scale [B,T,Kn])."""

    cfg: VocoderNNConfig
    num_harmonics: int
    noise_bins: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c = self.cfg
        h = nn.Conv(c.hidden, (1,), dtype=self.dtype, name="stem")(x)
        for i in range(c.num_blocks):
            r = nn.Conv(c.hidden, (c.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(nn.gelu(h))
            h = h + r
        h = nn.gelu(h)
        harm = nn.Conv(self.num_harmonics, (1,), dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="harm_head")(h)
        noise = nn.Conv(self.noise_bins, (1,), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name="noise_head")(h)
        return harm.astype(jnp.float32), noise.astype(jnp.float32)


def vocoder_inputs(f0: jnp.ndarray, mc: jnp.ndarray, ap: jnp.ndarray
                   ) -> jnp.ndarray:
    voiced = (f0 > 0).astype(mc.dtype)
    logf0 = jnp.where(f0 > 0, jnp.log(jnp.maximum(f0, 1.0)), 0.0)
    return jnp.concatenate(
        [mc, ap, logf0[..., None], voiced[..., None]], axis=-1)


def neural_vocoder_controls(params, f0: jnp.ndarray, env: jnp.ndarray,
                            ap: jnp.ndarray, mc: jnp.ndarray,
                            voc_cfg: VocoderNNConfig, dsp_cfg: DspConfig,
                            dtype=jnp.float32):
    """DSP controls modulated by the control net.  All args frame-major
    with F+1 frames (the renderer's lookahead convention); mc [F+1, M+1].

    Returns (amps', noise_mag', f0_filled, voiced) ready for ``render``.
    """
    amps, noise_mag, f0f, voiced = synthesis_controls(f0, env, ap, dsp_cfg)
    k_noise = prim.noise_fft_size(dsp_cfg.hop) // 2 + 1
    net = VocoderControlNet(voc_cfg, dsp_cfg.num_harmonics, k_noise, dtype)
    x = vocoder_inputs(f0, mc, ap)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    log_h, log_n = net.apply(params, x)
    if squeeze:
        log_h, log_n = log_h[0], log_n[0]
    # multiplicative corrections, ==1 at init (zero-init heads)
    amps = amps * jnp.exp(jnp.clip(log_h, -6.0, 6.0))
    noise_mag = noise_mag * jnp.exp(jnp.clip(log_n[:-1], -6.0, 6.0))
    return amps, noise_mag, f0f, voiced


def neural_vocode(params, f0, env, ap, mc, noise, voc_cfg: VocoderNNConfig,
                  dsp_cfg: DspConfig, carry: SynthCarry | None = None,
                  dtype=jnp.float32):
    """Full neural vocoder: controls -> shared renderer -> waveform."""
    amps, noise_mag, f0f, voiced = neural_vocoder_controls(
        params, f0, env, ap, mc, voc_cfg, dsp_cfg, dtype)
    return render(amps, noise_mag, f0f, voiced, noise, dsp_cfg, carry)


def init_vocoder_params(key: jax.Array, voc_cfg: VocoderNNConfig,
                        dsp_cfg: DspConfig, dtype=jnp.float32):
    k_noise = prim.noise_fft_size(dsp_cfg.hop) // 2 + 1
    net = VocoderControlNet(voc_cfg, dsp_cfg.num_harmonics, k_noise, dtype)
    d_in = dsp_cfg.mc_dim + dsp_cfg.num_ap_bands + 2
    return net.init(key, jnp.zeros((1, 8, d_in), jnp.float32))
