"""Stage-2 spectral super-resolution (become-yukarin ``SuperResolution``).

SURVEY.md §2b: the reference's stage 2 is a Chainer 2-D conv
encoder-decoder over (time x frequency) patches that maps the smooth
envelope decoded from converted mel-cepstrum to a full-detail envelope.

TPU-first re-design (2nd iteration): the 2-D U-Net treated frequency as a
spatial axis — small channel counts starved the MXU (43 ms/step measured).
A frequency-mixing design is both stronger for cfg.spec_bins-bin
envelopes (512 at the default fft_size=1022; every output bin sees every
input bin immediately) and MXU-native: dense freq-mixing layers + gated
time convolutions with ~512 channels, all [rows, K]x[K, .] matmuls.
~16x fewer FLOPs than the U-Net and a
4-frame time context instead of 15 (shorter streaming halo/latency).
Works on log-power; zero-init head => identity at init.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from realtime_yukarin_tpu.config import DspConfig, SuperResolutionConfig


class SRNet(nn.Module):
    """[B, T, K] log-power -> [B, T, K] refined log-power (residual)."""

    cfg: SuperResolutionConfig
    spec_bins: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, logE: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = logE.astype(self.dtype)
        h = nn.Dense(c.hidden, dtype=self.dtype, name="freq_in")(x)
        for i in range(c.num_blocks):
            r = nn.Conv(2 * c.hidden, (c.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"time_conv_{i}")(h)
            a, b = jnp.split(r, 2, axis=-1)
            r = a * nn.sigmoid(b)                     # GLU over time context
            r = nn.Dense(c.hidden, dtype=self.dtype,
                         name=f"freq_mix_{i}")(r)
            h = h + r
        res = nn.Dense(self.spec_bins, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="head")(h)
        return logE + res.astype(jnp.float32)


def refine_envelope(params, env: jnp.ndarray, sr_cfg: SuperResolutionConfig,
                    dsp_cfg: DspConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Apply stage 2 in power domain.  env: [T, K] or [B, T, K]."""
    net = SRNet(sr_cfg, dsp_cfg.spec_bins, dtype)
    logE = jnp.log(jnp.maximum(env, 1e-12))
    squeeze = logE.ndim == 2
    if squeeze:
        logE = logE[None]
    out = net.apply(params, logE)
    if squeeze:
        out = out[0]
    return jnp.exp(out)
