"""Stage-2 spectral super-resolution (become-yukarin ``SuperResolution``).

SURVEY.md §2b: the reference's stage 2 is a Chainer 2-D conv
encoder-decoder over (time x frequency) that maps the smooth envelope
decoded from converted mel-cepstrum to a full-detail spectral envelope.

TPU-first re-design: a frequency-axis U-Net — downsampling happens ONLY
along frequency (strides (1, 2)), never along time.  That keeps the
time receptive field small and parity-free, so chunked streaming needs just
``context_frames`` of halo and interior outputs match offline exactly
(no alignment constraints between chunk boundaries and pooling grids).
Works on log-power; the output head is zero-initialized so the untrained
net is the identity.
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
        k = c.kernel_size
        # frequency axis must be divisible by 2**num_scales: process the
        # first 2**ceil bins and pass the Nyquist remainder through.
        fdiv = 2 ** c.num_scales
        K_proc = (self.spec_bins // fdiv) * fdiv          # e.g. 513 -> 512
        x = logE[..., :K_proc, None].astype(self.dtype)   # [B, T, F, 1]

        skips = []
        h = nn.Conv(c.base_channels, (k, k), padding="SAME",
                    dtype=self.dtype, name="stem")(x)
        ch = c.base_channels
        for s in range(c.num_scales):
            h = nn.gelu(nn.Conv(ch, (k, k), padding="SAME",
                                dtype=self.dtype, name=f"enc_{s}a")(h))
            skips.append(h)
            ch *= 2
            h = nn.gelu(nn.Conv(ch, (k, k), strides=(1, 2), padding="SAME",
                                dtype=self.dtype, name=f"enc_{s}b")(h))
        h = nn.gelu(nn.Conv(ch, (k, k), padding="SAME", dtype=self.dtype,
                            name="mid")(h))
        for s in reversed(range(c.num_scales)):
            ch //= 2
            h = nn.ConvTranspose(ch, (k, k), strides=(1, 2), padding="SAME",
                                 dtype=self.dtype, name=f"dec_{s}a")(h)
            h = jnp.concatenate([h, skips[s]], axis=-1)
            h = nn.gelu(nn.Conv(ch, (k, k), padding="SAME",
                                dtype=self.dtype, name=f"dec_{s}b")(h))
        res = nn.Conv(1, (k, k), padding="SAME", dtype=self.dtype,
                      kernel_init=nn.initializers.zeros, name="head")(h)
        res = res[..., 0].astype(jnp.float32)             # [B, T, K_proc]
        pad = jnp.zeros(logE.shape[:-1] + (self.spec_bins - K_proc,),
                        jnp.float32)
        return logE + jnp.concatenate([res, pad], axis=-1)


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
