"""Stage-1 acoustic conversion network (yukarin ``AcousticConverter`` role).

SURVEY.md §2b: the reference's stage 1 is a Chainer 1-D GLU/residual conv
stack over time that maps source mel-cepstrum (+ F0) to target mel-cepstrum,
with a finite receptive field so chunked streaming just needs halo context.

TPU-first: flax.linen, NHC layout ([batch, time, channels]) so the channel
contractions ride the MXU; optional bfloat16 compute with float32 params;
the output head is zero-initialized so an untrained model is an identity
mel-cepstrum mapping (keeps the end-to-end pipeline well-behaved before
training and makes golden tests deterministic).

Streaming contract: because every conv is zero-padded 'SAME' with odd
kernels, output frame t depends only on input frames
[t - context_frames, t + context_frames]; the streaming layer feeds that
halo and trims it, making streamed == offline exactly (tested).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from realtime_yukarin_tpu.config import AcousticModelConfig, DspConfig


class GLUConvBlock(nn.Module):
    hidden: int
    kernel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(2 * self.hidden, (self.kernel,), padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)                       # gated linear unit
        h = nn.Conv(self.hidden, (1,), dtype=self.dtype, name="proj")(h)
        return x + h


class AcousticNet(nn.Module):
    """[B, T, D_in] -> mel-cepstrum residual [B, T, mc_dim]."""

    cfg: AcousticModelConfig
    mc_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = nn.Conv(c.hidden, (1,), dtype=self.dtype, name="stem")(x)
        for i in range(c.num_blocks):
            h = GLUConvBlock(c.hidden, c.kernel_size, self.dtype,
                             name=f"block_{i}")(h)
        out = nn.Conv(self.mc_dim, (1,), dtype=self.dtype,
                      kernel_init=nn.initializers.zeros, name="head")(h)
        return out.astype(jnp.float32)


def acoustic_inputs(mc: jnp.ndarray, f0: jnp.ndarray,
                    model_cfg: AcousticModelConfig) -> jnp.ndarray:
    """Assemble the net input [..., T, D_in] from per-frame features.

    F0 enters as (log-f0 on voiced frames, voiced flag) — mirrors the
    reference's practice of conditioning the mc mapping on pitch while the
    actual F0 conversion happens outside the net (SURVEY.md §3.1).
    """
    feats = [mc]
    if model_cfg.use_f0_input:
        voiced = (f0 > 0).astype(mc.dtype)
        logf0 = jnp.where(f0 > 0, jnp.log(jnp.maximum(f0, 1.0)), 0.0)
        feats += [logf0[..., None], voiced[..., None]]
    return jnp.concatenate(feats, axis=-1)


def convert_mc(params, mc: jnp.ndarray, f0: jnp.ndarray,
               model_cfg: AcousticModelConfig, dsp_cfg: DspConfig,
               dtype=jnp.float32) -> jnp.ndarray:
    """Apply stage 1: mc' = mc + net(mc, f0).  Accepts [T, ...] or
    [B, T, ...]; time-batched under the hood."""
    net = AcousticNet(model_cfg, dsp_cfg.mc_dim, dtype)
    x = acoustic_inputs(mc, f0, model_cfg)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    out = net.apply(params, x)
    if squeeze:
        out = out[0]
    return mc + out
