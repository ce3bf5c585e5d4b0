"""Patch discriminator for adversarial stage-2 training.

SURVEY.md §2b: become-yukarin trains its super-resolution generator
adversarially — the discriminator exists only in training code, judging
(time x frequency) spectrogram patches real/fake.

TPU-first design mirrors the SR generator's MXU-native shape: a dense
frequency embedding (one [K]->[hidden] matmul per frame) followed by
strided gated time-convolutions, ending in one logit per time patch
(PatchGAN over time).  All hot ops are [rows, hidden] matmuls.
Input is the log-power envelope, the same domain the SR net works in.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from realtime_yukarin_tpu.config import DspConfig, SuperResolutionConfig


class EnvelopeDiscriminator(nn.Module):
    """[B, T, K] log-envelope -> [B, T // 2**num_down] patch logits."""

    hidden: int = 256
    num_down: int = 3            # time downsampling stages (stride 2)
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, logE: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden, dtype=self.dtype, name="freq_in")(
            logE.astype(self.dtype))
        h = nn.leaky_relu(h, 0.2)
        for i in range(self.num_down):
            h = nn.Conv(self.hidden, (self.kernel_size,), strides=(2,),
                        padding="SAME", dtype=self.dtype,
                        name=f"down_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return logit[..., 0].astype(jnp.float32)


def init_discriminator(key, cfg: SuperResolutionConfig, dsp: DspConfig,
                       hidden: int = 256, dtype=jnp.float32):
    net = EnvelopeDiscriminator(hidden=hidden, dtype=dtype)
    params = net.init(key, jnp.zeros((1, 16, dsp.spec_bins), jnp.float32))
    return net, params


# ---------------------------------------------------------------------------
# Hinge-GAN losses (standard for spectrogram patch discriminators)
# ---------------------------------------------------------------------------

def d_hinge_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray
                 ) -> jnp.ndarray:
    return (jnp.mean(nn.relu(1.0 - real_logits))
            + jnp.mean(nn.relu(1.0 + fake_logits)))


def g_hinge_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(fake_logits)
