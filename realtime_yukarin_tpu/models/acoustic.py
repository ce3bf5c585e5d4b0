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
import jax
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


# ---------------------------------------------------------------------------
# Streaming forward with per-layer activation caches (VERDICT r1 weak #1).
#
# The fused streaming step used to re-run the whole stack over the full
# Fn-frame analysis window every chunk although only Fc frames are new.
# Here every block carries its last (kernel-1) input frames across steps,
# so each layer computes exactly Fc fresh frames per chunk (VALID conv over
# the cache + the new frames).  Because the kernels are symmetric (SAME,
# odd k), block l's output frontier lags its input frontier by k//2 frames;
# the whole stack's output lags ``context_frames`` — which the stream
# geometry already budgets for (StreamGeometry.model_ctx), so caching
# changes per-step COST, not latency.  Interior SAME-conv outputs equal
# VALID-conv outputs over the same taps, so this is bit-identical to the
# full-window forward (tested exactly in tests/test_models.py).
# ---------------------------------------------------------------------------

def _conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
            dtype) -> jnp.ndarray:
    """VALID 1-D conv, same primitive + layout flax.linen.Conv lowers to
    (conv_general_dilated, NWC/WIO) so interior outputs match bitwise."""
    y = jax.lax.conv_general_dilated(
        x[None].astype(dtype), kernel.astype(dtype), (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))[0]
    return y + bias.astype(dtype)


def _glu_block_fresh(block_params, z_in: jnp.ndarray, dtype) -> jnp.ndarray:
    """One GLUConvBlock on [T, H] input, VALID: returns [T - (k-1), H]."""
    k = block_params["conv"]["kernel"].shape[0]
    h = _conv1d(z_in, block_params["conv"]["kernel"],
                block_params["conv"]["bias"], dtype)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * nn.sigmoid(b)
    h = _conv1d(h, block_params["proj"]["kernel"],
                block_params["proj"]["bias"], dtype)
    half = (k - 1) // 2
    return z_in[half: z_in.shape[0] - half] + h      # residual at centers


def convert_mc_streamed(params, mc_new: jnp.ndarray, f0_new: jnp.ndarray,
                        caches: tuple, model_cfg: AcousticModelConfig,
                        dtype=jnp.float32
                        ) -> tuple[jnp.ndarray, tuple]:
    """Advance the stage-1 stack by the Fc newest input frames.

    mc_new/f0_new: features of input frames [F - Fc, F) (F = frontier).
    caches: per-block [k-1, hidden] input tails (``stage1_cache_init``).
    Returns (residual [Fc, mc_dim] float32 for OUTPUT frames
    [F - ctx - Fc, F - ctx), new caches).  Add the residual to the mc of
    those same (ctx-lagged) frames to finish ``mc' = mc + net(...)``.
    """
    p = params["params"]
    x = acoustic_inputs(mc_new, f0_new, model_cfg)
    z = _conv1d(x, p["stem"]["kernel"], p["stem"]["bias"], dtype)
    new_caches = []
    for i in range(model_cfg.num_blocks):
        z_in = jnp.concatenate([caches[i], z])
        new_caches.append(z_in[-(model_cfg.kernel_size - 1):])
        z = _glu_block_fresh(p[f"block_{i}"], z_in, dtype)
    out = _conv1d(z, p["head"]["kernel"], p["head"]["bias"], dtype)
    return out.astype(jnp.float32), tuple(new_caches)


def stage1_cache_init(params, mc_sil_row: jnp.ndarray,
                      f0_sil_row: jnp.ndarray,
                      model_cfg: AcousticModelConfig, dtype=jnp.float32
                      ) -> tuple[tuple, jnp.ndarray]:
    """Per-block caches equal to what an infinite all-silence history
    produces: every layer's activation is constant in time over constant
    input, so each cache is k-1 copies of that layer's interior value.
    Also returns the interior RESIDUAL row [mc_dim] (float32) — the
    stage-1 output on silence is mc_sil_row + that residual."""
    p = params["params"]
    k = model_cfg.kernel_size
    x = acoustic_inputs(mc_sil_row[None], f0_sil_row[None], model_cfg)
    z = _conv1d(x, p["stem"]["kernel"], p["stem"]["bias"], dtype)   # [1, H]
    caches = []
    for i in range(model_cfg.num_blocks):
        caches.append(jnp.tile(z, (k - 1, 1)))
        z_in = jnp.tile(z, (k, 1))              # k taps of the constant
        z = _glu_block_fresh(p[f"block_{i}"], z_in, dtype)          # [1, H]
    res = _conv1d(z, p["head"]["kernel"], p["head"]["bias"], dtype)
    return tuple(caches), res[0].astype(jnp.float32)
