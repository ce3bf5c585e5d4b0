"""End-to-end conversion pipelines (offline path; BASELINE config #1).

Counterpart of ``upstream:check.py`` (SURVEY.md §3.2): the golden path that
runs encode -> convert -> decode.  Unlike the reference (three stream
objects invoked sequentially in Python), the whole pipeline here is ONE
jitted function: analysis, both model stages, F0 transform, and synthesis
fuse into a single XLA program, so a full utterance never leaves the device
between stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config, resolve_vocoder_mode
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.synthesis import SynthCarry, synthesize
from realtime_yukarin_tpu.dsp.world import AcousticFeature, analyze
from realtime_yukarin_tpu.models.vocoder_nn import neural_vocode
from realtime_yukarin_tpu.models.vocoder_wave import waveform_vocode
from realtime_yukarin_tpu.models.voice_changer import (compute_dtype,
                                                       convert_features)
from realtime_yukarin_tpu.streaming.pipeline import frame_noise


def _extend_one_frame(feat: AcousticFeature) -> AcousticFeature:
    """Repeat the last frame: offline stand-in for the streaming layer's
    one-frame synthesis lookahead."""
    return AcousticFeature(
        f0=jnp.concatenate([feat.f0, feat.f0[-1:]]),
        env=jnp.concatenate([feat.env, feat.env[-1:]]),
        ap=jnp.concatenate([feat.ap, feat.ap[-1:]]),
        mc=jnp.concatenate([feat.mc, feat.mc[-1:]]),
    )


def noise_bins(cfg: Config) -> int:
    return prim.noise_fft_size(cfg.dsp.hop) // 2 + 1


@functools.partial(jax.jit,
                   static_argnames=("cfg", "num_frames", "use_sr",
                                    "use_neural_vocoder", "vocoder_mode"))
def offline_convert(params: dict, wave: jnp.ndarray, key: jax.Array,
                    cfg: Config, num_frames: int, use_sr: bool = True,
                    use_neural_vocoder: bool = False,
                    vocoder_mode: str | None = None) -> jnp.ndarray:
    """wave [T] -> converted wave [num_frames * hop], fully on-device."""
    mode = resolve_vocoder_mode(use_neural_vocoder, vocoder_mode)
    feat = analyze(wave, num_frames, cfg.dsp)
    conv = convert_features(params, feat, cfg, use_sr=use_sr)
    conv = _extend_one_frame(conv)
    # per-frame fold_in noise: identical scheme to the streaming path, so
    # streamed and offline outputs agree exactly (tests/test_streaming.py)
    noise = frame_noise(key, 0, num_frames, noise_bins(cfg))
    if mode == "ddsp":
        out, _ = neural_vocode(params["vocoder"], conv.f0, conv.env,
                               conv.ap, conv.mc, noise, cfg.vocoder_nn,
                               cfg.dsp, dtype=compute_dtype(cfg))
    elif mode == "wave":
        out, _ = waveform_vocode(params["vocoder_wave"], conv.f0, conv.env,
                                 conv.ap, conv.mc, noise, cfg.vocoder_wave,
                                 cfg.dsp, dtype=compute_dtype(cfg))
    else:
        out, _ = synthesize(conv.f0, conv.env, conv.ap, noise, cfg.dsp)
    return out


@functools.partial(jax.jit,
                   static_argnames=("cfg", "use_sr", "use_neural_vocoder",
                                    "vocoder_mode"))
def offline_convert_io(params: dict, wave_in: jnp.ndarray, key: jax.Array,
                       cfg: Config, use_sr: bool = True,
                       use_neural_vocoder: bool = False,
                       vocoder_mode: str | None = None) -> jnp.ndarray:
    """Client-rate offline conversion: wave at cfg.dsp.in_rate ->
    converted wave at cfg.dsp.out_rate, through the same resample plans
    the streaming step uses (so streamed == offline holds across rates).
    Identity plans make this exactly :func:`offline_convert`."""
    from realtime_yukarin_tpu.dsp.resample import resample_signal
    from realtime_yukarin_tpu.streaming.state import (StreamGeometry,
                                                      input_plan,
                                                      output_plan)
    mode = resolve_vocoder_mode(use_neural_vocoder, vocoder_mode)
    geo = StreamGeometry.from_config(cfg, use_sr, vocoder_mode=mode)
    x = resample_signal(wave_in, input_plan(cfg.dsp, geo.chunk_samples))
    hop = cfg.dsp.hop
    F = x.shape[0] // hop
    y = offline_convert(params, x[: F * hop], key, cfg, F, use_sr,
                        vocoder_mode=mode)
    return resample_signal(y, output_plan(cfg.dsp, geo.chunk_samples))


@functools.partial(jax.jit, static_argnames=("cfg", "num_frames"))
def offline_analyze(wave: jnp.ndarray, cfg: Config, num_frames: int
                    ) -> AcousticFeature:
    return analyze(wave, num_frames, cfg.dsp)


@functools.partial(jax.jit, static_argnames=("cfg",))
def offline_synthesize(feat: AcousticFeature, key: jax.Array, cfg: Config
                       ) -> jnp.ndarray:
    ext = _extend_one_frame(feat)
    F = feat.f0.shape[0]
    noise = frame_noise(key, 0, F, noise_bins(cfg))
    out, _ = synthesize(ext.f0, ext.env, ext.ap, noise, cfg.dsp)
    return out
