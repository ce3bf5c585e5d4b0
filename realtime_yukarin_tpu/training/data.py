"""Synthetic paired-speaker data for training/tests.

No speech corpora exist in this environment (zero egress), so training
plumbing is exercised with self-generated pairs: a "source speaker"
harmonic+noise utterance and a "target speaker" version derived by a known
transform (F0 ratio + spectral tilt + formant-ish warp).  The DSP analysis
of both sides yields exactly the feature pairs the real trainers would use
(yukarin: aligned mc pairs; become-yukarin: envelope pairs, SURVEY.md §2b).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.world import analyze
from realtime_yukarin_tpu.training.train_step import Batch


def synth_utterance(rng: np.random.Generator, seconds: float, fs: int,
                    f0_base: float, tilt: float) -> np.ndarray:
    """Randomized harmonic+noise utterance with voiced/unvoiced segments."""
    n = int(seconds * fs)
    t = np.arange(n) / fs
    f0 = f0_base * (1.0 + 0.15 * np.sin(2 * np.pi * rng.uniform(1, 4) * t)
                    + 0.05 * rng.standard_normal())
    ph = 2 * np.pi * np.cumsum(f0) / fs
    gate = (np.sin(2 * np.pi * rng.uniform(0.5, 1.5) * t
                   + rng.uniform(0, 6)) > -0.4).astype(float)
    x = np.zeros(n)
    for h in range(1, 9):
        amp = (1.0 / h) * np.exp(-tilt * h)
        x += amp * np.sin(h * ph)
    am = 0.25 + 0.15 * np.sin(2 * np.pi * rng.uniform(2, 5) * t)
    return (gate * am * x + 0.02 * rng.standard_normal(n)).astype(np.float32)


def make_batch(cfg: Config, batch_size: int, seconds: float = 0.5,
               seed: int = 0, f0_ratio: float = 1.4,
               tilt_src: float = 0.1, tilt_tgt: float = 0.3) -> Batch:
    """Analyzes source/target pairs into a training Batch (host-side)."""
    rng = np.random.default_rng(seed)
    fs = cfg.dsp.sample_rate
    hop = cfg.dsp.hop
    F = int(seconds * fs) // hop
    k_noise = prim.noise_fft_size(hop) // 2 + 1

    f0s, mcs, aps = [], [], []
    f0t, mct, envt, wavet = [], [], [], []
    for b in range(batch_size):
        base = rng.uniform(110, 220)
        src = synth_utterance(rng, seconds, fs, base, tilt_src)
        tgt = synth_utterance(rng, seconds, fs, base * f0_ratio, tilt_tgt)
        fs_feat = analyze(jnp.asarray(src[: F * hop]), F, cfg.dsp)
        ft_feat = analyze(jnp.asarray(tgt[: F * hop]), F, cfg.dsp)

        def ext(a):
            return np.concatenate([np.asarray(a), np.asarray(a)[-1:]], 0)

        f0s.append(ext(fs_feat.f0))
        mcs.append(ext(fs_feat.mc))
        aps.append(ext(fs_feat.ap))
        f0t.append(ext(ft_feat.f0))
        mct.append(ext(ft_feat.mc))
        envt.append(ext(ft_feat.env))
        wavet.append(tgt[: F * hop])

    noise = rng.standard_normal((batch_size, F, k_noise, 2)).astype(
        np.float32)
    return Batch(
        f0_src=jnp.asarray(np.stack(f0s), jnp.float32),
        mc_src=jnp.asarray(np.stack(mcs), jnp.float32),
        ap_src=jnp.asarray(np.stack(aps), jnp.float32),
        f0_tgt=jnp.asarray(np.stack(f0t), jnp.float32),
        mc_tgt=jnp.asarray(np.stack(mct), jnp.float32),
        env_tgt=jnp.asarray(np.stack(envt), jnp.float32),
        wave_tgt=jnp.asarray(np.stack(wavet), jnp.float32),
        noise=jnp.asarray(noise),
    )
