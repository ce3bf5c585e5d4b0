"""Prepared-corpus dataset: npz pair files -> fixed-shape training Batches.

Consumes the output of ``training.corpus.prepare_corpus`` (one npz per
aligned utterance pair).  Crops random fixed-length windows so every batch
has one static shape ([B, F+1, ...]) — the jit/pjit contract.

``wave_tgt`` (the neural vocoder's multi-resolution-STFT target) is
rendered on-device from the *aligned target features* with the
deterministic DSP synthesizer: the neural vocoder trains as a refinement
of WORLD-equivalent synthesis (its zero-init heads start exactly there,
models/vocoder_nn.py), so the DSP render of the ground-truth features is
the natural distillation target when time-warped raw audio doesn't exist.
"""

from __future__ import annotations

import pathlib

import numpy as np

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.synthesis import synthesize
from realtime_yukarin_tpu.training.train_step import Batch


class CorpusDataset:
    """Random-crop batch sampler over prepared pair npz files."""

    def __init__(self, prepared_dir: str, cfg: Config, crop_frames: int = 100,
                 seed: int = 0):
        d = pathlib.Path(prepared_dir)
        self._files = sorted(p for p in d.glob("*.npz")
                             if not p.stem.startswith("stats"))
        if not self._files:
            raise FileNotFoundError(f"no pair npz files in {prepared_dir}")
        self._data = [dict(np.load(p)) for p in self._files]
        self._cfg = cfg
        self._F = crop_frames
        self._rng = np.random.default_rng(seed)
        self._k_noise = prim.noise_fft_size(cfg.dsp.hop) // 2 + 1

        @jax.jit
        def _render(f0, env, ap, noise):
            out, _ = jax.vmap(
                lambda a, b, c, n: synthesize(a, b, c, n, cfg.dsp))(
                    f0, env, ap, noise)
            return out

        self._render = _render

    @property
    def num_utterances(self) -> int:
        return len(self._files)

    def _crop(self, arr: np.ndarray, start: int, n: int) -> np.ndarray:
        """Window of n frames starting at ``start``, edge-padded if short."""
        F = arr.shape[0]
        if F >= start + n:
            return arr[start: start + n]
        pad = start + n - F
        reps = np.repeat(arr[-1:], pad, axis=0)
        return np.concatenate([arr[start:], reps], axis=0)

    def sample_batch(self, batch_size: int) -> Batch:
        F = self._F
        rows = {k: [] for k in ("f0_src", "mc_src", "ap_src",
                                "f0_tgt", "mc_tgt", "env_tgt", "ap_tgt")}
        for _ in range(batch_size):
            u = self._data[self._rng.integers(len(self._data))]
            max_start = max(0, u["f0_src"].shape[0] - (F + 1))
            s = int(self._rng.integers(max_start + 1))
            for k in rows:
                rows[k].append(self._crop(u[k], s, F + 1))
        stack = {k: jnp.asarray(np.stack(v), jnp.float32)
                 for k, v in rows.items()}
        noise = jnp.asarray(self._rng.standard_normal(
            (batch_size, F, self._k_noise, 2)), jnp.float32)
        wave_tgt = self._render(stack["f0_tgt"], stack["env_tgt"],
                                stack["ap_tgt"], noise)
        return Batch(f0_src=stack["f0_src"], mc_src=stack["mc_src"],
                     ap_src=stack["ap_src"], f0_tgt=stack["f0_tgt"],
                     mc_tgt=stack["mc_tgt"], env_tgt=stack["env_tgt"],
                     wave_tgt=wave_tgt, noise=noise)
