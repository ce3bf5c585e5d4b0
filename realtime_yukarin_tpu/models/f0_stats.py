"""Log-linear F0 moment matching (yukarin ``F0Statistics`` role).

SURVEY.md §3.1: the reference converts F0 *outside* the neural nets by
matching log-domain moments of the source and target speakers:

    log f0' = (log f0 - mu_src) / sigma_src * sigma_tgt + mu_tgt

Statistics files correspond to the reference's ``input_statistics.npy`` /
``target_statistics.npy`` (SURVEY.md §2a, config row).
"""

from __future__ import annotations

import dataclasses
import pathlib

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class F0Statistics:
    mean: float      # mean of log-f0 over voiced frames
    std: float       # std of log-f0 over voiced frames

    @classmethod
    def from_f0(cls, f0: np.ndarray) -> "F0Statistics":
        voiced = f0[f0 > 0]
        if voiced.size == 0:
            raise ValueError(
                "no voiced frames — cannot estimate F0 statistics")
        logs = np.log(voiced)
        return cls(mean=float(logs.mean()), std=float(logs.std()))

    @classmethod
    def load(cls, path: str | pathlib.Path) -> "F0Statistics":
        d = np.load(path, allow_pickle=False)
        return cls(mean=float(d["mean"]), std=float(d["std"]))

    def save(self, path: str | pathlib.Path) -> None:
        np.savez(path, mean=self.mean, std=self.std)


def convert_f0(f0: jnp.ndarray, src: F0Statistics, tgt: F0Statistics
               ) -> jnp.ndarray:
    """Voiced-masked log-linear moment matching; unvoiced stays 0."""
    voiced = f0 > 0
    logf0 = jnp.log(jnp.maximum(f0, 1e-6))
    conv = jnp.exp((logf0 - src.mean) / max(src.std, 1e-6) * tgt.std
                   + tgt.mean)
    return jnp.where(voiced, conv, 0.0)
