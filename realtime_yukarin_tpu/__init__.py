"""realtime_yukarin_tpu — a TPU-native streaming voice-conversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``Hiroshiba/realtime-yukarin`` (see SURVEY.md): WORLD-style acoustic feature
extraction (F0 / spectral envelope / band aperiodicity), a learned
acoustic-conversion stage (mel-cepstrum mapping + log-linear F0 moment
matching), spectral super-resolution, and harmonic+noise / neural vocoder
synthesis — all static-shape, jit-compiled, with explicit streaming carry
state that lives on-device across chunk invocations.

Layer map (TPU-native counterpart of SURVEY.md §1):

  dsp/        WORLD-equivalent analysis & synthesis in jnp (L0-L2 reborn)
  ops/        Pallas TPU kernels for the hot paths (STFT, mcep, synthesis)
  models/     acoustic converter, super-resolution, neural vocoder (L3)
  streaming/  static-shape chunk algebra + donated carry state (L4)
  parallel/   mesh/sharding/serving: DP streams, TP weights (L5 reborn)
  runtime/    native C++ host runtime: ring buffers, wav io, chunker
  training/   optax train steps, pjit-sharded (dp x model mesh)
  cli/        offline convert (check.py equiv) and realtime serve (run.py)
  golden/     pure-NumPy obviously-correct mirror used for allclose tests
"""

__version__ = "0.1.0"

from realtime_yukarin_tpu.config import Config  # noqa: F401
