"""Test harness: run everything on a virtual 8-device CPU mesh.

Per the build environment contract, sharding/multichip tests use
``xla_force_host_platform_device_count`` CPU devices; real-TPU runs happen
in the driver's bench step.  Must be set before jax initializes.
"""

import os

# Hard override: the environment may default JAX_PLATFORMS to a remote TPU
# plugin; unit tests must run on local CPU devices regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already (remote TPU plugin boot), in
# which case the env var above came too late — update the live config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from realtime_yukarin_tpu.config import Config, DspConfig  # noqa: E402


@pytest.fixture(scope="session")
def cfg() -> Config:
    return Config()


@pytest.fixture(scope="session")
def dsp_cfg() -> DspConfig:
    return DspConfig()


def make_test_signal(kind: str, seconds: float, fs: int,
                     seed: int = 0) -> np.ndarray:
    """Deterministic test signals shared across golden-parity tests."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    if kind == "harmonic":
        return (0.5 * np.sin(2 * np.pi * 160 * t)
                + 0.2 * np.sin(2 * np.pi * 320 * t)
                + 0.05 * np.sin(2 * np.pi * 480 * t)
                + 0.01 * rng.standard_normal(len(t)))
    if kind == "sweep":
        f0 = 150 + 50 * np.sin(2 * np.pi * 2.5 * t)
        ph = 2 * np.pi * np.cumsum(f0) / fs
        return (0.4 * np.sin(ph) + 0.15 * np.sin(2 * ph)
                + 0.08 * np.sin(3 * ph)
                + 0.02 * rng.standard_normal(len(t)))
    if kind == "noise":
        return 0.3 * rng.standard_normal(len(t))
    if kind == "weakfund":
        # adversarial octave trap (VERDICT r1 #5): weak fundamental under
        # a dominant 2nd harmonic — naive first-dip YIN locks onto 290 Hz
        f0 = 145.0
        return (0.06 * np.sin(2 * np.pi * f0 * t)
                + 0.5 * np.sin(2 * np.pi * 2 * f0 * t)
                + 0.03 * np.sin(2 * np.pi * 3 * f0 * t)
                + 0.01 * rng.standard_normal(len(t)))
    if kind == "speechlike":
        # voiced/unvoiced alternation with AM
        f0 = 120 + 60 * np.sin(2 * np.pi * 1.5 * t)
        ph = 2 * np.pi * np.cumsum(f0) / fs
        gate = (np.sin(2 * np.pi * 0.8 * t) > -0.3).astype(float)
        am = 0.3 + 0.2 * np.sin(2 * np.pi * 3.0 * t)
        return (gate * am * (np.sin(ph) + 0.4 * np.sin(2 * ph))
                + 0.03 * rng.standard_normal(len(t)))
    raise ValueError(kind)
