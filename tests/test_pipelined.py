"""Pipelined dispatch-ahead server tests (runtime/pipelined.py).

The pipelined path must be byte-identical to the synchronous
VoiceChangerStream on the same input — dispatch-ahead reorders only *when*
host syncs happen, never the math (noise is position-deterministic).
"""

from __future__ import annotations

import numpy as np

import jax

from conftest import make_test_signal
from realtime_yukarin_tpu.config import (AcousticModelConfig, Config,
                                         SuperResolutionConfig,
                                         VocoderNNConfig)
from realtime_yukarin_tpu.models.voice_changer import init_params
from realtime_yukarin_tpu.runtime.pipelined import PipelinedStream
from realtime_yukarin_tpu.streaming.stream import VoiceChangerStream


def tiny_config() -> Config:
    return Config(
        acoustic=AcousticModelConfig(hidden=32, num_blocks=2),
        super_resolution=SuperResolutionConfig(hidden=64, num_blocks=2),
        vocoder_nn=VocoderNNConfig(hidden=32, num_blocks=2),
    )


def test_pipelined_equals_synchronous():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    x = make_test_signal("speechlike", 0.8, cfg.dsp.sample_rate).astype(
        np.float32)

    sync = VoiceChangerStream(params, cfg, seed=0)
    S = sync.chunk_samples
    n_chunks = len(x) // S
    x = x[: n_chunks * S]
    sync.add(x)
    ref = np.concatenate([sync.process(), sync.flush()])

    with PipelinedStream(params, cfg, seed=0, depth=2) as pipe:
        pipe.push_input(x)
        pipe.flush()
        got = pipe.pop_output(pipe.output_available())

    n = min(len(ref), len(got))
    assert n >= len(x)                       # all input samples came back
    np.testing.assert_array_equal(got[:n], ref[:n])
    assert pipe.metrics.chunk_latency.count >= n_chunks
    assert pipe.metrics.counters.get("output_underruns", 0) == 0


def test_pipelined_silence_on_underrun():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    with PipelinedStream(params, cfg, seed=0) as pipe:
        out = pipe.pop_output(256)           # nothing produced yet
        np.testing.assert_array_equal(out, np.zeros(256, np.float32))
        assert pipe.metrics.counters["output_underruns"] == 1


def test_pipelined_depth_one_and_three():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    x = make_test_signal("harmonic", 0.4, cfg.dsp.sample_rate).astype(
        np.float32)
    outs = []
    for depth in (1, 3):
        with PipelinedStream(params, cfg, seed=0, depth=depth) as pipe:
            pipe.push_input(x)
            pipe.flush()
            outs.append(pipe.pop_output(pipe.output_available()))
    n = min(map(len, outs))
    np.testing.assert_array_equal(outs[0][:n], outs[1][:n])
