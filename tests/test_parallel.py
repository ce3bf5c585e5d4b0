"""Parallelism tests on the virtual 8-device CPU mesh.

BASELINE config #5: batched multi-stream serving, data-parallel; params
model-sharded.  Tests: mesh/sharding construction, batched == single-stream
equivalence, training-step progress under dp x tp shardings.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import (AcousticModelConfig, Config,
                                         SuperResolutionConfig,
                                         VocoderNNConfig)
from realtime_yukarin_tpu.models.voice_changer import init_params
from realtime_yukarin_tpu.parallel.mesh import (make_mesh,
                                                model_shard_params)
from realtime_yukarin_tpu.parallel.serving import BatchedServer
from realtime_yukarin_tpu.streaming.stream import VoiceChangerStream
from realtime_yukarin_tpu.training.data import make_batch
from realtime_yukarin_tpu.training.train_step import (init_train_state,
                                                      make_sharded_train_step)

from conftest import make_test_signal


def tiny_config() -> Config:
    return Config(
        acoustic=AcousticModelConfig(hidden=32, num_blocks=2),
        super_resolution=SuperResolutionConfig(hidden=64, num_blocks=2),
        vocoder_nn=VocoderNNConfig(hidden=32, num_blocks=2),
    )


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(model_parallel=1)
    assert mesh1.shape == {"data": 8, "model": 1}


def test_model_shard_rule():
    mesh = make_mesh(model_parallel=2)
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    shardings = model_shard_params(mesh, params)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(spec and spec[-1] == "model" for spec in specs), \
        "at least some kernels should be model-sharded"


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_batched_server_matches_single_stream(model_parallel):
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    mesh = make_mesh(model_parallel=model_parallel)
    server = BatchedServer(params, cfg, num_streams=8, mesh=mesh, seed=3)
    S = server.chunk_samples

    x = make_test_signal("harmonic", 0.5, cfg.dsp.sample_rate
                         ).astype(np.float32)
    x = x[: (len(x) // S) * S]
    n_chunks = len(x) // S

    # stream 2 gets the signal; others get silence
    outs = []
    for k in range(n_chunks):
        chunks = np.zeros((8, S), np.float32)
        chunks[2] = x[k * S: (k + 1) * S]
        outs.append(server.step(chunks))
    batched_out = np.concatenate([o[2] for o in outs])

    single = VoiceChangerStream(
        params, cfg, key=jax.random.fold_in(jax.random.key(3), 2))
    single.add(x)
    single_out = single.process()
    # model-sharded dense layers change reduction order (GSPMD collectives),
    # so allow small numerical drift vs the unsharded single-stream path
    np.testing.assert_allclose(batched_out, single_out[: len(batched_out)],
                               rtol=0, atol=3e-3)


def test_train_step_reduces_loss():
    cfg = tiny_config()
    mesh = make_mesh(model_parallel=2)
    params = init_params(jax.random.key(0), cfg)
    step, shard_state, shard_batch = make_sharded_train_step(cfg, mesh)
    state = shard_state(init_train_state(params))
    batch = shard_batch(make_batch(cfg, batch_size=4, seconds=0.2, seed=1))

    first = None
    for _ in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_stream_reset():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    server = BatchedServer(params, cfg, num_streams=8,
                           mesh=make_mesh(model_parallel=1))
    S = server.chunk_samples
    server.step(np.random.default_rng(0).standard_normal((8, S)).astype(
        np.float32) * 0.1)
    server.reset_stream(3)
    carry3 = jax.tree.map(lambda c: np.asarray(c[3]), server._carries)
    assert float(np.abs(carry3.wave_buf).max()) == 0.0


def test_multihost_helpers_single_process():
    """multihost glue runs identically at 1 host: init is a no-op,
    host_local_to_global == device_put with the 'data' sharding, and the
    global batch drives the sharded train step."""
    from realtime_yukarin_tpu.parallel.multihost import (
        broadcast_from_host0, global_batch_size, host_local_to_global,
        init_multihost, sync_hosts)

    pid, pcount = init_multihost()          # no coordinator -> no-op
    assert (pid, pcount) == (0, 1)
    assert global_batch_size(4) == 4
    sync_hosts("test")                      # no-op single-process

    cfg = tiny_config()
    mesh = make_mesh(model_parallel=2)
    batch = make_batch(cfg, batch_size=4, seconds=0.2, seed=0)
    gbatch = host_local_to_global(mesh, batch)
    for loc, glob in zip(jax.tree.leaves(batch), jax.tree.leaves(gbatch)):
        assert glob.sharding.spec[0] == "data"
        np.testing.assert_array_equal(np.asarray(glob), np.asarray(loc))

    params = broadcast_from_host0(init_params(jax.random.key(0), cfg))
    step, shard_state, _ = make_sharded_train_step(cfg, mesh)
    state = shard_state(init_train_state(params))
    state, metrics = step(state, gbatch)
    assert np.isfinite(float(metrics["loss"]))


def test_live_mask_pauses_streams():
    """A False live lane keeps its carry frozen and emits zeros, so a slow
    producer's stream state is never polluted with forced silence."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    server = BatchedServer(params, cfg, num_streams=8,
                           mesh=make_mesh(model_parallel=1))
    S = server.chunk_samples
    rng = np.random.default_rng(0)
    chunks = rng.standard_normal((8, S)).astype(np.float32) * 0.1

    carry3_before = jax.tree.map(lambda c: np.asarray(c[3]),
                                 server._carries)
    live = np.ones(8, bool)
    live[3] = False
    out = server.step(chunks, live=live)

    assert np.abs(out[3]).max() == 0.0, "paused lane must emit zeros"
    assert np.abs(out[0]).max() >= 0.0 and np.isfinite(out).all()
    carry3_after = jax.tree.map(lambda c: np.asarray(c[3]), server._carries)
    for a, b in zip(jax.tree.leaves(carry3_before),
                    jax.tree.leaves(carry3_after)):
        np.testing.assert_array_equal(a, b)
    # other lanes DID advance
    c0 = jax.tree.map(lambda c: np.asarray(c[0]), server._carries)
    assert float(np.abs(c0.wave_buf).max()) > 0.0


def test_num_streams_rounds_to_mesh():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    server = BatchedServer(params, cfg, num_streams=5,
                           mesh=make_mesh(model_parallel=1))
    assert server.num_streams == 8   # rounded up to the data axis
    out = server.step(np.zeros((8, server.chunk_samples), np.float32))
    assert out.shape[0] == 8
