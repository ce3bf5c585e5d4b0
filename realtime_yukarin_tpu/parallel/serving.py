"""Batched multi-stream serving (BASELINE config #5).

Re-design of the reference's single-stream desktop loop: N concurrent
realtime conversion streams run as ONE batched device program — per-stream
carry state is a [N, ...] pytree sharded over the mesh 'data' axis right
alongside the batch, parameters are replicated (or 'model'-sharded), and
one ``batched_step`` call advances every stream by one chunk.  Streams
join/leave by resetting their carry slot (silence-fill contract).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.parallel.mesh import (DATA_AXIS, make_mesh,
                                                model_shard_params,
                                                replicated,
                                                shard_batch_pytree)
from realtime_yukarin_tpu.streaming.pipeline import streaming_step_impl
from realtime_yukarin_tpu.streaming.state import StreamCarry, StreamGeometry


def batched_carry_init(cfg: Config, geo: StreamGeometry, num_streams: int
                       ) -> StreamCarry:
    one = StreamCarry.init(cfg, geo)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_streams,) + x.shape).copy(),
        one)


def make_batched_step(cfg: Config, mesh: Mesh, use_sr: bool = True,
                      use_neural_vocoder: bool = False):
    """Build the pjit-compiled batched streaming step.

    Returns step(params, carries, chunks [N, S], keys [N], live [N]) ->
    (out [N, S], carries').  carries/chunks/keys/live shard over 'data';
    params shard per ``model_shard_params``; the carry is donated.

    ``live`` masks which streams advance this tick: a False lane keeps its
    previous carry and emits zeros, so a stream whose producer hasn't
    delivered a chunk yet can be PAUSED instead of force-fed silence
    (which would roll zeros into its analysis window and OLA state).
    """

    def _one(params, carry, chunk, key, live):
        out, new_carry = streaming_step_impl(params, carry, chunk, key, cfg,
                                             use_sr, use_neural_vocoder)
        keep = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(live, (1,) * new.ndim), new, old),
            new_carry, carry)
        return jnp.where(live, out, 0.0), keep

    vstep = jax.vmap(_one, in_axes=(None, 0, 0, 0, 0))

    def step(params, carries, chunks, keys, live):
        return vstep(params, carries, chunks, keys, live)

    return jax.jit(step, donate_argnums=(1,))


class BatchedServer:
    """Host-side N-stream server.

    The reference handled exactly one mic; this serves ``num_streams``
    concurrent callers with one device program per chunk tick.  Stream
    lifecycle: ``reset_stream(i)`` re-zeros slot i's carry (drop/rejoin,
    SURVEY.md §5 failure-handling row).
    """

    def __init__(self, params: dict, cfg: Config, num_streams: int | None
                 = None, mesh: Mesh | None = None, use_sr: bool = True,
                 use_neural_vocoder: bool = False, seed: int = 0):
        self._cfg = cfg
        self._mesh = mesh if mesh is not None else make_mesh()
        n = num_streams or cfg.serving.num_streams
        dp = self._mesh.shape[DATA_AXIS]
        n = -(-n // dp) * dp          # round up to the data-axis size
        self._geo = StreamGeometry.from_config(cfg, use_sr,
                                               use_neural_vocoder)
        self._step = make_batched_step(cfg, self._mesh, use_sr,
                                       use_neural_vocoder)

        carries = batched_carry_init(cfg, self._geo, n)
        self._carry_shardings = shard_batch_pytree(self._mesh, carries)
        self._carries = jax.device_put(carries, self._carry_shardings)
        self._params = jax.device_put(params,
                                      model_shard_params(self._mesh, params))
        self._keys = jax.device_put(
            jax.vmap(lambda i: jax.random.fold_in(jax.random.key(seed), i))(
                jnp.arange(n)),
            NamedSharding(self._mesh, P(DATA_AXIS)))
        self._chunk_sharding = NamedSharding(self._mesh, P(DATA_AXIS, None))
        self._live_sharding = NamedSharding(self._mesh, P(DATA_AXIS))
        self.num_streams = n

    @property
    def chunk_samples(self) -> int:
        return self._geo.chunk_samples

    @property
    def latency_samples(self) -> int:
        return self._geo.latency_samples(self._cfg.dsp.hop)

    def _live_mask(self, live) -> jnp.ndarray:
        if live is None:
            live = np.ones((self.num_streams,), bool)
        return jax.device_put(jnp.asarray(live, bool), self._live_sharding)

    def step(self, chunks: np.ndarray, live=None) -> np.ndarray:
        """chunks [N, chunk_samples] -> converted [N, chunk_samples].

        ``live`` (optional [N] bool) pauses False lanes: their carry is
        kept and their output is zeros."""
        x = jax.device_put(jnp.asarray(chunks, jnp.float32),
                           self._chunk_sharding)
        out, self._carries = self._step(self._params, self._carries, x,
                                        self._keys, self._live_mask(live))
        return np.asarray(out)

    def step_device(self, chunks: jnp.ndarray, live=None) -> jnp.ndarray:
        """Device-resident variant (no host copies) for benchmarking."""
        out, self._carries = self._step(self._params, self._carries, chunks,
                                        self._keys, self._live_mask(live))
        return out

    def reset_stream(self, i: int) -> None:
        one = StreamCarry.init(self._cfg, self._geo)
        self._carries = jax.tree.map(
            lambda c, o: c.at[i].set(o), self._carries, one)
