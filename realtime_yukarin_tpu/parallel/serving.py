"""Batched multi-stream serving (BASELINE config #5).

Re-design of the reference's single-stream desktop loop: N concurrent
realtime conversion streams run as ONE batched device program — per-stream
carry state is a [N, ...] pytree sharded over the mesh 'data' axis right
alongside the batch, parameters are replicated (or 'model'-sharded), and
one ``batched_step`` call advances every stream by one chunk.  Streams
join/leave by resetting their carry slot (silence-fill contract).

Multi-host: every host runs this same program over one global mesh.  Each
host holds only its local clients' audio, so the input edge assembles
host-local ``[n_local, S]`` chunk blocks into global batch-sharded arrays
(``parallel.multihost.host_local_to_global``) and the output edge reads
back only this host's rows (``host_local_rows``).  Stream resets ride
*inside* the collective step as a per-lane mask — an out-of-band eager
reset is impossible at N hosts, where every computation on a global array
must be entered by all processes together.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from realtime_yukarin_tpu.config import Config, resolve_vocoder_mode
from realtime_yukarin_tpu.parallel.mesh import (DATA_AXIS, make_mesh,
                                                model_shard_specs,
                                                shard_batch_pytree)
from realtime_yukarin_tpu.parallel.multihost import (host_local_rows,
                                                     host_local_to_global,
                                                     put_global)
from realtime_yukarin_tpu.streaming.pipeline import streaming_step_impl
from realtime_yukarin_tpu.streaming.state import StreamCarry, StreamGeometry


def make_batched_step(cfg: Config, mesh: Mesh, use_sr: bool = True,
                      use_neural_vocoder: bool = False,
                      vocoder_mode: str | None = None):
    """Build the pjit-compiled batched streaming step.

    Returns step(params, init_carry, carries, chunks [N, S], keys [N],
    live [N], reset [N]) -> (out [N, S], carries').  carries/chunks/keys/
    live/reset shard over 'data'; params and the single-slot ``init_carry``
    replicate (or 'model'-shard); the carry is donated.

    ``live`` masks which streams advance this tick: a False lane keeps its
    previous carry and emits zeros, so a stream whose producer hasn't
    delivered a chunk yet can be PAUSED instead of force-fed silence
    (which would roll zeros into its analysis window and OLA state).

    ``reset`` re-zeros a lane's carry *before* this tick's chunk — the
    drop/rejoin contract (SURVEY.md §5 failure-handling row) expressed as
    part of the one collective program so it works identically at 1 and N
    hosts.
    """

    def _one(params, init_c, carry, chunk, key, live, reset):
        carry = jax.tree.map(
            lambda i, c: jnp.where(jnp.reshape(reset, (1,) * c.ndim), i, c),
            init_c, carry)
        out, new_carry = streaming_step_impl(
            params, carry, chunk, key, cfg, use_sr,
            vocoder_mode=resolve_vocoder_mode(use_neural_vocoder,
                                              vocoder_mode))
        keep = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(live, (1,) * new.ndim), new, old),
            new_carry, carry)
        return jnp.where(live, out, 0.0), keep

    vstep = jax.vmap(_one, in_axes=(None, None, 0, 0, 0, 0, 0))

    def step(params, init_carry, carries, chunks, keys, live, reset):
        return vstep(params, init_carry, carries, chunks, keys, live, reset)

    return jax.jit(step, donate_argnums=(2,))


class BatchedServer:
    """Host-side N-stream server.

    The reference handled exactly one mic; this serves ``num_streams``
    concurrent callers with one device program per chunk tick.  Single
    process, feed the full batch with :meth:`step`; at N hosts every host
    feeds its own rows with :meth:`step_local` (``local_slots`` says which
    global slots those are).  Stream lifecycle: ``reset_stream(i)`` (or a
    reset mask passed to step) re-zeros slot i's carry (drop/rejoin).
    """

    def __init__(self, params: dict, cfg: Config, num_streams: int | None
                 = None, mesh: Mesh | None = None, use_sr: bool = True,
                 use_neural_vocoder: bool = False, seed: int = 0,
                 vocoder_mode: str | None = None):
        mode = resolve_vocoder_mode(use_neural_vocoder, vocoder_mode)
        self._cfg = cfg
        self._mesh = mesh if mesh is not None else make_mesh()
        n = num_streams or cfg.serving.num_streams
        dp = self._mesh.shape[DATA_AXIS]
        n = -(-n // dp) * dp          # round up to the data-axis size
        self._geo = StreamGeometry.from_config(cfg, use_sr,
                                               vocoder_mode=mode)
        self._step = make_batched_step(cfg, self._mesh, use_sr,
                                       vocoder_mode=mode)

        # init through jit-with-out-shardings: at N processes this is one
        # collective program materializing each host's shards — a plain
        # device_put of host arrays cannot target non-addressable devices
        one = StreamCarry.init(cfg, self._geo, params, vocoder_mode=mode)
        carry_shardings = shard_batch_pytree(
            self._mesh, jax.tree.map(lambda x: jnp.zeros((n,) + x.shape),
                                     one))
        self._carries = jax.jit(
            lambda: jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), one),
            out_shardings=carry_shardings)()
        self._init_carry = jax.jit(
            lambda: one,
            out_shardings=jax.tree.map(
                lambda x: NamedSharding(self._mesh, P()), one))()
        self._keys = jax.jit(
            lambda: jax.vmap(
                lambda i: jax.random.fold_in(jax.random.key(seed), i))(
                    jnp.arange(n)),
            out_shardings=NamedSharding(self._mesh, P(DATA_AXIS)))()
        self._params = put_global(self._mesh,
                                  jax.tree.map(np.asarray, params),
                                  model_shard_specs(self._mesh, params))
        self._chunk_sharding = NamedSharding(self._mesh, P(DATA_AXIS, None))
        self._mask_sharding = NamedSharding(self._mesh, P(DATA_AXIS))
        self.num_streams = n
        lo, hi, _ = host_local_rows(self._carries.frame_pos)
        self.local_slots = range(lo, hi)

    @property
    def chunk_samples(self) -> int:
        """Input chunk size (samples at cfg.dsp.in_rate)."""
        return self._geo.chunk_in_samples

    @property
    def chunk_out_samples(self) -> int:
        """Output chunk size (samples at cfg.dsp.out_rate)."""
        return self._geo.chunk_out_samples

    @property
    def latency_samples(self) -> int:
        """End-to-end delay in OUTPUT-rate samples."""
        return self._geo.latency_out_samples(self._cfg.dsp)

    def _mask(self, m, default: bool, n: int) -> np.ndarray:
        if m is None:
            return np.full((n,), default, bool)
        m = np.asarray(m, bool)
        assert m.shape == (n,), (m.shape, n)
        return m

    # -- single-process (global-batch) API ---------------------------------

    def step(self, chunks: np.ndarray, live=None, reset=None) -> np.ndarray:
        """chunks [N, chunk_samples] -> converted [N, chunk_out_samples].

        ``live`` (optional [N] bool) pauses False lanes: their carry is
        kept and their output is zeros.  ``reset`` ([N] bool) re-zeros a
        lane's carry before processing its chunk."""
        if jax.process_count() > 1:
            raise RuntimeError("multi-process run: each host must feed its "
                               "own rows via step_local()")
        n = self.num_streams
        x = jax.device_put(jnp.asarray(chunks, jnp.float32),
                           self._chunk_sharding)
        live = jax.device_put(jnp.asarray(self._mask(live, True, n)),
                              self._mask_sharding)
        reset = jax.device_put(jnp.asarray(self._mask(reset, False, n)),
                               self._mask_sharding)
        out, self._carries = self._step(self._params, self._init_carry,
                                        self._carries, x, self._keys, live,
                                        reset)
        return np.asarray(out)

    def step_device(self, chunks: jnp.ndarray, live=None) -> jnp.ndarray:
        """Device-resident variant (no host copies) for benchmarking."""
        n = self.num_streams
        live = jax.device_put(jnp.asarray(self._mask(live, True, n)),
                              self._mask_sharding)
        reset = jax.device_put(jnp.zeros((n,), bool), self._mask_sharding)
        out, self._carries = self._step(self._params, self._init_carry,
                                        self._carries, chunks, self._keys,
                                        live, reset)
        return out

    # -- multi-host (host-local-feed) API -----------------------------------

    def step_local(self, chunks_local: np.ndarray, live=None, reset=None
                   ) -> np.ndarray:
        """Advance all hosts' streams one tick, feeding THIS host's rows.

        chunks_local [n_local, S] covers global slots ``self.local_slots``;
        ``live``/``reset`` are optional [n_local] bool masks with step()'s
        semantics.  Collective: every process must call this the same
        number of times.  Returns this host's converted rows
        [n_local, S].  Single-process it is exactly step().
        """
        nl = len(self.local_slots)
        local = {
            "chunks": np.ascontiguousarray(chunks_local, np.float32),
            "live": self._mask(live, True, nl),
            "reset": self._mask(reset, False, nl),
        }
        assert local["chunks"].shape == (nl, self._geo.chunk_in_samples)
        g = host_local_to_global(self._mesh, local)
        out, self._carries = self._step(self._params, self._init_carry,
                                        self._carries, g["chunks"],
                                        self._keys, g["live"], g["reset"])
        lo, hi, rows = host_local_rows(out)
        assert (lo, hi) == (self.local_slots.start, self.local_slots.stop)
        return rows

    def step_cost_analysis(self) -> dict | None:
        """XLA's analytic cost estimate for ONE batched step (all N
        streams advancing one chunk): {'flops': ..., 'bytes accessed': ...}.
        Grounds the bench's ×-realtime number in hardware utilization
        (achieved TFLOP/s and %-of-peak); None when the backend can't say.
        """
        x = jax.device_put(
            jnp.zeros((self.num_streams, self._geo.chunk_in_samples),
                      jnp.float32), self._chunk_sharding)
        live = jax.device_put(jnp.ones((self.num_streams,), bool),
                              self._mask_sharding)
        reset = jax.device_put(jnp.zeros((self.num_streams,), bool),
                               self._mask_sharding)
        try:
            compiled = self._step.lower(
                self._params, self._init_carry, self._carries, x,
                self._keys, live, reset).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else None
            return dict(ca) if ca else None
        except Exception:           # noqa: BLE001 — optional diagnostics
            return None

    def reset_stream(self, i: int) -> None:
        """Eagerly re-zero slot i's carry (single-process convenience; at
        N hosts pass a reset mask to step_local instead).

        Reuses the device-resident ``_init_carry`` computed at __init__ —
        a per-connect rebuild would copy the whole params tree to host
        and re-dispatch the silence-analysis init while the ticker is
        blocked, stalling every connected client."""
        if jax.process_count() > 1:
            raise RuntimeError("multi-process run: pass reset masks to "
                               "step_local()")
        self._carries = jax.tree.map(
            lambda c, o: c.at[i].set(o), self._carries, self._init_carry)
