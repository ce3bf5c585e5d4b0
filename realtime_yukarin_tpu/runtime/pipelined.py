"""Dispatch-ahead pipelined realtime server (SURVEY.md §7 hard part (d)).

The reference overlaps its three stages with OS processes + queues
(SURVEY.md §3.1).  On TPU the whole pipeline is one fused device program,
so the remaining overlap worth engineering is host-edge vs device: this
server keeps up to ``depth`` chunks in flight on the device and only
synchronizes on the OLDEST one, so host->device feed, device compute, and
device->host fetch of consecutive chunks overlap (double buffering;
JAX dispatch is already async — the trick is *delaying* the blocking
``np.asarray`` by ``depth`` chunks).

Audio edges are the native lock-free SPSC ring buffers
(runtime/native_runtime.cpp): the audio callback thread pushes/pops
without ever touching Python locks or JAX; the dispatch thread is the
single consumer of the input ring and single producer of the output ring —
the reference's queue topology, race-free by construction (SURVEY.md §5).

Underrun contract: ``pop_output`` emits silence when the pipeline is
behind (reference run.py behavior); silence emissions are counted in
metrics.
"""

from __future__ import annotations

import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.runtime import RingBuffer
from realtime_yukarin_tpu.streaming.pipeline import init_stream, streaming_step
from realtime_yukarin_tpu.utils.metrics import ServingMetrics


class PipelinedStream:
    """Single-stream realtime conversion with dispatch-ahead depth.

    Producer thread: ``push_input(pcm)``.  Consumer thread:
    ``pop_output(n)``.  A background dispatch thread moves chunks
    input-ring -> device -> output-ring, keeping ``depth`` chunks in
    flight.  ``flush()`` + ``close()`` end the stream.
    """

    def __init__(self, params: dict, cfg: Config, use_sr: bool = True,
                 use_neural_vocoder: bool = False, seed: int = 0,
                 depth: int = 2, ring_seconds: float = 4.0,
                 warmup: bool = True, vocoder_mode: str | None = None):
        from realtime_yukarin_tpu.config import resolve_vocoder_mode
        self._params = params
        self._cfg = cfg
        self._use_sr = use_sr
        self._mode = resolve_vocoder_mode(use_neural_vocoder, vocoder_mode)
        self._key = jax.random.key(seed)
        self._carry, self._geo = init_stream(params, cfg, use_sr,
                                             vocoder_mode=self._mode)
        self._depth = max(1, depth)

        if warmup:
            # compile the step BEFORE going live: the first jit trace takes
            # minutes on TPU and would otherwise stall the dispatch thread
            # (and any realtime deadline) mid-stream.  The step donates its
            # carry, so warm up on a throwaway copy.
            scratch = jax.tree.map(jnp.copy, self._carry)
            y, _ = streaming_step(params, scratch,
                                  jnp.zeros(self._geo.chunk_in_samples,
                                            jnp.float32),
                                  self._key, cfg, use_sr,
                                  vocoder_mode=self._mode)
            np.asarray(y[:1])                  # sync: compile finished

        self._in_rb = RingBuffer(int(ring_seconds * cfg.dsp.in_rate))
        self._out_rb = RingBuffer(int(ring_seconds * cfg.dsp.out_rate))
        self.metrics = ServingMetrics()

        self._stop = threading.Event()
        self._flushing = threading.Event()
        self._drained = threading.Event()
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True, name="vc-dispatch")
        self._thread.start()

    # -- audio-edge API ----------------------------------------------------

    @property
    def chunk_samples(self) -> int:
        """Input chunk size (samples at cfg.dsp.in_rate)."""
        return self._geo.chunk_in_samples

    @property
    def chunk_out_samples(self) -> int:
        return self._geo.chunk_out_samples

    @property
    def latency_samples(self) -> int:
        """End-to-end delay in OUTPUT-rate samples."""
        return self._geo.latency_out_samples(self._cfg.dsp)

    def push_input(self, pcm: np.ndarray) -> int:
        """Producer: enqueue PCM; returns samples accepted (drops counted)."""
        pushed = self._in_rb.push(np.asarray(pcm, np.float32))
        if pushed < len(pcm):
            self.metrics.incr("input_overruns")
        return pushed

    def pop_output(self, n: int) -> np.ndarray:
        """Consumer: dequeue exactly n converted samples (silence when
        starved — the reference's underrun contract)."""
        out, ok = self._out_rb.pop_chunk_or_silence(n)
        if not ok:
            self.metrics.incr("output_underruns")
        return out

    def output_available(self) -> int:
        return self._out_rb.available

    # -- lifecycle ---------------------------------------------------------

    def flush(self, timeout: float = 600.0) -> None:
        """Feed silence to drain algorithmic latency + in-flight chunks,
        then wait until everything reached the output ring.  The generous
        default covers first-use compilation when warmup was disabled."""
        S = self._geo.chunk_in_samples
        n_lat = -(-self.latency_samples // self._geo.chunk_out_samples)
        self.push_input(np.zeros((n_lat + 1) * S, np.float32))
        self._flushing.set()
        if not self._drained.wait(timeout):
            self.metrics.incr("flush_timeouts")

    def close(self, timeout: float = 600.0) -> None:
        """Stop the dispatch thread.  Waits for in-flight device work —
        killing the interpreter while the thread sits in a runtime call
        aborts the process from native code."""
        self._stop.set()
        self._thread.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatch thread ---------------------------------------------------

    def _dispatch_loop(self) -> None:
        S = self._geo.chunk_in_samples
        inflight: list[tuple[float, object]] = []

        def retire_oldest():
            t_in, y = inflight.pop(0)
            host = np.asarray(y)                       # blocks until done
            self._out_rb.push(host)
            self.metrics.chunk_latency.record(1000 * (time.perf_counter()
                                                      - t_in))

        while not self._stop.is_set():
            if self._in_rb.available >= S:
                chunk, _ = self._in_rb.pop_chunk_or_silence(S)
                t0 = time.perf_counter()
                y, self._carry = streaming_step(
                    self._params, self._carry, jnp.asarray(chunk),
                    self._key, self._cfg, self._use_sr,
                    vocoder_mode=self._mode)
                self.metrics.dispatch_latency.record(
                    1000 * (time.perf_counter() - t0))
                inflight.append((t0, y))
                if len(inflight) > self._depth:
                    retire_oldest()
            elif inflight:
                retire_oldest()                        # idle: drain early
            elif self._flushing.is_set():
                self._drained.set()
                self._flushing.clear()
            else:
                time.sleep(0.0005)
        while inflight:
            retire_oldest()
