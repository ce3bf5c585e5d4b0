"""Diagnose the 1024-stream throughput knee (VERDICT r3 weak #4).

Interleaved, calibration-normalized A/B of the batched serving step at
512 vs 1024 streams (the BENCH_r03 curve bent down at 1024 with no
diagnosis).  Reports per-round cal-normalized step time per audio-second
and the carry HBM footprint, separating "chip was busier" from "the step
itself scales sub-linearly".

Usage: python tools/streams_ab.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.models.voice_changer import init_params
from realtime_yukarin_tpu.parallel.mesh import make_mesh
from realtime_yukarin_tpu.parallel.serving import BatchedServer

LOOP = 20
ROUNDS = 6


def main() -> None:
    cfg = Config()
    params = init_params(jax.random.key(0), cfg)
    mesh = make_mesh(model_parallel=1)
    rng = np.random.default_rng(0)

    variants = {}
    for n in (512, 1024):
        server = BatchedServer(params, cfg, num_streams=n, mesh=mesh)
        S = server.chunk_samples
        chunks = jax.device_put(
            jnp.asarray(rng.standard_normal((n, S)), jnp.float32),
            server._chunk_sharding)
        carry_bytes = sum(
            np.prod(l.shape) * l.dtype.itemsize
            for l in jax.tree.leaves(server._carries))
        print(f"n={n}: carry {carry_bytes/2**20:.1f} MiB "
              f"({carry_bytes/n/1024:.1f} KiB/stream), "
              f"audio {n*S/cfg.dsp.in_rate:.1f} s/step")
        for _ in range(3):
            out = server.step_device(chunks)
        _ = np.asarray(out[0, :4])

        def run(server=server, chunks=chunks, n=n, S=S):
            t0 = time.perf_counter()
            for _ in range(LOOP):
                out = server.step_device(chunks)
            _ = np.asarray(out[0, :4])
            dt = (time.perf_counter() - t0) / LOOP
            return dt / (n * S / cfg.dsp.in_rate)   # wall s per audio s

        variants[f"s{n}"] = run

    xc = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def cal_loop(v):
        return jax.lax.fori_loop(
            0, 20, lambda i, a: jnp.matmul(
                a, a, preferred_element_type=jnp.bfloat16) * (1.0 / 2048),
            v)

    r = cal_loop(xc)
    _ = np.asarray(r[:1, :1].astype(jnp.float32))

    def cal():
        t0 = time.perf_counter()
        r = cal_loop(xc)
        _ = np.asarray(r[:1, :1].astype(jnp.float32))
        return time.perf_counter() - t0

    results = {k: [] for k in list(variants) + ["cal"]}
    for rnd in range(ROUNDS):
        for k, fn in variants.items():
            results["cal"].append(cal())
            results[k].append(fn())
        print(f"round {rnd}: " + " ".join(
            f"{k}={results[k][-1]*1e6:8.2f}us/audio-s" for k in variants)
            + f" cal={results['cal'][-1]*1e3:6.1f}ms")

    print("\nmedians (inverse = x-realtime | cal-normalized ratio):")
    cals = np.asarray(results["cal"]).reshape(ROUNDS, 2).mean(axis=1)
    for i, k in enumerate(variants):
        arr = np.asarray(results[k])
        norm = np.median(arr / cals)
        print(f"  {k}: {1.0/np.median(arr):8.0f}x rt | {norm:9.5f} s/audio-s"
              f" per cal-s")
    a = np.asarray(results["s512"]) / cals
    b = np.asarray(results["s1024"]) / cals
    print(f"\ncal-normalized 1024/512 step-efficiency ratio: "
          f"{np.median(b)/np.median(a):.3f} "
          f"(>1 means 1024 is less efficient per audio-second)")


if __name__ == "__main__":
    main()
