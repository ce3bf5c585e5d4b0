"""Interleaved A/B timing of streaming-step variants on a SHARED chip.

The tunnel chip is time-shared: absolute timings swing 2-3x between
minutes, so single-shot bisection lies.  This harness times all variants
round-robin in one process, interleaved with a fixed calibration matmul,
and reports per-round calibration-normalized medians — chip-load noise
cancels in the ratios.

Usage: python tools/ab_step.py
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
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.models.voice_changer import init_params
from realtime_yukarin_tpu.streaming.pipeline import (init_stream,
                                                     streaming_step_impl)

B = 512
LOOP = 30
ROUNDS = 6


def make_loop(fn, x):
    @jax.jit
    def many(v):
        return jax.lax.fori_loop(0, LOOP, lambda i, s: fn(s), v)
    r = many(x)
    _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]   # warm + sync
    def run():
        t0 = time.perf_counter()
        out = many(x)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return (time.perf_counter() - t0) / LOOP
    return run


def main() -> None:
    cfg = Config()
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)

    variants = {}

    def add_step_variant(name, cfg_v, **kw):
        carry, geo = init_stream(params, cfg_v, **kw)
        carries = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), carry)
        chunks = jnp.asarray(
            rng.standard_normal((B, geo.chunk_in_samples)), jnp.float32)
        key = jax.random.key(1)

        def one(c, ch):
            out, nc = streaming_step_impl(params, c, ch, key, cfg_v, True,
                                          **kw)
            return nc
        def f(state):
            carries, chunks = state
            return jax.vmap(one)(carries, chunks), chunks
        variants[name] = make_loop(f, (carries, chunks))
        return geo

    geo = add_step_variant("step", cfg)

    # calibration: fixed 1 GFLOP-scale matmul loop, ~same per-iter cost
    xc = jnp.ones((2048, 2048), jnp.bfloat16)
    def cal(v):
        return jnp.matmul(v, v, preferred_element_type=jnp.bfloat16) * 1e-3
    variants["cal"] = make_loop(cal, xc)

    # extra variants compiled below reuse the SAME geometry/chunk shapes
    import realtime_yukarin_tpu.dsp.world as world_mod
    orig = world_mod.analyze_given_f0

    def no_refine(wave, f0, F, dcfg, off, refine=False, **kw):
        return orig(wave, f0, F, dcfg, off, refine=False, **kw)
    import realtime_yukarin_tpu.streaming.pipeline as pl_mod
    try:
        world_mod.analyze_given_f0 = no_refine
        pl_mod.analyze_given_f0 = no_refine
        add_step_variant("step_norefine", cfg)
    finally:
        # always restore — a compile/OOM failure must not leave later
        # variants in this process silently benching refine=False
        world_mod.analyze_given_f0 = orig
        pl_mod.analyze_given_f0 = orig

    import dataclasses
    cfg_nosnap = dataclasses.replace(
        cfg, dsp=dataclasses.replace(cfg.dsp, f0_snap_halo=0))
    add_step_variant("step_nosnap", cfg_nosnap)

    # pallas fused analysis vs the (default) XLA matmul analysis
    import realtime_yukarin_tpu.ops.pallas_analysis as pa
    orig_up = pa.use_pallas
    try:
        pa.use_pallas = lambda: jax.default_backend() == "tpu"
        add_step_variant("step_pallas_analysis", cfg)
    finally:
        pa.use_pallas = orig_up

    names = list(variants)
    results = {n: [] for n in names}
    for r in range(ROUNDS):
        for n in names:
            results[n].append(variants[n]())
        line = " ".join(f"{n}={results[n][-1]*1e3:7.3f}ms" for n in names)
        print(f"round {r}: {line}")

    cal_med = np.median(results["cal"])
    print("\nmedians (raw | cal-normalized):")
    for n in names:
        arr = np.asarray(results[n])
        norm = np.median(arr / np.asarray(results["cal"]))
        print(f"  {n:16s} {np.median(arr)*1e3:8.3f} ms | {norm:8.3f}x cal "
              f"(cal {cal_med*1e3:.3f} ms)")
    sps = B * geo.chunk_samples / cfg.dsp.sample_rate
    print(f"\naudio-s per step: {sps:.1f}; "
          f"step x-rt at median: {sps/np.median(results['step']):.0f}")


if __name__ == "__main__":
    main()
