"""Device-loop bisection of the fused streaming step (perf methodology,
docs/PERF.md: wall-clock through the tunnel lies — every decisive number
comes from a jitted lax.fori_loop with one host fetch at the end).

Usage:  python tools/bisect_step.py [stage ...]
Stages: step f0raw power refine env ap analyze (default: step)
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

# persistent compile cache: iterating on perf through the tunnel pays
# minutes of XLA compile per probe otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.models.voice_changer import init_params

N_STREAMS = 512
LOOP = 30


def time_loop(fn, *args, loop=LOOP):
    """Median device time per iteration of fn(*args) via lax.fori_loop.

    fn must map a pytree x -> pytree of same structure/shape as x (we
    thread the output back as the next input to serialize iterations).
    """
    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, loop, lambda i, v: fn(v), x)

    x = args[0]
    r = many(x)                     # compile + warm
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = many(x)
        _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) / loop)
    return float(np.median(ts))


KNOWN_STAGES = ("step", "f0raw", "power", "refine", "env", "ap",
                "analyze")


def main() -> None:
    stages = sys.argv[1:] or ["step"]
    unknown = [s for s in stages if s not in KNOWN_STAGES]
    if unknown:
        sys.exit(f"unknown stage(s) {unknown}; known: {list(KNOWN_STAGES)}")
    cfg = Config()
    params = init_params(jax.random.key(0), cfg)
    dsp = cfg.dsp

    from realtime_yukarin_tpu.streaming.pipeline import (init_stream,
                                                         streaming_step_impl)
    from realtime_yukarin_tpu.streaming.state import StreamGeometry

    geo = StreamGeometry.from_config(cfg, use_sr=True)
    carry, _ = init_stream(params, cfg)
    rng = np.random.default_rng(0)
    print(f"geo: Fc={geo.chunk_frames} Fn={geo.analysis_frames} "
          f"mctx={geo.model_ctx} cache={geo.cache_frames} "
          f"fresh={geo.fresh_frames} buf={geo.buf_samples}")

    B = N_STREAMS
    carries = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                           carry)
    chunks = jnp.asarray(rng.standard_normal((B, geo.chunk_in_samples)),
                         jnp.float32)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(jax.random.key(0),
                                                   jnp.arange(B))

    if "step" in stages:
        def one(c, ch, k):
            out, nc = streaming_step_impl(params, c, ch, k, cfg, True)
            return nc
        def f(state):
            carries, chunks = state
            nc = jax.vmap(one, (0, 0, None))(carries, chunks, keys[0])
            return nc, chunks
        t = time_loop(f, (carries, chunks))
        print(f"full step      : {t*1e3:8.3f} ms/step @ {B} streams "
              f"-> {B * geo.chunk_samples / dsp.sample_rate / t:.0f}x rt")

    # sub-stage timings: operate on representative fresh-frame shapes
    Fc = geo.chunk_frames
    fresh = geo.fresh_frames
    buf = jnp.asarray(rng.standard_normal((B, geo.buf_samples)), jnp.float32)
    off = geo.buf_frame0_offset + geo.cache_frames * dsp.hop

    from realtime_yukarin_tpu.dsp.f0 import (estimate_f0_raw,
                                             refine_f0_from_power)
    from realtime_yukarin_tpu.dsp.framing import median3
    from realtime_yukarin_tpu.dsp.envelope import (log_envelope_and_mcep,
                                                   power_spectrogram)
    from realtime_yukarin_tpu.dsp.aperiodicity import (
        band_aperiodicity_from_power)
    from realtime_yukarin_tpu.dsp.world import analyze_given_f0

    if "f0raw" in stages:
        def f(b):
            r = jax.vmap(lambda w: estimate_f0_raw(w, fresh, dsp, off))(b)
            return b + 0.0 * jnp.mean(r)
        print(f"f0 raw         : {time_loop(f, buf)*1e3:8.3f} ms")

    f0c = jnp.full((B, Fc), 120.0, jnp.float32)
    if "power" in stages:
        def f(b):
            P = jax.vmap(lambda w: power_spectrogram(w, Fc, dsp, off))(b)
            return b + 0.0 * jnp.mean(P)
        print(f"power spectrum : {time_loop(f, buf)*1e3:8.3f} ms")

    P0 = jax.vmap(lambda w: power_spectrogram(w, Fc, dsp, off))(buf)
    if "refine" in stages:
        def f(p):
            r = jax.vmap(lambda P, f0: refine_f0_from_power(P, f0, dsp)
                         )(p, f0c)
            return p + 0.0 * jnp.mean(r)
        print(f"f0 refine      : {time_loop(f, P0)*1e3:8.3f} ms")

    if "env" in stages:
        def f(p):
            L, mc = jax.vmap(lambda P, f0: log_envelope_and_mcep(P, f0, dsp)
                             )(p, f0c)
            return p + 0.0 * (jnp.mean(mc) + 0.0 * jnp.mean(L))
        print(f"env+mcep       : {time_loop(f, P0)*1e3:8.3f} ms")

    if "ap" in stages:
        def f(p):
            a = jax.vmap(lambda P, f0: band_aperiodicity_from_power(
                P, f0, dsp))(p, f0c)
            return p + 0.0 * jnp.mean(a)
        print(f"aperiodicity   : {time_loop(f, P0)*1e3:8.3f} ms")

    if "analyze" in stages:
        def f(b):
            ft = jax.vmap(lambda w, f0: analyze_given_f0(
                w, f0, Fc, dsp, off, refine=True))(b, f0c)
            return b + 0.0 * jnp.mean(ft.mc)
        print(f"analyze(all)   : {time_loop(f, buf)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
