"""REAL multi-process SERVING test (VERDICT r1 #1 / BASELINE config #5).

Two OS processes × 4 virtual CPU devices rendezvous via jax.distributed
and run a BatchedServer over the global 8-device data mesh.  Each process
feeds ONLY its local slots' chunks through ``step_local`` (the multi-host
input edge: host-local [n_local, S] blocks assembled into global arrays)
and reads back only its own rows.  The runner then replays the identical
schedule single-process through ``step`` and asserts the multi-host
outputs equal the single-process ones bit-for-bit — including a pause
(live=False) and a mid-stream reset exercised from the host that owns the
slot.
"""

import pathlib
import socket
import subprocess
import sys
import textwrap

import numpy as np

_SCHEDULE = """
import numpy as np


def make_schedule(n, S, ticks):
    '''Deterministic per-(slot, tick) chunks + live/reset masks shared by
    the workers and the single-process reference.'''
    rng = np.random.default_rng(1234)
    chunks = 0.3 * np.sin(
        2 * np.pi
        * (120.0 + 17.0 * np.arange(n))[:, None, None]        # per-slot f0
        * (np.arange(ticks * S, dtype=np.float64) / 24000.0)
        .reshape(ticks, S)[None]).astype(np.float32)
    chunks += 0.01 * rng.standard_normal((n, ticks, S)).astype(np.float32)
    live = np.ones((ticks, n), bool)
    live[2, 1] = False          # slot 1 pauses at tick 2
    reset = np.zeros((ticks, n), bool)
    reset[3, n - 2] = True      # slot n-2 rejoins (reset) at tick 3
    return chunks, live, reset
"""

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from realtime_yukarin_tpu.models.voice_changer import init_params
    from realtime_yukarin_tpu.parallel.mesh import make_mesh
    from realtime_yukarin_tpu.parallel.multihost import (broadcast_from_host0,
                                                         init_multihost,
                                                         sync_hosts)
    from realtime_yukarin_tpu.parallel.serving import BatchedServer
    sys.path.insert(0, {tmp!r})
    from schedule import make_schedule
    from tiny import tiny_config

    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    proc_id, proc_count = init_multihost("127.0.0.1:" + port, nproc, pid)
    assert proc_count == nproc
    cfg = tiny_config()
    params = broadcast_from_host0(init_params(jax.random.key(0), cfg))
    mesh = make_mesh(model_parallel=1)          # 8 global data devices
    server = BatchedServer(params, cfg, num_streams=8, mesh=mesh)
    n, S = server.num_streams, server.chunk_samples
    lo, hi = server.local_slots.start, server.local_slots.stop
    assert hi - lo == n // nproc, (lo, hi)

    TICKS = 5
    chunks, live, reset = make_schedule(n, S, TICKS)
    outs = []
    for k in range(TICKS):
        outs.append(server.step_local(chunks[lo:hi, k],
                                      live=live[k, lo:hi],
                                      reset=reset[k, lo:hi]))
    sync_hosts("done")
    np.save(f"{{outdir}}/out_{{proc_id}}.npy", np.stack(outs))   # [T,nl,S]
    np.save(f"{{outdir}}/range_{{proc_id}}.npy", np.asarray([lo, hi]))
    print("OK", proc_id, flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_serving_matches_single_process(tmp_path):
    import os
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    (tmp_path / "schedule.py").write_text(_SCHEDULE)
    (tmp_path / "tiny.py").write_text(
        f"import sys; sys.path.insert(0, "
        f"{str(pathlib.Path(__file__).parent)!r})\n"
        "from test_parallel import tiny_config\n")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo, tmp=str(tmp_path)))
    port = str(_free_port())

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", port, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-3000:]

    # ---- single-process reference over the same global schedule ---------
    import jax
    from realtime_yukarin_tpu.models.voice_changer import init_params
    from realtime_yukarin_tpu.parallel.mesh import make_mesh
    from realtime_yukarin_tpu.parallel.serving import BatchedServer
    from test_parallel import tiny_config

    sys.path.insert(0, str(tmp_path))
    try:
        from schedule import make_schedule
    finally:
        sys.path.pop(0)

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    server = BatchedServer(params, cfg, num_streams=8,
                           mesh=make_mesh(model_parallel=1))
    n, S = server.num_streams, server.chunk_samples
    TICKS = 5
    chunks, live, reset = make_schedule(n, S, TICKS)
    ref = np.stack([server.step(chunks[:, k], live=live[k], reset=reset[k])
                    for k in range(TICKS)])                   # [T, n, S]

    got = np.full_like(ref, np.nan)
    for pid in range(2):
        lo, hi = np.load(tmp_path / f"range_{pid}.npy")
        got[:, lo:hi] = np.load(tmp_path / f"out_{pid}.npy")
    assert np.isfinite(got).all(), "uncovered slots"
    np.testing.assert_array_equal(got, ref)
    # the pause and the reset genuinely did something
    assert np.all(ref[2, 1] == 0.0)
    assert not np.array_equal(ref[3, n - 2], ref[3, n - 3])
