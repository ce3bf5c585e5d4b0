"""Multi-host SOCKET serving test (VERDICT r4 #4 / BASELINE config #5 as a
product surface at N hosts).

Two OS processes x 4 virtual CPU devices run one global BatchedServer; each
process fronts its LOCAL slot range with its own SocketVoiceServer (own
port, own accept loop) while the tickers advance the one collective
batched program in lockstep.  A TCP client connects to EACH host and
streams a distinct signal; the converted audio each client receives must
be bit-equal to what a single-process SocketVoiceServer produces for the
same signal on the same GLOBAL slot (per-slot noise keys are global, so
slot identity matters — the host-1 client lands on global slot 4, which
the single-process reference reaches by parking four idle connections).
"""

import pathlib
import socket
import subprocess
import sys
import textwrap
import time

import numpy as np

_WORKER = textwrap.dedent("""
    import os, sys, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      {repo!r} + "/.jaxcache")
    from realtime_yukarin_tpu.models.voice_changer import init_params
    from realtime_yukarin_tpu.parallel.multihost import (broadcast_from_host0,
                                                         init_multihost)
    from realtime_yukarin_tpu.runtime.socket_server import (
        SocketVoiceServer, convert_over_socket)
    sys.path.insert(0, {tmp!r})
    from tiny import tiny_config

    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    proc_id, proc_count = init_multihost("127.0.0.1:" + port, nproc, pid)
    assert proc_count == nproc
    cfg = tiny_config()
    params = broadcast_from_host0(init_params(jax.random.key(0), cfg))
    srv = SocketVoiceServer(params, cfg, num_streams=8,
                            realtime_factor=0.0)
    lo = srv._server.local_slots.start
    assert len(srv._slots) == 8 // nproc

    fs = cfg.dsp.sample_rate
    t = np.arange(int(0.4 * fs)) / fs
    x = (0.3 * np.sin(2 * np.pi * (130.0 + 40.0 * proc_id) * t)
         ).astype(np.float32)
    y = convert_over_socket(*srv.address, x)
    assert len(y) > 0 and np.isfinite(y).all()
    np.save(f"{{outdir}}/out_{{proc_id}}.npy", y)
    np.save(f"{{outdir}}/lo_{{proc_id}}.npy", np.asarray([lo]))
    open(f"{{outdir}}/done_{{proc_id}}", "w").write("1")
    # keep ticking until BOTH hosts' clients are served (a host that
    # stops early parks the partner's collective ticker)
    deadline = time.time() + 240
    while time.time() < deadline:
        if all(os.path.exists(f"{{outdir}}/done_{{i}}")
               for i in range(nproc)):
            break
        time.sleep(0.1)
    print("OK", proc_id, flush=True)
    os._exit(0)     # skip close(): the collective tickers cannot be
    #                 torn down independently; process exit is the only
    #                 coordinated shutdown the test needs
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_host_socket_serving_bit_equals_single_process(tmp_path):
    import os
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
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
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
    assert int(np.load(tmp_path / "lo_0.npy")[0]) == 0
    lo1 = int(np.load(tmp_path / "lo_1.npy")[0])
    assert lo1 == 4          # host 1 fronts global slots [4, 8)

    # ---- single-process reference: same signals, same GLOBAL slots ------
    import jax
    from realtime_yukarin_tpu.models.voice_changer import init_params
    from realtime_yukarin_tpu.runtime.socket_server import (
        SocketVoiceServer, convert_over_socket)
    from test_parallel import tiny_config

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    fs = cfg.dsp.sample_rate
    t = np.arange(int(0.4 * fs)) / fs
    sigs = [(0.3 * np.sin(2 * np.pi * (130.0 + 40.0 * i) * t)
             ).astype(np.float32) for i in range(2)]

    with SocketVoiceServer(params, cfg, num_streams=8,
                           realtime_factor=0.0) as srv:
        ref0 = convert_over_socket(*srv.address, sigs[0])   # slot 0
        # wait for slot 0 to be released, then park 4 idle connections on
        # slots 0-3 so the next real client lands on global slot 4 (the
        # host-1 client's slot in the two-process run)
        deadline = time.time() + 120
        while (time.time() < deadline
               and any(s.active for s in srv._slots)):
            time.sleep(0.02)
        parked = [socket.create_connection(srv.address) for _ in range(4)]
        while (time.time() < deadline
               and sum(s.active for s in srv._slots) < 4):
            time.sleep(0.02)
        ref1 = convert_over_socket(*srv.address, sigs[1])   # slot 4
        for s in parked:
            s.close()

    got0 = np.load(tmp_path / "out_0.npy")
    got1 = np.load(tmp_path / "out_1.npy")
    np.testing.assert_array_equal(got0, ref0)
    np.testing.assert_array_equal(got1, ref1)
    # the two streams genuinely differ (different signals, different keys)
    assert len(got0) and len(got1)
    assert not np.array_equal(got0[: len(got1)], got1[: len(got0)])
