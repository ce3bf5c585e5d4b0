"""REAL multi-process jax.distributed test (SURVEY.md §2c comm backend).

Two OS processes, each with 4 virtual CPU devices, rendezvous through
``jax.distributed.initialize`` (Gloo over loopback — the same code path as
multi-host DCN training), broadcast params from host 0, assemble per-host
batches into one global batch, and take lock-step sharded train steps.
Both must see 8 global devices and identical, decreasing losses.
"""

import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from realtime_yukarin_tpu.config import (AcousticModelConfig, Config,
                                             SuperResolutionConfig,
                                             VocoderNNConfig)
    from realtime_yukarin_tpu.models.voice_changer import init_params
    from realtime_yukarin_tpu.parallel.mesh import make_mesh
    from realtime_yukarin_tpu.parallel.multihost import (
        broadcast_from_host0, init_multihost, sync_hosts)
    from realtime_yukarin_tpu.training.data import make_batch
    from realtime_yukarin_tpu.training.train_step import (
        init_train_state, make_sharded_train_step)

    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    proc_id, proc_count = init_multihost("127.0.0.1:" + port, nproc, pid)
    assert proc_count == nproc
    cfg = Config(acoustic=AcousticModelConfig(hidden=32, num_blocks=2),
                 super_resolution=SuperResolutionConfig(hidden=64,
                                                        num_blocks=2),
                 vocoder_nn=VocoderNNConfig(hidden=32, num_blocks=2))
    params = broadcast_from_host0(init_params(jax.random.key(0), cfg))
    mesh = make_mesh(model_parallel=2)      # 8 global -> data=4, model=2
    step, shard_state, shard_batch = make_sharded_train_step(cfg, mesh)
    state = shard_state(init_train_state(params))
    batch = shard_batch(make_batch(cfg, batch_size=2, seconds=0.15,
                                   seed=proc_id))
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    sync_hosts("done")
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    assert losses[-1] < losses[0], losses
    print("LOSSES", proc_id, [round(l, 6) for l in losses], flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_training(tmp_path):
    import pathlib
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo))
    port = str(_free_port())

    # isolated env: drop this pytest process's 8-device flag and any
    # TPU-plugin PYTHONPATH so workers boot exactly like real hosts would
    import os
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), "2",
                               port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    l0 = [ln for ln in outs[0].splitlines() if ln.startswith("LOSSES")]
    l1 = [ln for ln in outs[1].splitlines() if ln.startswith("LOSSES")]
    assert l0 and l1
    # identical global computation on both hosts
    assert l0[0].split(None, 2)[2] == l1[0].split(None, 2)[2]
