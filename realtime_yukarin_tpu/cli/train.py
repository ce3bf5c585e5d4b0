"""Training CLI — the yukarin/become-yukarin trainer role (SURVEY.md §2b).

Trains all three model stages jointly (stage-1 mc regression, stage-2
envelope super-resolution, neural vocoder multi-res STFT), optionally with
the adversarial stage-2 objective (--gan).  The batch shards over the
mesh 'data' axis and parameters over 'model' — same shardings serving
uses, so a multi-chip training run exercises identical collectives.

Data: a prepared corpus dir from ``cli.prepare`` (real wav pairs), or
``--synthetic`` for the self-generated speaker pairs in training.data
(this environment has no speech corpora).

Usage:
    python -m realtime_yukarin_tpu.cli.train --prepared_dir prepared/ \
        --ckpt_dir ckpts/ [--steps 1000] [--gan] [--config_path c.yaml]
    python -m realtime_yukarin_tpu.cli.train --synthetic --steps 50 \
        --ckpt_dir ckpts/
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.models.discriminator import init_discriminator
from realtime_yukarin_tpu.models.voice_changer import (init_params,
                                                       save_params)
from realtime_yukarin_tpu.parallel.mesh import make_mesh
from realtime_yukarin_tpu.parallel.multihost import (broadcast_from_host0,
                                                     init_multihost)
from realtime_yukarin_tpu.training.checkpoint import (restore_checkpoint,
                                                      save_checkpoint,
                                                      to_host)
from realtime_yukarin_tpu.training.train_step import (
    init_gan_train_state, init_train_state, make_sharded_gan_step,
    make_sharded_train_step)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prepared_dir", default=None,
                   help="output dir of cli.prepare")
    p.add_argument("--synthetic", action="store_true",
                   help="self-generated speaker pairs (no corpus needed)")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--export_params", default=None,
                   help="write final inference params msgpack here")
    p.add_argument("--config_path", default=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--crop_frames", type=int, default=100)
    p.add_argument("--cache_utterances", type=int, default=None,
                   help="bound host RAM: lazy-load corpus npz behind an "
                        "LRU of this many utterances (default: eager "
                        "full load, fine for small corpora)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--gan", action="store_true",
                   help="adversarial stage-2 objective")
    p.add_argument("--adv_weight", type=float, default=0.02)
    p.add_argument("--finetune_converted", type=int, default=0,
                   metavar="STEPS",
                   help="after main training, fine-tune ONLY the vocoder "
                        "subtrees for STEPS steps on (converted features, "
                        "real target waveform) pairs — closes the "
                        "train/inference conditioning mismatch (the "
                        "vocoders train on ground-truth features but "
                        "consume stage-1/SR outputs at inference; "
                        "measured ~7-9%% multi-res-STFT cost, "
                        "tests/test_full_chain.py).  Needs "
                        "--prepared_dir; host-local (run before "
                        "exporting, after multi-host training)")
    p.add_argument("--finetune_lr", type=float, default=3e-4)
    p.add_argument("--ckpt_every", type=int, default=200)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--coordinator_address", default=None,
                   help="host0 addr:port for multi-host (DCN) training; "
                        "all hosts run this same command")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args(argv)

    if not args.synthetic and not args.prepared_dir:
        p.error("need --prepared_dir or --synthetic")

    proc_id, proc_count = init_multihost(args.coordinator_address,
                                         args.num_processes, args.process_id)
    is_host0 = proc_id == 0
    if proc_count > 1 and is_host0:
        print(f"[train] multi-host: {proc_count} processes, "
              f"{jax.device_count()} devices")

    cfg = Config.from_yaml(args.config_path) if args.config_path else Config()
    params = broadcast_from_host0(init_params(jax.random.key(cfg.seed), cfg))

    # data source ---------------------------------------------------------
    if args.synthetic:
        from realtime_yukarin_tpu.training.data import make_batch

        def next_batch(step: int):
            # per-host seed offset: each host contributes a distinct
            # local shard of the global batch
            return make_batch(cfg, args.batch_size,
                              seconds=args.crop_frames * cfg.dsp.hop
                              / cfg.dsp.sample_rate,
                              seed=args.seed + step + proc_id * 1_000_003)
    else:
        from realtime_yukarin_tpu.training.dataset import CorpusDataset
        ds = CorpusDataset(args.prepared_dir, cfg,
                           crop_frames=args.crop_frames,
                           seed=args.seed + proc_id,
                           cache_utterances=args.cache_utterances)
        if is_host0:
            print(f"[train] corpus: {ds.num_utterances} utterance pairs")

        def next_batch(step: int):
            return ds.sample_batch(args.batch_size)

    # step + state --------------------------------------------------------
    # both objectives run through the same mesh/shardings (data x model);
    # GSPMD emits identical collectives for 1 chip, 1 host, or N hosts
    mesh = make_mesh(model_parallel=args.model_parallel)
    if args.gan:
        _, d_params = init_discriminator(jax.random.key(cfg.seed + 1),
                                         cfg.super_resolution, cfg.dsp)
        d_params = broadcast_from_host0(d_params)
        step_fn, shard_state, shard_batch = make_sharded_gan_step(
            cfg, mesh, args.adv_weight)
        state_host = init_gan_train_state(params, d_params)
    else:
        step_fn, shard_state, shard_batch = make_sharded_train_step(cfg, mesh)
        state_host = init_train_state(params)

    # resume BEFORE sharding, then re-sync hosts: checkpoints are written
    # by host 0 only, so without this a multi-host run without a shared
    # filesystem would restore on host 0 and desync every other host
    start_step = 0
    if args.ckpt_dir:
        state_host, start_step = restore_checkpoint(args.ckpt_dir,
                                                    state_host)
        if proc_count > 1:
            state_host = broadcast_from_host0(
                jax.tree.map(np.asarray, state_host))
            start_step = int(broadcast_from_host0(
                np.asarray(start_step, np.int32)))
        if start_step and is_host0:
            print(f"[train] resumed from step {start_step}")
    state = shard_state(state_host)

    # loop ----------------------------------------------------------------
    t0 = time.perf_counter()
    for step in range(start_step, args.steps):
        batch = next_batch(step)
        batch = shard_batch(batch)
        state, metrics = step_fn(state, batch)
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            m = {k: float(np.asarray(v)) for k, v in metrics.items()}
            rate = (step + 1 - start_step) / (time.perf_counter() - t0)
            if is_host0:
                msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                print(f"[train] step {step + 1}/{args.steps} {msg} "
                      f"({rate:.2f} it/s)")
        if args.ckpt_dir and ((step + 1) % args.ckpt_every == 0
                              or step + 1 == args.steps):
            # to_host's allgather is a collective: every host participates,
            # only host 0 writes
            host_state = to_host(state)
            if is_host0:
                path = save_checkpoint(args.ckpt_dir, host_state, step + 1)
                print(f"[train] checkpoint -> {path}")

    # --gan: the inference tree is the EMA generator (GanTrainState.
    # ema_params) — the raw endpoint of adversarial training is
    # chaotically run-to-run sensitive (see make_gan_train_step)
    infer_tree = state.ema_params if args.gan else state.params

    final_params = None
    if args.finetune_converted:
        if not args.prepared_dir:
            p.error("--finetune_converted needs --prepared_dir")
        from realtime_yukarin_tpu.training.full_chain import (
            converted_pairs, finetune_vocoder_on_converted)
        host_params = jax.tree.map(np.asarray, to_host(infer_tree))
        if is_host0:
            pairs = converted_pairs(host_params, cfg, args.prepared_dir)
            print(f"[train] fine-tuning vocoders on {len(pairs)} converted"
                  f"-feature utterances, {args.finetune_converted} steps")
            host_params = finetune_vocoder_on_converted(
                host_params, cfg, pairs, steps=args.finetune_converted,
                lr=args.finetune_lr, crop_frames=args.crop_frames,
                batch_size=args.batch_size, seed=args.seed)
        final_params = broadcast_from_host0(host_params)

    if args.export_params:
        if final_params is None:
            final_params = to_host(infer_tree)     # collective: all hosts
        if is_host0:
            save_params(final_params, args.export_params)
            print(f"[train] inference params -> {args.export_params}")


if __name__ == "__main__":
    main()
