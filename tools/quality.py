"""Publish QUALITY.json — round-over-round conversion-quality tracking.

The perf story is tracked per round in BENCH_r*.json; this tool gives
accuracy the same treatment (VERDICT r4 next-round #1).  It runs the
deterministic held-out recipe the test suite gates
(tests/test_full_chain.py / conftest ``trained_formant``):

  1. build the formant-class two-speaker corpus (training.data.
     build_formant_corpus — fixed seeds, byte-identical every run),
  2. train the tiny config 600 steps (training.full_chain.train_plain),
  3. convert the held-out source WAVEFORM through the complete STREAMED
     pipeline in all three vocoder modes and score the output audio
     against the aligned target features (MCD / log-F0 RMSE / V/UV),
  4. measure the vocoder conditioning mismatch (ground-truth vs
     converted features against the same real waveform) and the effect
     of the fine-tune-on-converted pass (cli.train --finetune_converted).

Runs on CPU by default (the tests' platform, deterministic across
rounds); pass --tpu to run on the attached chip instead.

Usage: python tools/quality.py [--round N] [--out QUALITY.json] [--tpu]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

print = functools.partial(print, flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--round", type=int, default=None,
                   help="build round (default: next after BENCH_r*.json)")
    p.add_argument("--out", default=None,
                   help="output path (default: <repo>/QUALITY.json)")
    p.add_argument("--tpu", action="store_true",
                   help="run on the attached TPU instead of CPU")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--finetune_steps", type=int, default=300)
    p.add_argument("--work_dir", default=None,
                   help="corpus/work dir (default: a temp dir)")
    args = p.parse_args(argv)

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    repo = pathlib.Path(__file__).resolve().parent.parent
    jax.config.update("jax_compilation_cache_dir", str(repo / ".jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from realtime_yukarin_tpu.config import (AcousticModelConfig, Config,
                                             SuperResolutionConfig,
                                             VocoderNNConfig)
    from realtime_yukarin_tpu.models.f0_stats import F0Statistics
    from realtime_yukarin_tpu.training import full_chain as FC
    from realtime_yukarin_tpu.training.data import build_formant_corpus
    from realtime_yukarin_tpu.utils.audio_io import read_wav

    rnd = args.round
    if rnd is None:
        rnd = 1 + max((int(p_.stem.split("_r")[1])
                       for p_ in repo.glob("BENCH_r*.json")), default=0)
    out_path = pathlib.Path(args.out) if args.out else repo / "QUALITY.json"

    cfg = Config(acoustic=AcousticModelConfig(hidden=32, num_blocks=2),
                 super_resolution=SuperResolutionConfig(hidden=64,
                                                        num_blocks=2),
                 vocoder_nn=VocoderNNConfig(hidden=32, num_blocks=2))

    work = pathlib.Path(args.work_dir or tempfile.mkdtemp(prefix="quality_"))
    t0 = time.time()
    dirs = build_formant_corpus(work, cfg)
    print(f"[quality] corpus built ({time.time() - t0:.0f}s)")

    t0 = time.time()
    init_p, trained = FC.train_plain(cfg, dirs["prep_tr"], steps=args.steps)
    print(f"[quality] trained {args.steps} steps ({time.time() - t0:.0f}s)")
    si = F0Statistics.load(dirs["prep_tr"] / "stats_input.npz")
    st = F0Statistics.load(dirs["prep_tr"] / "stats_target.npz")
    trained = dict(trained, f0_stats={
        "src_mean": jnp.asarray(si.mean, jnp.float32),
        "src_std": jnp.asarray(si.std, jnp.float32),
        "tgt_mean": jnp.asarray(st.mean, jnp.float32),
        "tgt_std": jnp.asarray(st.std, jnp.float32)})

    ho = dict(np.load(dirs["prep_ev"] / "ho.npz"))
    src_wave, _ = read_wav(str(dirs["ev_src"] / "ho.wav"),
                           target_rate=cfg.dsp.sample_rate)

    t0 = time.time()
    m_init = FC.full_chain_metrics(init_p, cfg, src_wave, ho)
    m_tr = FC.full_chain_metrics(trained, cfg, src_wave, ho)
    print(f"[quality] full-chain metrics ({time.time() - t0:.0f}s)")
    for mode in m_tr:
        print(f"  {mode}: mcd {m_init[mode]['mcd_db']:.3f} -> "
              f"{m_tr[mode]['mcd_db']:.3f} dB, logf0 "
              f"{m_init[mode]['logf0_rmse']:.3f} -> "
              f"{m_tr[mode]['logf0_rmse']:.3f}, vuv "
              f"{m_tr[mode]['vuv_error']:.4f}")

    t0 = time.time()
    gap = FC.conditioning_gap(trained, cfg, ho)
    pairs = FC.converted_pairs(trained, cfg, dirs["prep_tr"])
    ft = FC.finetune_vocoder_on_converted(trained, cfg, pairs,
                                          steps=args.finetune_steps)
    gap_ft = FC.conditioning_gap(ft, cfg, ho)
    m_ft = FC.full_chain_metrics(ft, cfg, src_wave, ho,
                                 modes=("ddsp", "wave"))
    print(f"[quality] conditioning gap + fine-tune ({time.time() - t0:.0f}s)")
    for mode in gap:
        print(f"  {mode}: ratio {gap[mode]['ratio']:.4f} -> "
              f"{gap_ft[mode]['ratio']:.4f} after "
              f"{args.finetune_steps}-step fine-tune")

    doc = {
        "round": rnd,
        "recipe": {
            "corpus": "formant-class 6-pair + 1 held-out "
                      "(training.data.build_formant_corpus, fixed seeds)",
            "train_steps": args.steps,
            "finetune_converted_steps": args.finetune_steps,
            "platform": jax.devices()[0].platform,
            "note": "full_chain = held-out source WAVEFORM through the "
                    "complete STREAMED trained pipeline; output audio "
                    "re-analyzed and scored vs DTW-aligned target "
                    "features.  conditioning = vocoder loss vs the real "
                    "target waveform under ground-truth vs converted "
                    "feature conditioning (real target F0 in both).",
        },
        "full_chain_identity_baseline": m_init,
        "full_chain_trained": m_tr,
        "full_chain_trained_finetuned": m_ft,
        "vocoder_conditioning": {
            "trained": gap,
            "after_finetune_converted": gap_ft,
        },
    }
    out_path.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"[quality] wrote {out_path}")


if __name__ == "__main__":
    main()
