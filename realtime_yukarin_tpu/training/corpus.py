"""Corpus preparation: wav dirs -> aligned feature pairs + F0 statistics.

The reference's training data flow (SURVEY.md §2b) lives in yukarin /
become-yukarin dataset prep: analyze every utterance of the source and
target speakers, DTW-align same-named pairs, and compute per-speaker F0
statistics (``input_statistics.npy`` / ``target_statistics.npy``).

TPU-first details:
* analysis runs on-device via the jitted ``analyze``; utterances are
  padded up to a small set of static frame-bucket sizes so the analysis
  program compiles once per bucket, not once per file length;
* DTW alignment is the vectorized scan in ``training.align``;
* outputs are plain ``.npz`` files (one per pair) + ``stats_*.npz``,
  the shapes ``training.data.Batch`` consumes.
"""

from __future__ import annotations

import pathlib

import numpy as np

import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.dsp.world import AcousticFeature, analyze
from realtime_yukarin_tpu.models.f0_stats import F0Statistics
from realtime_yukarin_tpu.training.align import align_pair
from realtime_yukarin_tpu.utils.audio_io import read_wav


def frame_bucket(num_frames: int, bucket_frames: int) -> int:
    """Round up to the bucket grid (>= one bucket)."""
    return max(1, -(-num_frames // bucket_frames)) * bucket_frames


def analyze_file(path: str | pathlib.Path, cfg: Config,
                 bucket_frames: int = 200
                 ) -> tuple[AcousticFeature, int, np.ndarray]:
    """Analyze one wav on-device.

    Pads to a static frame bucket (compile once per bucket) and returns
    (features over the padded length, true_num_frames, raw audio at the
    internal rate — the vocoder stages' REAL training target).
    """
    x, _ = read_wav(str(path), target_rate=cfg.dsp.sample_rate)
    hop = cfg.dsp.hop
    true_frames = max(1, len(x) // hop)
    F = frame_bucket(true_frames, bucket_frames)
    pad = F * hop - len(x)
    if pad > 0:
        x = np.concatenate([x, np.zeros(pad, np.float32)])
    feat = analyze(jnp.asarray(x[: F * hop]), F, cfg.dsp)
    return feat, true_frames, np.asarray(x[: F * hop], np.float32)


def _crop(feat: AcousticFeature, n: int) -> AcousticFeature:
    return AcousticFeature(f0=np.asarray(feat.f0[:n]),
                           env=np.asarray(feat.env[:n]),
                           ap=np.asarray(feat.ap[:n]),
                           mc=np.asarray(feat.mc[:n]))


def paired_wavs(src_dir: str, tgt_dir: str) -> list[tuple[pathlib.Path,
                                                          pathlib.Path]]:
    """Same-stem wav pairing, as the reference corpora are organized."""
    src = {p.stem: p for p in sorted(pathlib.Path(src_dir).glob("*.wav"))}
    tgt = {p.stem: p for p in sorted(pathlib.Path(tgt_dir).glob("*.wav"))}
    stems = sorted(set(src) & set(tgt))
    return [(src[s], tgt[s]) for s in stems]


def prepare_corpus(src_dir: str, tgt_dir: str, out_dir: str, cfg: Config,
                   bucket_frames: int = 200, verbose: bool = True) -> dict:
    """Full prep: analyze + align every pair, save per-pair npz + F0 stats.

    Each ``<stem>.npz`` holds source features and target features warped
    onto the source timeline (f0/mc/ap/env_src + *_tgt aligned).
    Returns a summary dict (pair count, stats).
    """
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pairs = paired_wavs(src_dir, tgt_dir)
    if not pairs:
        raise FileNotFoundError(
            f"no same-stem wav pairs under {src_dir} / {tgt_dir}")

    f0_src_all: list[np.ndarray] = []
    f0_tgt_all: list[np.ndarray] = []
    for sp, tp in pairs:
        fs, ns, _ = analyze_file(sp, cfg, bucket_frames)
        ft, nt, tgt_wave = analyze_file(tp, cfg, bucket_frames)
        fs_c, ft_c = _crop(fs, ns), _crop(ft, nt)
        aligned = align_pair(jnp.asarray(fs_c.mc), AcousticFeature(
            f0=jnp.asarray(ft_c.f0), env=jnp.asarray(ft_c.env),
            ap=jnp.asarray(ft_c.ap), mc=jnp.asarray(ft_c.mc)))
        # *_voc: the target speaker on its OWN timeline + the raw audio —
        # the self-vocoding pair (vocoding needs no alignment; VERDICT r3
        # missing #1: a DSP-rendered wave target makes the neural
        # vocoders distill WORLD instead of learning real structure)
        np.savez(out / f"{sp.stem}.npz",
                 f0_src=np.asarray(fs_c.f0), mc_src=np.asarray(fs_c.mc),
                 ap_src=np.asarray(fs_c.ap), env_src=np.asarray(fs_c.env),
                 f0_tgt=np.asarray(aligned.f0), mc_tgt=np.asarray(aligned.mc),
                 ap_tgt=np.asarray(aligned.ap), env_tgt=np.asarray(aligned.env),
                 f0_voc=np.asarray(ft_c.f0), mc_voc=np.asarray(ft_c.mc),
                 ap_voc=np.asarray(ft_c.ap), env_voc=np.asarray(ft_c.env),
                 wave_voc=tgt_wave[: nt * cfg.dsp.hop])
        f0_src_all.append(np.asarray(fs_c.f0))
        f0_tgt_all.append(np.asarray(ft_c.f0))  # unaligned: true speaker stats
        if verbose:
            print(f"[prepare] {sp.stem}: src {ns}f, tgt {nt}f")

    stats_src = F0Statistics.from_f0(np.concatenate(f0_src_all))
    stats_tgt = F0Statistics.from_f0(np.concatenate(f0_tgt_all))
    stats_src.save(out / "stats_input.npz")
    stats_tgt.save(out / "stats_target.npz")
    return {"num_pairs": len(pairs),
            "stats_input": stats_src, "stats_target": stats_tgt}
