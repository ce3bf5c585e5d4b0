"""Objective evaluation CLI: MCD / F0 metrics between two waveforms.

The reference stack has no objective evaluation (quality was judged by
listening, SURVEY.md §4); converted-voice work normally reports
mel-cepstral distortion and F0 RMSE/correlation, so this framework ships
them: both wavs are analyzed with the same WORLD-role front-end
(dsp.world.analyze) and compared frame-by-frame on the overlapping span.

Usage:
    python -m realtime_yukarin_tpu.cli.evaluate \
        --converted_path conv.wav --target_path tgt.wav \
        [--config_path cfg.yaml]

Prints one JSON line:
{"mcd_db": ..., "logf0_rmse": ..., "vuv_error": ..., "frames": N}.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.dsp.world import analyze
from realtime_yukarin_tpu.training.evaluate import f0_metrics, mcd_db
from realtime_yukarin_tpu.utils.audio_io import read_wav


def _analyze_wav(path: str, cfg: Config):
    x, _ = read_wav(path, target_rate=cfg.dsp.sample_rate)
    num_frames = max(1, len(x) // cfg.dsp.hop)
    fn = jax.jit(lambda w: analyze(w, num_frames, cfg.dsp))
    return fn(jnp.asarray(x, jnp.float32))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--converted_path", required=True)
    p.add_argument("--target_path", required=True)
    p.add_argument("--config_path", default=None)
    args = p.parse_args(argv)

    cfg = Config.from_yaml(args.config_path) if args.config_path else Config()
    a = _analyze_wav(args.converted_path, cfg)
    b = _analyze_wav(args.target_path, cfg)

    F = min(a.f0.shape[0], b.f0.shape[0])
    mcd = float(mcd_db(a.mc[:F], b.mc[:F]))
    f0m = {k: float(v) for k, v in f0_metrics(a.f0[:F], b.f0[:F]).items()}
    print(json.dumps({"mcd_db": round(mcd, 4),
                      **{k: round(v, 4) for k, v in f0m.items()},
                      "frames": int(F)}))


if __name__ == "__main__":
    main()
