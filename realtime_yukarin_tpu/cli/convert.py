"""Offline file-to-file conversion CLI — ``upstream:check.py`` equivalent.

Usage:
    python -m realtime_yukarin_tpu.cli.convert \
        --input_path in.wav --output_path out.wav \
        [--config_path config.yaml] [--params_path params.msgpack] \
        [--neural_vocoder] [--no_sr]

SURVEY.md §3.2: the reference's check.py is the de-facto integration test —
chunked file->file conversion through the same streaming stages.  Here the
offline path is a single jitted device program (pipeline.offline_convert);
the chunked-streaming path is exercised by ``cli.serve`` and tested
equivalent to this one on the interior (tests/test_streaming.py).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.models.voice_changer import (init_params,
                                                       load_all_params)
from realtime_yukarin_tpu.pipeline import offline_convert_io
from realtime_yukarin_tpu.utils.audio_io import read_wav, write_wav


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--config_path", default=None)
    p.add_argument("--params_path", default=None)
    p.add_argument("--neural_vocoder", action="store_true",
                   help="legacy spelling of --vocoder ddsp")
    p.add_argument("--vocoder", choices=["dsp", "ddsp", "wave"],
                   default=None, help="synthesis stage (default: config)")
    p.add_argument("--no_sr", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = Config.from_yaml(args.config_path) if args.config_path else Config()
    params = init_params(jax.random.key(cfg.seed), cfg)
    params = load_all_params(params, cfg, params_path=args.params_path)
    mode = (args.vocoder or ("ddsp" if args.neural_vocoder
                             else cfg.resolved_vocoder_mode))

    # files are read at the configured INPUT rate and written at the
    # OUTPUT rate; the device pipeline resamples to/from the internal
    # rate itself (pipeline.offline_convert_io)
    x, rate = read_wav(args.input_path, target_rate=cfg.dsp.in_rate)
    y = offline_convert_io(params, jnp.asarray(x), jax.random.key(args.seed),
                           cfg, use_sr=not args.no_sr, vocoder_mode=mode)
    write_wav(args.output_path, np.asarray(y), cfg.dsp.out_rate)
    print(f"wrote {args.output_path}: {len(np.asarray(y))} samples "
          f"@ {cfg.dsp.out_rate} Hz")


if __name__ == "__main__":
    main()
