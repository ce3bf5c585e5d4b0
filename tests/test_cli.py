"""End-to-end CLI tests — the reference's run.py / check.py contracts.

upstream:check.py (offline file->file) and upstream:run.py (realtime loop)
are exercised here through the installed CLIs, in-process, on the 8-device
CPU harness, with a tiny model config written to YAML.
"""

import json

import numpy as np
import pytest

from realtime_yukarin_tpu.utils.audio_io import read_wav, write_wav

from conftest import make_test_signal

TINY_YAML = """
acoustic: {hidden: 32, num_blocks: 2}
super_resolution: {hidden: 64, num_blocks: 2}
vocoder_nn: {hidden: 32, num_blocks: 2}
"""


@pytest.fixture(scope="module")
def tiny_cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    p.write_text(TINY_YAML)
    return str(p)


@pytest.fixture(scope="module")
def input_wav(tmp_path_factory):
    from realtime_yukarin_tpu.config import DspConfig
    fs = DspConfig().sample_rate
    p = tmp_path_factory.mktemp("wav") / "in.wav"
    write_wav(str(p), make_test_signal("speechlike", 0.8, fs), fs)
    return str(p)


def test_convert_cli_file_to_file(tiny_cfg_path, input_wav, tmp_path):
    from realtime_yukarin_tpu.cli.convert import main
    out = tmp_path / "out.wav"
    main(["--input_path", input_wav, "--output_path", str(out),
          "--config_path", tiny_cfg_path])
    y, fs = read_wav(str(out))
    x, _ = read_wav(input_wav)
    assert len(y) > 0 and np.isfinite(y).all()
    assert abs(len(y) - len(x)) < fs  # same length up to edge padding


def test_serve_cli_simulated_realtime(tiny_cfg_path, input_wav, tmp_path):
    from realtime_yukarin_tpu.cli.serve import main
    out = tmp_path / "out.wav"
    main(["--input_wav", input_wav, "--output_wav", str(out),
          "--config_path", tiny_cfg_path])
    y, _ = read_wav(str(out))
    assert len(y) > 0 and np.isfinite(y).all()


def test_serve_cli_profile_trace(tiny_cfg_path, input_wav, tmp_path):
    """--profile_dir writes a non-empty jax.profiler trace."""
    from realtime_yukarin_tpu.cli.serve import main
    prof = tmp_path / "trace"
    main(["--input_wav", input_wav, "--output_wav",
          str(tmp_path / "o.wav"), "--config_path", tiny_cfg_path,
          "--profile_dir", str(prof)])
    files = list(prof.rglob("*"))
    assert any(f.is_file() for f in files), "no trace files written"


def test_evaluate_cli(tiny_cfg_path, input_wav, tmp_path, capsys):
    """MCD/F0 metrics between a wav and itself are (near) zero; against a
    converted version they are positive and finite."""
    import json
    from realtime_yukarin_tpu.cli.convert import main as convert_main
    from realtime_yukarin_tpu.cli.evaluate import main as eval_main

    out = tmp_path / "conv.wav"
    convert_main(["--input_path", input_wav, "--output_path", str(out),
                  "--config_path", tiny_cfg_path])

    eval_main(["--converted_path", input_wav, "--target_path", input_wav])
    self_m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert self_m["mcd_db"] < 1e-3 and self_m["logf0_rmse"] < 1e-4

    eval_main(["--converted_path", str(out), "--target_path", input_wav])
    conv_m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(conv_m["mcd_db"]) and conv_m["frames"] > 0
