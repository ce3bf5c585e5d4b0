"""Live mic/speaker front-end (upstream:run.py PyAudio loop) — headless.

A fake audio backend drives the capture/playback callbacks from plain
threads at (sped-up) realtime pace, so the full live loop — capture
callback -> native input ring -> fused device step -> output ring ->
playback callback with silence-on-underrun — runs in CI without hardware.
"""

import threading
import time

import numpy as np
import pytest

from conftest import make_test_signal

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.runtime import live_audio
from realtime_yukarin_tpu.runtime.live_audio import (LiveSession,
                                                     PyAudioBackend,
                                                     format_device_table,
                                                     resolve_device)

TINY = {"acoustic": {"hidden": 32, "num_blocks": 2},
        "super_resolution": {"hidden": 64, "num_blocks": 2},
        "vocoder_nn": {"hidden": 32, "num_blocks": 2}}

DEVICES = [
    {"index": 0, "name": "Fake Microphone (USB)", "max_input_channels": 1,
     "max_output_channels": 0},
    {"index": 1, "name": "Fake Speakers (HDMI)", "max_input_channels": 0,
     "max_output_channels": 2},
    {"index": 2, "name": "Fake Duplex", "max_input_channels": 2,
     "max_output_channels": 2},
]


class _FakeStream:
    """Context manager driving a callback from a thread at fixed pace."""

    def __init__(self, tick_fn, interval_s: float):
        self._tick = tick_fn
        self._interval = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        while not self._stop.is_set():
            self._tick()
            time.sleep(self._interval)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=10)


class FakeBackend:
    """Headless backend: plays ``audio`` into the capture callback block by
    block and records everything the playback callback produces."""

    def __init__(self, audio: np.ndarray, speed: float = 4.0):
        self._audio = np.asarray(audio, np.float32)
        self._speed = speed
        self.played: list[np.ndarray] = []
        self.input_done = threading.Event()

    def list_devices(self):
        return DEVICES

    def input_stream(self, rate, block, device_index, callback):
        assert device_index in (None, 0, 2)
        pos = [0]

        def tick():
            if pos[0] >= len(self._audio):
                self.input_done.set()
                return
            callback(self._audio[pos[0]: pos[0] + block])
            pos[0] += block

        return _FakeStream(tick, block / rate / self._speed)

    def output_stream(self, rate, block, device_index, callback):
        assert device_index in (None, 1, 2)

        def tick():
            out = callback(block)
            assert len(out) == block
            self.played.append(np.asarray(out, np.float32))

        return _FakeStream(tick, block / rate / self._speed)


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config.from_dict(dict(TINY))


def test_resolve_device_by_name_substring_and_index():
    assert resolve_device(DEVICES, None, "input") is None
    assert resolve_device(DEVICES, "microphone", "input") == 0
    assert resolve_device(DEVICES, "hdmi", "output") == 1
    assert resolve_device(DEVICES, "fake", "output") == 1   # first eligible
    assert resolve_device(DEVICES, "2", "input") == 2
    with pytest.raises(ValueError):          # speakers are not a mic
        resolve_device(DEVICES, "speakers", "input")
    with pytest.raises(ValueError):          # mic index is not an output
        resolve_device(DEVICES, 0, "output")
    assert "Fake Duplex" in format_device_table(DEVICES)


def test_live_session_end_to_end(tiny_cfg):
    """Mic audio goes in through callbacks; converted audio comes back out."""
    import jax
    from realtime_yukarin_tpu.models.voice_changer import init_params
    from realtime_yukarin_tpu.runtime.pipelined import PipelinedStream

    cfg = tiny_cfg
    fs = cfg.dsp.in_rate
    audio = make_test_signal("speechlike", 0.6, fs).astype(np.float32)
    backend = FakeBackend(audio, speed=4.0)
    params = init_params(jax.random.key(0), cfg)

    with PipelinedStream(params, cfg, depth=2) as stream:
        session = LiveSession(stream, cfg, backend,
                              input_device="microphone",
                              output_device="speakers")
        stop = threading.Event()

        def stop_after_drain():
            backend.input_done.wait(timeout=30)
            # let the pipeline latency drain through the speaker ticks
            time.sleep(0.5)
            stop.set()

        threading.Thread(target=stop_after_drain, daemon=True).start()
        session.run(stop=stop)

    played = np.concatenate(backend.played)
    assert np.isfinite(played).all()
    # converted speech energy made it to the speaker (not just underrun
    # silence): identity-init conversion of speechlike audio is non-silent
    assert float(np.abs(played).max()) > 0.01
    assert float(np.square(played).sum()) > 0.1
    assert stream.metrics.chunk_latency.count >= 3


def test_pyaudio_adapter_plumbs_bytes():
    """The PyAudio adapter marshals float32 bytes both ways correctly."""

    class FakePAStream:
        def __init__(self, cb):
            self.cb = cb
            self.started = self.stopped = self.closed = False

        def start_stream(self):
            self.started = True

        def stop_stream(self):
            self.stopped = True

        def close(self):
            self.closed = True

    class FakePA:
        def __init__(self):
            self.opened = []

        def get_device_count(self):
            return 1

        def get_device_info_by_index(self, i):
            return {"name": "pa-dev", "maxInputChannels": 1,
                    "maxOutputChannels": 2}

        def open(self, **kw):
            s = FakePAStream(kw["stream_callback"])
            self.opened.append((kw, s))
            return s

    class FakePAModule:
        paFloat32 = 1
        paContinue = 0
        PyAudio = FakePA

    backend = PyAudioBackend(FakePAModule)
    devs = backend.list_devices()
    assert devs[0]["name"] == "pa-dev" and devs[0]["max_input_channels"] == 1

    got = []
    with backend.input_stream(24000, 128, None, got.append):
        kw, s = backend._pa.opened[-1]
        assert kw["input"] and kw["rate"] == 24000 and s.started
        x = np.arange(128, dtype=np.float32)
        data, flag = s.cb(x.tobytes(), 128, {}, 0)
        assert data is None and flag == FakePAModule.paContinue
    assert s.stopped and s.closed
    np.testing.assert_array_equal(got[0], np.arange(128, dtype=np.float32))

    with backend.output_stream(24000, 64, None,
                               lambda n: np.full(n, 0.5, np.float32)):
        kw, s = backend._pa.opened[-1]
        assert kw["output"] and s.started
        data, flag = s.cb(None, 64, {}, 0)
        np.testing.assert_array_equal(np.frombuffer(data, np.float32),
                                      np.full(64, 0.5, np.float32))


def test_serve_cli_live_mode(tmp_path, monkeypatch, capsys):
    """`serve --live` runs the mic->speaker loop on the injected backend;
    `--list_devices` prints the device table."""
    import yaml
    from realtime_yukarin_tpu.cli.serve import main

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(
        {**TINY, "input_device": "microphone",
         "output_device": "speakers"}))

    fs = Config.from_dict(dict(TINY)).dsp.in_rate
    audio = make_test_signal("harmonic", 0.4, fs).astype(np.float32)
    backend = FakeBackend(audio, speed=4.0)
    monkeypatch.setattr(live_audio, "load_backend", lambda name: backend)

    main(["--live", "--duration", "1.2", "--config_path", str(cfg_path)])
    played = np.concatenate(backend.played)
    assert np.isfinite(played).all() and len(played) > 0

    main(["--list_devices"])
    out = capsys.readouterr().out
    assert "Fake Duplex" in out and "idx" in out
