"""Native runtime tests: SPSC ring buffer (incl. threaded stress) + WAV io."""

import threading

import numpy as np
import pytest

rt = pytest.importorskip("realtime_yukarin_tpu.runtime")


def test_ring_buffer_roundtrip():
    rb = rt.RingBuffer(1024)
    assert rb.capacity == 1024
    x = np.arange(300, dtype=np.float32)
    assert rb.push(x) == 300
    assert rb.available == 300
    y = rb.pop(300)
    np.testing.assert_array_equal(x, y)
    assert rb.available == 0


def test_ring_buffer_wraparound():
    rb = rt.RingBuffer(256)
    for it in range(50):                 # forces many wraps
        x = np.full(100, it, np.float32)
        assert rb.push(x) == 100
        y = rb.pop(100)
        np.testing.assert_array_equal(y, x)


def test_ring_buffer_overrun_drop():
    rb = rt.RingBuffer(128)
    pushed = rb.push(np.zeros(200, np.float32))
    assert pushed == 128
    assert rb.overruns == 1


def test_silence_on_underrun():
    rb = rt.RingBuffer(256)
    rb.push(np.ones(50, np.float32))
    out, ok = rb.pop_chunk_or_silence(100)
    assert not ok
    np.testing.assert_array_equal(out, np.zeros(100, np.float32))
    assert rb.underruns == 1
    # the 50 queued samples are still there
    np.testing.assert_array_equal(rb.pop(50), np.ones(50, np.float32))


def test_ring_buffer_threaded_spsc():
    """Producer/consumer on separate threads: all data arrives in order."""
    rb = rt.RingBuffer(1 << 12)
    total = 200_000
    src = np.random.default_rng(0).standard_normal(total).astype(np.float32)
    got = []

    def producer():
        pos = 0
        while pos < total:
            n = rb.push(src[pos: pos + 997])
            pos += n

    def consumer():
        count = 0
        while count < total:
            y = rb.pop(1024)
            if len(y):
                got.append(y)
                count += len(y)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start()
    tc.start()
    tp.join()
    tc.join()
    out = np.concatenate(got)
    np.testing.assert_array_equal(out, src)
    assert rb.underruns == 0


def test_wav_native_roundtrip(tmp_path):
    fs = 24000
    x = (0.5 * np.sin(2 * np.pi * 220 * np.arange(fs) / fs)
         ).astype(np.float32)
    path = str(tmp_path / "t.wav")
    rt.write_wav_native(path, x, fs)
    y, rate = rt.read_wav_native(path)
    assert rate == fs
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_wav_native_matches_python_io(tmp_path):
    from realtime_yukarin_tpu.utils.audio_io import read_wav, write_wav
    fs = 24000
    x = np.random.default_rng(1).uniform(-0.9, 0.9, fs // 2).astype(
        np.float32)
    p1 = str(tmp_path / "a.wav")
    write_wav(p1, x, fs)                  # python writer
    y_native, r1 = rt.read_wav_native(p1)  # native reader
    y_py, r2 = read_wav(p1)
    assert r1 == r2 == fs
    np.testing.assert_allclose(y_native, y_py, atol=1e-6)
