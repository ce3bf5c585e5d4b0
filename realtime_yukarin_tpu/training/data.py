"""Synthetic paired-speaker data for training/tests.

No speech corpora exist in this environment (zero egress), so training
plumbing is exercised with self-generated pairs: a "source speaker"
harmonic+noise utterance and a "target speaker" version derived by a known
transform (F0 ratio + spectral tilt + formant-ish warp).  The DSP analysis
of both sides yields exactly the feature pairs the real trainers would use
(yukarin: aligned mc pairs; become-yukarin: envelope pairs, SURVEY.md §2b).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.world import analyze
from realtime_yukarin_tpu.training.train_step import Batch


def synth_utterance(rng: np.random.Generator, seconds: float, fs: int,
                    f0_base: float, tilt: float) -> np.ndarray:
    """Randomized harmonic+noise utterance with voiced/unvoiced segments."""
    n = int(seconds * fs)
    t = np.arange(n) / fs
    f0 = f0_base * (1.0 + 0.15 * np.sin(2 * np.pi * rng.uniform(1, 4) * t)
                    + 0.05 * rng.standard_normal())
    ph = 2 * np.pi * np.cumsum(f0) / fs
    gate = (np.sin(2 * np.pi * rng.uniform(0.5, 1.5) * t
                   + rng.uniform(0, 6)) > -0.4).astype(float)
    x = np.zeros(n)
    for h in range(1, 9):
        amp = (1.0 / h) * np.exp(-tilt * h)
        x += amp * np.sin(h * ph)
    am = 0.25 + 0.15 * np.sin(2 * np.pi * rng.uniform(2, 5) * t)
    return (gate * am * x + 0.02 * rng.standard_normal(n)).astype(np.float32)


def formant_utterance(structure_seed: int, rng: np.random.Generator,
                      seconds: float, fs: int, f0_base: float = 150.0,
                      formant_scale: float = 1.0, tilt: float = 0.1,
                      inharmonic: float = 0.0) -> np.ndarray:
    """Formant-synthesized training utterance (speech-realistic corpus
    class, VERDICT r3 missing #5): glottal pulse train with jitter and
    shimmer through a 3-resonator Klatt-style filter, with voiced gaps
    and an aspiration floor.

    Speaker identity = (f0_base, formant_scale, tilt, inharmonic):
    formant_scale models vocal-tract length (all formants shift), tilt
    the glottal spectral slope — a consistent, learnable conversion
    map.  ``inharmonic`` adds a NON-harmonic partial tracking 1.62*f0
    (a subglottal-/nasal-side-resonance stand-in): real voices carry
    feature-correlated structure OUTSIDE the harmonic+noise model
    class, which is exactly what a WORLD-equivalent renderer cannot
    produce and the neural vocoders' real-waveform training must learn
    (tests/test_training.py held-out gate; VERDICT r3 missing #1).
    The SEGMENTAL structure (vowel, gate timing, vibrato rate) comes
    from ``structure_seed`` so a source/target pair built with the same
    seed is the "same sentence" for DTW; sample-level detail (jitter,
    shimmer, noise) comes from ``rng`` and differs per rendition.
    """
    from scipy.signal import lfilter
    srng = np.random.default_rng(structure_seed)
    n = int(seconds * fs)
    t = np.arange(n) / fs
    vowels = ((730.0, 1090.0, 2440.0), (270.0, 2290.0, 3010.0),
              (570.0, 840.0, 2410.0), (440.0, 1020.0, 2240.0))
    F123 = np.asarray(vowels[int(srng.integers(len(vowels)))])
    F123 = F123 * formant_scale
    gate_f, gate_ph = srng.uniform(0.5, 1.5), srng.uniform(0, 6)
    vib = srng.uniform(3.0, 6.0)

    gate = (np.sin(2 * np.pi * gate_f * t + gate_ph) > -0.4).astype(float)
    k = np.exp(-1.0 / (0.004 * fs))
    jit = lfilter([1 - k], [1, -k], rng.standard_normal(n))
    f0 = f0_base * (1.0 + 0.02 * np.sin(2 * np.pi * vib * t)) \
        * (1.0 + 0.05 * jit)
    phase = np.cumsum(f0 * gate) / fs
    pulses = np.diff(np.floor(phase), prepend=0.0) > 0
    src = np.zeros(n)
    idx = np.nonzero(pulses)[0]
    src[idx] = 1.0 + 0.08 * rng.standard_normal(len(idx))
    src += 0.015 * rng.standard_normal(n) * gate      # aspiration

    y = np.zeros(n)
    bws = (90.0, 110.0, 150.0)
    for i, (Fi, bw) in enumerate(zip(F123, bws)):
        r = np.exp(-np.pi * bw / fs)
        a1, a2 = 2 * r * np.cos(2 * np.pi * Fi / fs), -r * r
        w = (1.0, 0.7, 0.4)[i] * np.exp(-tilt * (i + 1))
        y += w * lfilter([1.0 - r], [1.0, -a1, -a2], src)
    y += 0.02 * rng.standard_normal(n)                # unvoiced floor
    y = 0.4 * y / (np.abs(y).max() + 1e-9)
    if inharmonic:
        ph = 2 * np.pi * np.cumsum(1.62 * f0 * gate) / fs
        y = y + inharmonic * 0.4 * np.sin(ph) * gate
    return y.astype(np.float32)


def build_formant_corpus(root, cfg: Config, n_train: int = 6,
                         seed: int = 3, heldout_seed: int = 100,
                         verbose: bool = False) -> dict:
    """Write + prepare the two-speaker formant-class corpus used by the
    held-out training gates and the quality tool (tools/quality.py).

    Source speaker: 140 Hz / neutral tract / bright tilt.  Target: 200 Hz
    / shorter tract (0.8) / darker tilt / a -22 dB inharmonic partial at
    1.62*f0 (structure outside the harmonic+noise model class — what the
    neural vocoders must learn from the real waveform).  Same
    ``structure_seed`` per pair = same "sentence" for DTW; the target is
    10% slower.  Deterministic: the rng consumption order is fixed, so
    every caller (tests, tools) trains on byte-identical audio.

    Returns {"src","tgt","ev_src","ev_tgt","prep_tr","prep_ev"} paths;
    ``prep_tr``/``prep_ev`` hold the prepared npz pairs + F0 stats.
    """
    import pathlib

    from realtime_yukarin_tpu.training.corpus import prepare_corpus
    from realtime_yukarin_tpu.utils.audio_io import write_wav

    root = pathlib.Path(root)
    dirs = {n: root / n for n in
            ("src", "tgt", "ev_src", "ev_tgt", "prep_tr", "prep_ev")}
    for d in dirs.values():
        d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    fs = cfg.dsp.sample_rate
    for k in range(n_train):
        write_wav(str(dirs["src"] / f"utt{k}.wav"),
                  formant_utterance(k, rng, 0.6, fs, 140.0, 1.0, 0.1), fs)
        write_wav(str(dirs["tgt"] / f"utt{k}.wav"),
                  formant_utterance(k, rng, 0.66, fs, 200.0, 0.8, 0.5,
                                    inharmonic=0.08), fs)
    write_wav(str(dirs["ev_src"] / "ho.wav"),
              formant_utterance(heldout_seed, rng, 0.6, fs, 140.0, 1.0,
                                0.1), fs)
    write_wav(str(dirs["ev_tgt"] / "ho.wav"),
              formant_utterance(heldout_seed, rng, 0.66, fs, 200.0, 0.8,
                                0.5, inharmonic=0.08), fs)
    prepare_corpus(str(dirs["src"]), str(dirs["tgt"]), str(dirs["prep_tr"]),
                   cfg, bucket_frames=32, verbose=verbose)
    prepare_corpus(str(dirs["ev_src"]), str(dirs["ev_tgt"]),
                   str(dirs["prep_ev"]), cfg, bucket_frames=32,
                   verbose=verbose)
    return dirs


def make_batch(cfg: Config, batch_size: int, seconds: float = 0.5,
               seed: int = 0, f0_ratio: float = 1.4,
               tilt_src: float = 0.1, tilt_tgt: float = 0.3) -> Batch:
    """Analyzes source/target pairs into a training Batch (host-side)."""
    rng = np.random.default_rng(seed)
    fs = cfg.dsp.sample_rate
    hop = cfg.dsp.hop
    F = int(seconds * fs) // hop
    k_noise = prim.noise_fft_size(hop) // 2 + 1

    f0s, mcs, aps = [], [], []
    f0t, mct, envt, apt, wavet = [], [], [], [], []
    for b in range(batch_size):
        base = rng.uniform(110, 220)
        src = synth_utterance(rng, seconds, fs, base, tilt_src)
        tgt = synth_utterance(rng, seconds, fs, base * f0_ratio, tilt_tgt)
        fs_feat = analyze(jnp.asarray(src[: F * hop]), F, cfg.dsp)
        ft_feat = analyze(jnp.asarray(tgt[: F * hop]), F, cfg.dsp)

        def ext(a):
            return np.concatenate([np.asarray(a), np.asarray(a)[-1:]], 0)

        f0s.append(ext(fs_feat.f0))
        mcs.append(ext(fs_feat.mc))
        aps.append(ext(fs_feat.ap))
        f0t.append(ext(ft_feat.f0))
        mct.append(ext(ft_feat.mc))
        envt.append(ext(ft_feat.env))
        apt.append(ext(ft_feat.ap))
        wavet.append(tgt[: F * hop])

    noise = rng.standard_normal((batch_size, F, k_noise, 2)).astype(
        np.float32)
    # self-vocoding rows coincide with the target utterance's own
    # features here (synthetic pairs share one timeline); wave_voc is
    # the REAL target waveform, never a render
    f0t, mct, envt, apt = (jnp.asarray(np.stack(a), jnp.float32)
                           for a in (f0t, mct, envt, apt))
    return Batch(
        f0_src=jnp.asarray(np.stack(f0s), jnp.float32),
        mc_src=jnp.asarray(np.stack(mcs), jnp.float32),
        ap_src=jnp.asarray(np.stack(aps), jnp.float32),
        f0_tgt=f0t, mc_tgt=mct, env_tgt=envt,
        f0_voc=f0t, mc_voc=mct, ap_voc=apt, env_voc=envt,
        wave_voc=jnp.asarray(np.stack(wavet), jnp.float32),
        noise=jnp.asarray(noise),
    )
