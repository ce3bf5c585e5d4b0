"""Full-chain quality evaluation: the whole product gated end-to-end.

The reference's de-facto quality check was the complete chain —
``upstream:check.py`` converts a wav through analysis -> stage 1 -> F0
transform -> stage 2 -> synthesis and a human listens (SURVEY.md §3.2,
§4).  Every per-stage gate in tests/test_training.py runs a stage in
isolation; the functions here run a held-out WAVEFORM through the complete
*streamed, trained* pipeline (every vocoder mode) and score the output
audio against the target speaker's aligned features with the repo's own
metrics (training/evaluate.py) — so an inter-stage interface regression
(e.g. the vocoder conditioned on stage-1 outputs it never saw in
training) moves a gated number instead of passing silently.

Also here: the vocoder train/inference conditioning-mismatch measurement
and the fine-tune-on-converted pass that closes it (the vocoders train on
ground-truth target features but consume stage-1/SR OUTPUTS at inference).

tools/quality.py drives these and publishes QUALITY.json at the repo root,
tracked round-over-round like BENCH_r*.json.
"""

from __future__ import annotations

import pathlib

import numpy as np

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.dsp.world import AcousticFeature, analyze
from realtime_yukarin_tpu.models.vocoder_nn import neural_vocode
from realtime_yukarin_tpu.models.vocoder_wave import waveform_vocode
from realtime_yukarin_tpu.models.voice_changer import convert_features
from realtime_yukarin_tpu.pipeline import noise_bins
from realtime_yukarin_tpu.streaming.pipeline import frame_noise
from realtime_yukarin_tpu.streaming.state import StreamGeometry
from realtime_yukarin_tpu.training import evaluate, losses
from realtime_yukarin_tpu.training.align import dtw_path


def stream_convert(params: dict, cfg: Config, wave: np.ndarray,
                   use_sr: bool = True, vocoder_mode: str = "dsp",
                   seed: int = 0) -> np.ndarray:
    """Push ``wave`` through the real streaming path chunk by chunk and
    return the converted audio aligned to the input timeline (latency
    removed) — the product's serving code path, not the offline jit."""
    from realtime_yukarin_tpu.streaming.stream import VoiceChangerStream

    stream = VoiceChangerStream(params, cfg, use_sr, seed=seed,
                                vocoder_mode=vocoder_mode)
    S = stream.chunk_samples
    x = np.asarray(wave, np.float32)
    pad = (-len(x)) % S
    if pad:
        x = np.concatenate([x, np.zeros(pad, np.float32)])
    outs = []
    for k in range(len(x) // S):
        stream.add(x[k * S: (k + 1) * S])
        outs.append(stream.process())
    outs.append(stream.flush())
    y = np.concatenate(outs)
    lat = stream.latency_samples
    return y[lat: lat + len(wave)]


def full_chain_metrics(params: dict, cfg: Config, src_wave: np.ndarray,
                       ho: dict, modes=("dsp", "ddsp", "wave"),
                       use_sr: bool = True, seed: int = 0) -> dict:
    """Convert a held-out source waveform through the complete streamed
    pipeline per vocoder mode, re-analyze the OUTPUT AUDIO, and score it
    against the aligned target-speaker features (``ho`` = the prepared
    npz dict: f0_tgt/mc_tgt on the source timeline).

    Returns {mode: {mcd_db, logf0_rmse, vuv_error}}.  MCD here includes
    the vocoder render + analysis round trip — it is the full product
    metric, comparable across params trees (the round-trip bias is
    common), not a pure stage-1 regression number.
    """
    hop = cfg.dsp.hop
    f0_tgt = jnp.asarray(ho["f0_tgt"])
    mc_tgt = jnp.asarray(ho["mc_tgt"])
    F_ho = int(f0_tgt.shape[0])
    out = {}
    for mode in modes:
        geo = StreamGeometry.from_config(cfg, use_sr, vocoder_mode=mode)
        trim = geo.model_ctx + 4
        y = stream_convert(params, cfg, src_wave, use_sr, mode, seed)
        F = len(y) // hop
        feat = analyze(jnp.asarray(y[: F * hop]), F, cfg.dsp)
        n = min(F, F_ho)
        sl = slice(trim, n - trim)
        f0m = evaluate.f0_metrics(feat.f0[sl], f0_tgt[sl])
        out[mode] = {
            "mcd_db": float(evaluate.mcd_db(feat.mc[sl], mc_tgt[sl])),
            "logf0_rmse": float(f0m["logf0_rmse"]),
            "vuv_error": float(f0m["vuv_error"]),
        }
    return out


# ---------------------------------------------------------------------------
# Vocoder conditioning mismatch (train-on-ground-truth vs infer-on-converted)
# ---------------------------------------------------------------------------

def _converted_on_target_timeline(params: dict, cfg: Config, d: dict
                                  ) -> AcousticFeature:
    """Converted features (stage 1 -> SR from the SOURCE utterance) warped
    onto the TARGET's own timeline, where the real waveform lives.

    Features warp cleanly frame-by-frame (audio does not), so the DTW
    path target-frame -> source-frame turns (converted features, real
    target audio) into a usable pair.  F0 is kept at the target's REAL
    contour: swapping only env/mc isolates the conditioning mismatch in
    the features the vocoder nets consume from the F0-contour mismatch
    (which the full-chain metric above already captures).
    """
    src = AcousticFeature(f0=jnp.asarray(d["f0_src"]),
                          env=jnp.asarray(d["env_src"]),
                          ap=jnp.asarray(d["ap_src"]),
                          mc=jnp.asarray(d["mc_src"]))
    conv = convert_features(params, src, cfg)
    idx = dtw_path(jnp.asarray(d["mc_voc"])[:, 1:],
                   jnp.asarray(d["mc_src"])[:, 1:])
    return AcousticFeature(f0=jnp.asarray(d["f0_voc"]),
                           env=conv.env[idx], ap=src.ap[idx],
                           mc=conv.mc[idx])


def _vocode(params: dict, cfg: Config, feat: AcousticFeature,
            noise: jnp.ndarray, mode: str) -> jnp.ndarray:
    ext = lambda a: jnp.concatenate([a, a[-1:]])
    args = (ext(feat.f0), ext(feat.env), ext(feat.ap), ext(feat.mc), noise)
    if mode == "ddsp":
        w, _ = neural_vocode(params["vocoder"], *args, cfg.vocoder_nn,
                             cfg.dsp)
    else:
        w, _ = waveform_vocode(params["vocoder_wave"], *args,
                               cfg.vocoder_wave, cfg.dsp)
    return w


def conditioning_gap(params: dict, cfg: Config, ho: dict, seed: int = 11
                     ) -> dict:
    """Measure each neural vocoder's degradation when conditioned on
    CONVERTED features instead of the ground-truth features it trained on,
    both scored against the same real target waveform.

    Returns {mode: {gt, converted, ratio}} — multi-resolution STFT losses;
    ratio > 1 is the conditioning-mismatch cost.
    """
    Fv = int(ho["f0_voc"].shape[0])
    noise = frame_noise(jax.random.key(seed), 0, Fv, noise_bins(cfg))
    wave_real = jnp.asarray(ho["wave_voc"])
    gt = AcousticFeature(f0=jnp.asarray(ho["f0_voc"]),
                         env=jnp.asarray(ho["env_voc"]),
                         ap=jnp.asarray(ho["ap_voc"]),
                         mc=jnp.asarray(ho["mc_voc"]))
    cw = _converted_on_target_timeline(params, cfg, ho)
    out = {}
    for mode in ("ddsp", "wave"):
        a = float(losses.multi_resolution_stft(
            _vocode(params, cfg, gt, noise, mode), wave_real))
        c = float(losses.multi_resolution_stft(
            _vocode(params, cfg, cw, noise, mode), wave_real))
        out[mode] = {"gt": a, "converted": c, "ratio": c / a}
    return out


def converted_pairs(params: dict, cfg: Config, prep_dir) -> list[dict]:
    """Build the fine-tune-on-converted dataset from a prepared corpus
    dir: for every utterance, the converted features warped onto the
    target timeline + the real target waveform."""
    pairs = []
    for p in sorted(pathlib.Path(prep_dir).glob("*.npz")):
        if p.name.startswith("stats_"):
            continue
        d = dict(np.load(p))
        cw = _converted_on_target_timeline(params, cfg, d)
        pairs.append({"f0": np.asarray(cw.f0), "env": np.asarray(cw.env),
                      "ap": np.asarray(cw.ap), "mc": np.asarray(cw.mc),
                      "wave": np.asarray(d["wave_voc"])})
    return pairs


def finetune_vocoder_on_converted(params: dict, cfg: Config,
                                  pairs: list[dict], steps: int = 200,
                                  lr: float = 3e-4, crop_frames: int = 16,
                                  batch_size: int = 8, seed: int = 0
                                  ) -> dict:
    """Fine-tune ONLY the vocoder subtrees on (converted features, real
    waveform) pairs, leaving the conversion stages frozen — closes the
    train/inference conditioning mismatch ``conditioning_gap`` measures.

    Returns a new params tree with updated ``vocoder``/``vocoder_wave``.
    """
    import optax

    from realtime_yukarin_tpu.dsp import primitives as prim
    from realtime_yukarin_tpu.models.vocoder_nn import \
        neural_vocoder_controls
    from realtime_yukarin_tpu.dsp.synthesis import render

    hop = cfg.dsp.hop
    k_noise = prim.noise_fft_size(hop) // 2 + 1
    rng = np.random.default_rng(seed)

    def sample_batch():
        f0s, envs, aps, mcs, waves = [], [], [], [], []
        for _ in range(batch_size):
            d = pairs[int(rng.integers(len(pairs)))]
            F = d["f0"].shape[0]
            o = int(rng.integers(max(F - crop_frames, 1)))
            sl = slice(o, o + crop_frames + 1)
            f0s.append(d["f0"][sl])
            envs.append(d["env"][sl])
            aps.append(d["ap"][sl])
            mcs.append(d["mc"][sl])
            waves.append(d["wave"][o * hop: (o + crop_frames) * hop])
        noise = rng.standard_normal(
            (batch_size, crop_frames, k_noise, 2)).astype(np.float32)
        return tuple(jnp.asarray(np.stack(a), jnp.float32)
                     for a in (f0s, envs, aps, mcs, waves)) + (
                         jnp.asarray(noise),)

    voc = {"vocoder": params["vocoder"],
           "vocoder_wave": params["vocoder_wave"]}

    def loss_fn(voc, batch):
        f0, env, ap, mc, wave, noise = batch

        def one_ddsp(f0, env, ap, mc, noise):
            amps, nmag, f0f, v = neural_vocoder_controls(
                voc["vocoder"], f0, env, ap, mc, cfg.vocoder_nn, cfg.dsp)
            w, _ = render(amps, nmag, f0f, v, noise, cfg.dsp)
            return w

        def one_wave(f0, env, ap, mc, noise):
            w, _ = waveform_vocode(voc["vocoder_wave"], f0, env, ap, mc,
                                   noise, cfg.vocoder_wave, cfg.dsp)
            return w

        w1 = jax.vmap(one_ddsp)(f0, env, ap, mc, noise)
        w2 = jax.vmap(one_wave)(f0, env, ap, mc, noise)
        return (losses.multi_resolution_stft(w1, wave)
                + losses.multi_resolution_stft(w2, wave))

    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(voc)

    @jax.jit
    def step(voc, opt_state, batch):
        l, g = jax.value_and_grad(loss_fn)(voc, batch)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(voc, upd), opt_state, l

    for _ in range(steps):
        voc, opt_state, _l = step(voc, opt_state, sample_batch())
    return dict(params, vocoder=voc["vocoder"],
                vocoder_wave=voc["vocoder_wave"])


# ---------------------------------------------------------------------------
# The shared training recipe (tests + tools/quality.py train identically)
# ---------------------------------------------------------------------------

def train_plain(cfg: Config, prep_dir, steps: int = 600, lr: float = 1e-3,
                batch_size: int = 8, crop_frames: int = 16, seed: int = 0,
                init_key: int = 0):
    """The deterministic tiny-config training recipe every held-out gate
    uses: plain joint objective, measured numbers in
    tests/test_training.py.  Returns (init_params, trained_params)."""
    from realtime_yukarin_tpu.models.voice_changer import init_params
    from realtime_yukarin_tpu.training.dataset import CorpusDataset
    from realtime_yukarin_tpu.training.train_step import (init_train_state,
                                                          make_optimizer,
                                                          make_train_step)

    params = init_params(jax.random.key(init_key), cfg)
    opt = make_optimizer(lr)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(cfg, opt))
    ds = CorpusDataset(str(prep_dir), cfg, crop_frames=crop_frames,
                       seed=seed)
    for _ in range(steps):
        state, _m = step(state, ds.sample_batch(batch_size))
    return params, state.params
