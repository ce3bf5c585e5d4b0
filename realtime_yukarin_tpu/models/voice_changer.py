"""VoiceChanger — composition of both model stages + F0 transform.

Counterpart of ``upstream:realtime_voice_conversion/yukarin_wrapper/
voice_changer.py`` (SURVEY.md §2a, §3.1): composes the stage-1 acoustic
converter, the log-linear F0 statistics transform, and the stage-2
super-resolution into one feature->feature mapping.  Here the whole
composition is a pure function of a params pytree, so it jits, shards, and
differentiates as a unit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import flax.serialization

from realtime_yukarin_tpu.config import Config
from realtime_yukarin_tpu.dsp.mcep import decode_mcep, encode_mcep
from realtime_yukarin_tpu.dsp.world import AcousticFeature
from realtime_yukarin_tpu.models.acoustic import (AcousticNet,
                                                  acoustic_inputs,
                                                  convert_mc)
from realtime_yukarin_tpu.models.super_resolution import (SRNet,
                                                          refine_envelope)
from realtime_yukarin_tpu.models.vocoder_nn import init_vocoder_params


def init_params(key: jax.Array, cfg: Config, dtype=jnp.float32) -> dict:
    """Initialize the full parameter pytree (both stages + both neural
    vocoders + F0 statistics as device scalars)."""
    from realtime_yukarin_tpu.models.vocoder_wave import init_wave_params
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d_in = cfg.dsp.mc_dim + (2 if cfg.acoustic.use_f0_input else 0)
    stage1 = AcousticNet(cfg.acoustic, cfg.dsp.mc_dim, dtype).init(
        k1, jnp.zeros((1, 8, d_in), jnp.float32))
    stage2 = SRNet(cfg.super_resolution, cfg.dsp.spec_bins, dtype).init(
        k2, jnp.zeros((1, 8, cfg.dsp.spec_bins), jnp.float32))
    vocoder = init_vocoder_params(k3, cfg.vocoder_nn, cfg.dsp, dtype)
    vocoder_wave = init_wave_params(k4, cfg.vocoder_wave, cfg.dsp, dtype)
    f0_stats = {
        "src_mean": jnp.asarray(np.log(160.0), jnp.float32),
        "src_std": jnp.asarray(0.25, jnp.float32),
        "tgt_mean": jnp.asarray(np.log(160.0), jnp.float32),
        "tgt_std": jnp.asarray(0.25, jnp.float32),
    }
    return {"stage1": stage1, "stage2": stage2, "vocoder": vocoder,
            "vocoder_wave": vocoder_wave, "f0_stats": f0_stats}


def convert_f0_stats(f0: jnp.ndarray, stats: dict) -> jnp.ndarray:
    voiced = f0 > 0
    logf0 = jnp.log(jnp.maximum(f0, 1e-6))
    out = jnp.exp((logf0 - stats["src_mean"])
                  / jnp.maximum(stats["src_std"], 1e-6)
                  * stats["tgt_std"] + stats["tgt_mean"])
    return jnp.where(voiced, out, 0.0)


def compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def convert_features(params: dict, feat: AcousticFeature, cfg: Config,
                     use_sr: bool = True, dtype=None) -> AcousticFeature:
    """feature -> converted feature (SURVEY.md §3.1 convert_worker body):
    F0 moment matching, stage-1 mc mapping, mc->envelope decode, stage-2
    envelope super-resolution; aperiodicity passes through."""
    if dtype is None:
        dtype = compute_dtype(cfg)
    f0c = convert_f0_stats(feat.f0, params["f0_stats"])
    mc_c = convert_mc(params["stage1"], feat.mc, feat.f0, cfg.acoustic,
                      cfg.dsp, dtype)
    env_low = decode_mcep(mc_c, cfg.dsp)
    if use_sr:
        env_c = refine_envelope(params["stage2"], env_low,
                                cfg.super_resolution, cfg.dsp, dtype)
    else:
        env_c = env_low
    return AcousticFeature(f0=f0c, env=env_c, ap=feat.ap, mc=mc_c)


def convert_window(params: dict, feat: AcousticFeature, cfg: Config,
                   t0: int, out_frames: int, vocoder_halo: int = 0,
                   use_sr: bool = True, dtype=None) -> AcousticFeature:
    """Streaming variant of :func:`convert_features`: produce converted
    features for window frames [t0 - vocoder_halo, t0 + out_frames +
    vocoder_halo) only, running each stage on exactly the slice its
    receptive field requires (SAME-padded convs are bit-identical to the
    full-window computation on any interior slice).

    The super-resolution stage sees its own ``context_frames`` halo around
    the requested range; the extra ``vocoder_halo`` keeps the neural
    vocoder's conv context intact for the caller (which trims it after its
    control net).  Stage 1 still runs on the full window — its receptive
    field spans it by construction (StreamGeometry.model_ctx)."""
    if dtype is None:
        dtype = compute_dtype(cfg)
    ctx_sr = cfg.super_resolution.context_frames if use_sr else 0
    s = t0 - vocoder_halo
    Lv = out_frames + 2 * vocoder_halo

    f0c = convert_f0_stats(feat.f0, params["f0_stats"])
    mc_c = convert_mc(params["stage1"], feat.mc, feat.f0, cfg.acoustic,
                      cfg.dsp, dtype)
    env_low = decode_mcep(mc_c[s - ctx_sr: s + Lv + ctx_sr], cfg.dsp)
    if use_sr:
        env_mid = refine_envelope(params["stage2"], env_low,
                                  cfg.super_resolution, cfg.dsp, dtype)
        env_v = env_mid[ctx_sr: ctx_sr + Lv]
    else:
        env_v = env_low
    return AcousticFeature(f0=f0c[s: s + Lv], env=env_v,
                           ap=feat.ap[s: s + Lv], mc=mc_c[s: s + Lv])


# ---------------------------------------------------------------------------
# Parameter (de)serialization — the reference loads Chainer .npz snapshots
# (SURVEY.md §3.3).  Two formats, dispatched on extension everywhere:
#   *.msgpack (default): one flax msgpack blob (the training checkpoint
#     format, training/checkpoint.py)
#   *.npz: one array per parameter under its slash-joined tree path —
#     Chainer's serializer layout (``chainer.serializers.save_npz`` writes
#     e.g. "predictor/conv1/W"), so snapshots are flat, inspectable with
#     plain numpy, and loadable with no flax/framework dependency.  Loads
#     are strict: missing/extra/mis-shaped names raise (a silent partial
#     load of a voice model would be an audible bug, not a crash).
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(getattr(p, "idx", p)))
    return "/".join(parts)


def flatten_params(params) -> dict[str, np.ndarray]:
    """Pytree -> {slash/joined/path: array} (Chainer npz layout)."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    return {_path_str(path): np.asarray(leaf) for path, leaf in leaves}


def unflatten_params(template, flat: dict[str, np.ndarray]):
    """Strict inverse of :func:`flatten_params` against a template tree."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    names = [_path_str(p) for p, _ in paths_leaves]
    missing = [n for n in names if n not in flat]
    extra = sorted(set(flat) - set(names))
    if missing or extra:
        raise ValueError(f"npz params mismatch: missing={missing[:8]} "
                         f"extra={extra[:8]}")
    leaves = []
    for name, (_, ref) in zip(names, paths_leaves):
        arr = flat[name]
        if tuple(arr.shape) != tuple(np.shape(ref)):
            hint = ""
            # the one historical shape break: spec_bins 513 (fft_size
            # 1024, the pre-2026-08 default) vs 512 (fft_size 1022, the
            # MXU-aligned current default) — name the knob
            pairs = set(zip(arr.shape, np.shape(ref)))
            if (513, 512) in pairs or (512, 513) in pairs:
                hint = ("; this looks like a spec_bins mismatch — "
                        "snapshots trained at fft_size=1024 (513 bins) "
                        "need `dsp: {fft_size: 1024}` pinned in the "
                        "config (see config.DspConfig.fft_size)")
            elif (128, 161) in pairs or (161, 128) in pairs:
                hint = ("; this looks like a harmonic-bank mismatch — "
                        "snapshots trained under the old fixed cap need "
                        "`dsp: {max_harmonics: 128}` pinned (see "
                        "config.DspConfig.max_harmonics)")
            raise ValueError(f"shape mismatch for {name}: file "
                             f"{arr.shape} vs model {np.shape(ref)}{hint}")
        leaves.append(jnp.asarray(arr, jnp.asarray(ref).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_params(params: dict, path: str) -> None:
    if str(path).endswith(".npz"):
        np.savez(path, **flatten_params(params))
        return
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def load_params(template: dict, path: str) -> dict:
    if str(path).endswith(".npz"):
        with np.load(path, allow_pickle=False) as d:
            return unflatten_params(template, dict(d))
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def load_all_params(params: dict, cfg: Config,
                    params_path: str | None = None) -> dict:
    """Apply every params/statistics path the config names (plus an
    explicit CLI override) to an initialized tree.

    Order (later wins): cfg.params_path (full tree) -> explicit
    ``params_path`` arg (full tree) -> per-stage subtree files
    (stage1/stage2/vocoder) -> F0 statistics .npz overrides.  This is the
    reference's model-load step (SURVEY.md §3.3: separate stage-1/stage-2
    snapshots + input/target statistics .npy) for the single-tree format.
    """
    for full in (cfg.params_path, params_path):
        if full:
            params = load_params(params, full)
    for key, path in (("stage1", cfg.stage1_params_path),
                      ("stage2", cfg.stage2_params_path),
                      ("vocoder", cfg.vocoder_params_path),
                      ("vocoder_wave", cfg.vocoder_wave_params_path)):
        if path:
            params = dict(params)
            params[key] = load_params(params[key], path)
    stats_keys = ((cfg.input_statistics_path, "src_mean", "src_std"),
                  (cfg.target_statistics_path, "tgt_mean", "tgt_std"))
    if any(p for p, *_ in stats_keys):
        params = dict(params)
        f0_stats = dict(params["f0_stats"])
        for path, mean_key, std_key in stats_keys:
            if path:
                d = np.load(path, allow_pickle=False)
                f0_stats[mean_key] = jnp.asarray(float(d["mean"]),
                                                 jnp.float32)
                f0_stats[std_key] = jnp.asarray(float(d["std"]), jnp.float32)
        params["f0_stats"] = f0_stats
    return params
