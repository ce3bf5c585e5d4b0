"""Checkpoint / resume for training state.

SURVEY.md §5 (checkpoint row): the reference loads Chainer ``.npz``
snapshots for inference; training checkpoints live in the dependency
repos' trainers.  Here the whole ``TrainState`` / ``GanTrainState``
(params + optimizer state + step) round-trips through one msgpack file via
``flax.serialization`` — restore takes a template state (from init) so the
tree structure is validated on load, exactly like the reference's
load-into-constructed-model flow (SURVEY.md §3.3).

Layout: ``<dir>/ckpt_<step>.msgpack`` with a ``latest`` pointer file;
``keep`` bounds retention.
"""

from __future__ import annotations

import pathlib

import jax
import numpy as np

import flax.serialization


def to_host(tree):
    """Device pytree -> host numpy, multi-host safe.

    A model-axis-sharded global array spans other hosts' devices and
    cannot be np.asarray'd directly; process_allgather assembles the full
    value on every host first (replicated arrays take the fast path).
    NOTE: the allgather is a collective — in a multi-host run call this on
    EVERY host (then let only host 0 write the file)."""
    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)
    return jax.tree.map(one, tree)


_to_host = to_host


def save_checkpoint(ckpt_dir: str | pathlib.Path, state, step: int,
                    keep: int = 3) -> pathlib.Path:
    d = pathlib.Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"ckpt_{step}.msgpack"
    tmp = d / f".tmp_ckpt_{step}"
    tmp.write_bytes(flax.serialization.to_bytes(_to_host(state)))
    tmp.rename(path)                       # atomic publish
    (d / "latest").write_text(path.name)
    old = sorted(d.glob("ckpt_*.msgpack"),
                 key=lambda p: int(p.stem.split("_")[1]))
    for p in old[:-keep]:
        p.unlink()
    return path


def latest_checkpoint(ckpt_dir: str | pathlib.Path) -> pathlib.Path | None:
    d = pathlib.Path(ckpt_dir)
    pointer = d / "latest"
    if pointer.exists():
        p = d / pointer.read_text().strip()
        if p.exists():
            return p
    cands = sorted(d.glob("ckpt_*.msgpack"),
                   key=lambda p: int(p.stem.split("_")[1]))
    return cands[-1] if cands else None


def restore_checkpoint(ckpt_dir: str | pathlib.Path, template):
    """Restore the newest checkpoint into ``template``'s tree structure.
    Returns (state, step) or (template, 0) when no checkpoint exists."""
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return template, 0
    state = flax.serialization.from_bytes(template, path.read_bytes())
    return state, int(path.stem.split("_")[1])
