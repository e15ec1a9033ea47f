"""Checkpoint/resume — SURVEY.md §5.4: history state is an explicit pytree, so
checkpointing is orbax (or a numpy fallback) over (History, Materials, step).

Used by long differentiable-optimization runs (BASELINE config 5); rendering
itself is replayable from (frame index, seed, settings record) — §5.3."""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(path: str, step: int, **trees: Any) -> None:
    """Save named pytrees. Tries orbax; falls back to pickle-of-numpy
    (structure is rebuilt by the caller via `restore(..., like=)`)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(
            os.path.abspath(path), {"step": step, **_to_numpy(trees)}, force=True
        )
        ckpt.wait_until_finished()
        return
    except Exception:
        pass
    with open(path if path.endswith(".pkl") else path + ".pkl", "wb") as f:
        pickle.dump({"step": step, **jax.tree.map(np.asarray, trees)}, f)


def restore(path: str, like: dict[str, Any] | None = None) -> dict[str, Any]:
    """Restore previously saved pytrees. `like` provides the pytree structure
    for orbax restoration (pass the same-named live pytrees)."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        target = None
        if like is not None:
            target = {"step": 0, **_to_numpy(like)}
        out = ckpt.restore(os.path.abspath(path), target)
        return out
    except Exception:
        pass
    p = path if path.endswith(".pkl") else path + ".pkl"
    with open(p, "rb") as f:
        return pickle.load(f)
