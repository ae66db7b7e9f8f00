"""Checkpoint / resume for differentiable-rendering state.

The reference has no checkpointing (scene state is reconstructible from the JSON
config + seed, SURVEY.md §5); this is new surface for the differentiable path:
persist optimizable scene parameters (materials, lights, camera, vertices) and
optimizer state between runs.  Plain ``.npz`` keyed by flattened pytree paths —
no heavyweight dependency; orbax can be slotted in later for async multi-host
checkpointing."""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = ["/".join(str(p) for p in path) for path, _ in flat]
    vals = [v for _, v in flat]
    return keys, vals, treedef


def save(path: str, tree: Any, step: int = 0) -> None:
    keys, vals, _ = _flatten_with_paths(tree)
    arrays = {f"arr_{i}": np.asarray(v) for i, v in enumerate(vals)}
    arrays["__keys__"] = np.asarray(keys, dtype=object)
    arrays["__step__"] = np.asarray(step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays, allow_pickle=True)
    os.replace(tmp, path)


def load(path: str, like: Any) -> Tuple[Any, int]:
    """Restore a pytree saved by :func:`save`, validated against ``like``'s
    structure (shapes must match)."""
    data = np.load(path, allow_pickle=True)
    step = int(data["__step__"])
    saved_keys = list(data["__keys__"])
    keys, vals, treedef = _flatten_with_paths(like)
    if keys != saved_keys:
        raise ValueError(
            f"checkpoint structure mismatch: {len(saved_keys)} saved vs "
            f"{len(keys)} expected leaves"
        )
    new_vals = []
    for i, v in enumerate(vals):
        arr = data[f"arr_{i}"]
        if np.shape(arr) != np.shape(v):
            raise ValueError(f"shape mismatch at {keys[i]}: {arr.shape} vs {np.shape(v)}")
        new_vals.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_vals), step
