"""Checkpoint / resume (SURVEY.md §5).

The reference has no persistence — its state lives in the mutable Unity
``Mesh`` and dies with the play session.  Here ``State``/``Topology`` are
pytrees, so checkpointing is trivial and resuming is deterministic:
``step`` from a restored state replays bit-identical trajectories (the
recovery story appropriate for a deterministic single-host sim; SURVEY.md
§5 "Failure detection / elastic recovery").

Two backends:
* ``save_npz`` / ``load_npz`` — dependency-free flat .npz of any pytree.
* ``save_orbax`` / ``load_orbax`` — orbax-checkpoint (async-capable,
  multi-host ready) when available.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax

from ..core.state import State


def _flatten_with_names(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_npz(path: str, tree: Any) -> None:
    """Serialize a pytree's leaves to a flat .npz (host-side copy)."""
    leaves, _ = _flatten_with_names(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_npz(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_npz`; ``like`` supplies the
    structure (and device placement via jnp.asarray)."""
    import jax.numpy as jnp

    leaves, treedef = _flatten_with_names(like)
    with np.load(path) as data:
        new_leaves = [
            jnp.asarray(data[f"leaf_{i}"]) if hasattr(l, "dtype") else l
            for i, l in enumerate(leaves)
        ]
    return jax.tree.unflatten(treedef, new_leaves)


def save_state(path: str, state: State) -> None:
    save_npz(path, state)


def load_state(path: str, like: State) -> State:
    return load_npz(path, like)


def save_orbax(path: str, tree: Any) -> None:
    """Orbax backend (multi-host ready); falls back to npz on ImportError."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        save_npz(path + ".npz", tree)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: Any) -> Any:
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return load_npz(path + ".npz", like)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
