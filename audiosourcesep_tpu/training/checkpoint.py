"""Checkpointing: flat-npz pytree snapshots with a manager.

Equivalent of the reference's ``tf.train.Checkpoint`` +
``CheckpointManager`` (train_utils.py:62-75): keeps the last
``max_to_keep`` snapshots in a directory, tracks the latest via an index
file, restores *into* a parameter template (asserting structural match, the
analog of ``status.assert_existing_objects_matched()`` used on every
reference restore). Noisy-Glow's per-noise-level ``sigma_{s}/`` directory
layout (train_noisy_glow.py:309-357) is preserved by the trainers.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np

Params = Any


def _flatten(tree: Params):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def save_pytree(path: str, tree: Params, step: int = 0) -> str:
    """Save a pytree (params / train state) to ``<path>.npz``."""
    flat = _flatten(tree)
    flat["__step__"] = np.asarray(step)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    return path if path.endswith(".npz") else path + ".npz"


def restore_pytree(path: str, template: Params,
                   strict: bool = True) -> Tuple[Params, int]:
    """Restore into ``template``'s structure; returns ``(tree, step)``."""
    if not path.endswith(".npz"):
        path += ".npz"
    with np.load(path) as data:
        step = int(data["__step__"]) if "__step__" in data else 0
        flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for keypath, leaf in flat_t:
            key = jax.tree_util.keystr(keypath)
            if key not in data:
                if strict:
                    raise KeyError(
                        f"checkpoint {path} missing parameter {key}")
                leaves.append(leaf)
                continue
            val = data[key]
            if strict and tuple(val.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"shape mismatch for {key}: checkpoint "
                    f"{val.shape} vs template {np.shape(leaf)}")
            leaves.append(val)
    tree = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
    return tree, step


class CheckpointManager:
    """Rolling checkpoint directory (default name ``ckpts``)."""

    def __init__(self, directory: str = "./ckpts", max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)

    def _index_path(self) -> str:
        return os.path.join(self.directory, "checkpoint.json")

    def save(self, tree: Params, step: int) -> str:
        name = f"ckpt-{step}"
        path = os.path.join(self.directory, name)
        save_pytree(path, tree, step)
        index = self._read_index()
        index["all"] = [c for c in index.get("all", []) if c != name] + [name]
        index["latest"] = name
        while len(index["all"]) > self.max_to_keep:
            old = index["all"].pop(0)
            try:
                os.remove(os.path.join(self.directory, old + ".npz"))
            except FileNotFoundError:
                pass
        with open(self._index_path(), "w") as f:
            json.dump(index, f)
        return path + ".npz"

    def _read_index(self) -> dict:
        try:
            with open(self._index_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def latest(self) -> Optional[str]:
        index = self._read_index()
        if "latest" in index:
            return os.path.join(self.directory, index["latest"])
        # fall back to scanning
        cands = [f for f in os.listdir(self.directory)
                 if re.match(r"ckpt-\d+\.npz$", f)]
        if not cands:
            return None
        cands.sort(key=lambda f: int(re.findall(r"\d+", f)[0]))
        return os.path.join(self.directory, cands[-1][:-4])

    def restore_latest(self, template: Params,
                       strict: bool = True) -> Tuple[Params, int]:
        latest = self.latest()
        if latest is None:
            raise FileNotFoundError(
                f"no checkpoint found in {self.directory}")
        return restore_pytree(latest, template, strict)


def latest_checkpoint(directory: str) -> Optional[str]:
    """``tf.train.latest_checkpoint`` analog for our layout."""
    return CheckpointManager(directory).latest()
