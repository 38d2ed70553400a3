"""Model summaries (reference flow_models/utils.py:4-71 equivalent)."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def total_trainable_variables(params: Any) -> int:
    return sum(int(np.prod(np.shape(leaf)))
               for leaf in jax.tree_util.tree_leaves(params))


def print_summary(params: Any, max_depth: int = 2) -> None:
    """Print per-subtree parameter counts down to ``max_depth``."""
    def count(tree):
        return sum(int(np.prod(np.shape(l)))
                   for l in jax.tree_util.tree_leaves(tree))

    def walk(tree, prefix, depth):
        if depth >= max_depth or not isinstance(tree, dict):
            print(f"{'  ' * depth}{prefix}: {count(tree):,}")
            return
        print(f"{'  ' * depth}{prefix}:")
        for k in tree:
            walk(tree[k], k, depth + 1)

    walk(params, "model", 0)
    print(f"Total Trainable Variables: {count(params):,}")
