"""Checkpointing with the reference's best/last directory contract.

Reference: torch.save(state_dict) under <export_path>/<model_name>
(src/pdp/nn/solver.py:318-322), best/last dirs built by
satyr-train-test.py:66-76. Here the param pytree (plus the annealing
global_step) is stored as a flat .npz keyed by pytree paths - dependency-free
and byte-stable.
"""

import os

import jax
import numpy as np


def _flatten(tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in leaves}


def save_params(path_base, tree, name):
    os.makedirs(path_base, exist_ok=True)
    np.savez(os.path.join(path_base, name + ".npz"), **_flatten(tree))


def checkpoint_keys(path_base, name):
    """Flat key list stored in a checkpoint (for feature-detecting optional
    subtrees, e.g. pre-round-5 checkpoints carry no optimizer state)."""
    data = np.load(os.path.join(path_base, name + ".npz"))
    return list(data.files)


def load_params(path_base, template, name):
    """Restore into the structure of `template` (shapes must match)."""
    fname = os.path.join(path_base, name + ".npz")
    data = np.load(fname)
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = jax.tree_util.keystr(path)
        if key not in data:
            raise KeyError(f"checkpoint {fname} missing leaf {key}")
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {key} shape {arr.shape} != {np.shape(leaf)}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
