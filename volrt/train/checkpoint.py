"""Checkpoint / resume for fitting runs (new capability; the reference
persists nothing but a log file, reference: Logger.cpp:18).

Format: a single ``.npz`` holding the scene leaves, flattened optimizer-state
leaves and the step counter. The optimizer treedef is reconstructed from a
freshly-initialized state of the same optimizer, so checkpoints stay plain
arrays — no pickled code.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from volrt.diff.render import DiffScene
from volrt.train.fit import TrainState


def save(path: str, state: TrainState) -> None:
    opt_leaves = jax.tree_util.tree_leaves(state.opt_state)
    arrays = {
        "density": np.asarray(state.scene.density),
        "tf_base": np.asarray(state.scene.tf_base),
        "step": np.asarray(state.step),
        "meta": np.frombuffer(
            json.dumps({
                "ray_step": state.scene.ray_step,
                "n_opt_leaves": len(opt_leaves),
            }).encode(), dtype=np.uint8,
        ),
    }
    for i, leaf in enumerate(opt_leaves):
        arrays[f"opt_{i}"] = np.asarray(leaf)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load(path: str, optimizer) -> TrainState:
    """Load a checkpoint; ``optimizer`` must match the one used to save."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        scene = DiffScene(
            density=jnp.asarray(z["density"]),
            tf_base=jnp.asarray(z["tf_base"]),
            ray_step=float(meta["ray_step"]),
        )
        template = optimizer.init((scene.density, scene.tf_base))
        treedef = jax.tree_util.tree_structure(template)
        leaves = [
            jnp.asarray(z[f"opt_{i}"]) for i in range(meta["n_opt_leaves"])
        ]
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        return TrainState(scene, opt_state, jnp.asarray(z["step"]))
