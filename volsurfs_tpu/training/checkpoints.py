"""Checkpoint save/load for TrainState pytrees.

Layout mirrors the reference run directory
(runs/<method>/<exp>/<scene>/<run_id>/<iter:07d>/models/*, reference
base_method.py:213-264 + utils/volsurfs_utils.py:62-78): one msgpack file per
logical model plus optimizer/grid/rng state, so cross-stage transfers
(offsets_surfs loading surf's sdf) can pick individual files exactly like the
reference picks ``sdf.pt``.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, state, keep_previous: bool = False) -> str:
    """Save under <ckpt_dir>/<iter:07d>/models/."""
    iter_nr = int(state.iter_nr)
    out = os.path.join(ckpt_dir, f"{iter_nr:07d}", "models")
    os.makedirs(out, exist_ok=True)
    for name, params in state.params.items():
        with open(os.path.join(out, f"{name}.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_to_numpy(params)))
    aux = {
        "opt_state": _to_numpy(state.opt_state),
        "key": np.asarray(state.key),
        "iter_nr": iter_nr,
    }
    if state.grid is not None:
        aux["grid"] = {
            "values": np.asarray(state.grid.values),
            "occupancy": np.asarray(state.grid.occupancy),
            "roi": np.asarray(state.grid.roi),
            "extent": np.asarray(state.grid.extent),
        }
    with open(os.path.join(out, "train_state.pkl"), "wb") as f:
        pickle.dump(aux, f)

    if not keep_previous:
        # delete older checkpoints (reference utils/training.py:59-80)
        for entry in sorted(os.listdir(ckpt_dir)):
            full = os.path.join(ckpt_dir, entry)
            if entry.isdigit() and int(entry) != iter_nr and os.path.isdir(full):
                import shutil

                shutil.rmtree(full)
    return out


def get_last_checkpoint_in_path(ckpt_dir: str):
    """Latest iteration folder (reference utils/training.py:83-105)."""
    if not os.path.isdir(ckpt_dir):
        return None
    iters = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    if not iters:
        return None
    return max(iters)


def load_checkpoint(ckpt_dir: str, state, iter_nr: int | None = None):
    """Restore a TrainState template from disk; returns the restored state."""
    if iter_nr is None:
        iter_nr = get_last_checkpoint_in_path(ckpt_dir)
        if iter_nr is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    src = os.path.join(ckpt_dir, f"{iter_nr:07d}", "models")
    params = {}
    for name, template in state.params.items():
        with open(os.path.join(src, f"{name}.msgpack"), "rb") as f:
            params[name] = serialization.from_bytes(template, f.read())
    with open(os.path.join(src, "train_state.pkl"), "rb") as f:
        aux = pickle.load(f)
    opt_state = serialization.from_state_dict(state.opt_state, serialization.to_state_dict(aux["opt_state"]))
    grid = state.grid
    if grid is not None and "grid" in aux:
        g = aux["grid"]
        grid = grid.replace(
            values=jnp.asarray(g["values"]),
            occupancy=jnp.asarray(g["occupancy"]),
            roi=jnp.asarray(g["roi"]),
            extent=jnp.asarray(g["extent"]),
        )
    return state.replace(
        params=params,
        opt_state=opt_state,
        grid=grid,
        key=jnp.asarray(aux["key"]),
        iter_nr=jnp.asarray(aux["iter_nr"], jnp.int32),
    )


def load_model_params(path: str, template=None):
    """Load a single model's params file (cross-stage transfer, e.g.
    offsets_surfs <- surf sdf; reference offsets_surfs.py:248-261).

    With ``template=None`` the raw nested dict is restored without shape
    validation — needed when the receiving method has a different params
    layout than the producing one (offsets_surfs has no ``sdf`` key to use
    as a template for surf's ``sdf.msgpack``)."""
    with open(path, "rb") as f:
        data = f.read()
    if template is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(template, data)
