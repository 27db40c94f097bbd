"""Checkpoint / snapshot I/O.

Two formats, mirroring the reference (SURVEY.md §5):
  (a) PLY model snapshots (reference-compatible schema incl. MS extras) for
      interop with the CUDA ecosystem — scene/__init__.py:113-115;
  (b) full training state (params + side state + Adam moments + iteration)
      as an .npz, the analogue of torch.save((capture(), iteration))
      (gaussian_model.py:79-125, with the capture/restore field-order bug
      fixed — SURVEY.md §2.2 notes the reference swaps min_pixel_sizes /
      base_gaussian_mask on resume; we use named fields so no swap exists).
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msgs.data.ply import load_gaussian_ply, save_gaussian_ply
from msgs.model.gaussians import GaussianConfig, GaussianState, empty_state
from msgs.train.loop import TrainState, init_train_state
from msgs.train.optimizer import AdamState


def save_ply_snapshot(path: str, st: GaussianState):
    live = np.asarray(st.live)
    pick = lambda a: np.asarray(a)[live]
    save_gaussian_ply(path, {
        "xyz": pick(st.xyz),
        "features_dc": pick(st.features_dc),
        "features_rest": pick(st.features_rest),
        "opacity": pick(st.opacity),
        "scaling": pick(st.scaling),
        "rotation": pick(st.rotation),
        "occ_multiplier": pick(st.occ_multiplier),
        "dc_delta": pick(st.dc_delta),
        "base_mask": pick(st.base_mask),
        "max_pixel_sizes": pick(st.max_pixel_sizes),
        "min_pixel_sizes": pick(st.min_pixel_sizes),
    })


def load_ply_snapshot(path: str, cfg: GaussianConfig) -> GaussianState:
    f = load_gaussian_ply(path)
    n = len(f["xyz"])
    st = empty_state(cfg)
    if n > cfg.capacity:
        raise ValueError(f"PLY has {n} Gaussians > capacity {cfg.capacity}")

    def put(arr, key, default=None):
        v = f.get(key, default)
        if v is None:
            return arr
        return arr.at[:n].set(jnp.asarray(v))

    st = st._replace(
        xyz=put(st.xyz, "xyz"),
        features_dc=put(st.features_dc, "features_dc"),
        features_rest=put(st.features_rest, "features_rest"),
        opacity=put(st.opacity, "opacity"),
        scaling=put(st.scaling, "scaling"),
        rotation=put(st.rotation, "rotation"),
        occ_multiplier=put(st.occ_multiplier, "occ_multiplier"),
        dc_delta=put(st.dc_delta, "dc_delta"),
        base_mask=put(st.base_mask, "base_mask"),
        max_pixel_sizes=put(st.max_pixel_sizes, "max_pixel_sizes"),
        min_pixel_sizes=put(st.min_pixel_sizes, "min_pixel_sizes"),
        live=st.live.at[:n].set(True),
        active_sh_degree=jnp.int32(cfg.sh_degree),
    )
    return st


def grow_capacity(state: TrainState, new_cap: int) -> TrainState:
    """Pad every capacity-leading array of a TrainState (params, Adam
    moments, side state) to a larger capacity. New rows are live=False and
    overwritten on allocation, but the pads stay self-consistent anyway:
    pixel-size stats use −1 as the "uninitialized" sentinel and quaternions
    must stay normalizable."""
    old_cap = int(state.gaussians.xyz.shape[0])
    assert new_cap >= old_cap, (old_cap, new_cap)

    def pad(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == old_cap:
            pad_width = [(0, new_cap - old_cap)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad_width)
        return x

    state = jax.tree_util.tree_map(pad, state)
    g = state.gaussians
    g = g._replace(
        max_pixel_sizes=g.max_pixel_sizes.at[old_cap:].set(-1.0),
        min_pixel_sizes=g.min_pixel_sizes.at[old_cap:].set(-1.0),
        rotation=g.rotation.at[old_cap:, 0].set(1.0),
    )
    return state._replace(gaussians=g)


def save_train_state(path: str, state: TrainState):
    flat, treedef = jax.tree_util.tree_flatten(state)
    np.savez_compressed(path, n_leaves=len(flat),
                        **{f"leaf_{i}": np.asarray(x)
                           for i, x in enumerate(flat)})


def load_train_state(path: str, template: TrainState) -> TrainState:
    data = np.load(path)
    _, treedef = jax.tree_util.tree_flatten(template)
    leaves = [jnp.asarray(data[f"leaf_{i}"])
              for i in range(int(data["n_leaves"]))]
    return jax.tree_util.tree_unflatten(treedef, leaves)
