"""Insert-large-Gaussians: voxel-average aggregation of fine Gaussians into
coarse-level aggregates.

Functional equivalent of the reference insert_large_gaussians
(gaussian_model.py:789-848), which bounces all attributes through CPU/Open3D
VoxelPooling. Here it is a single on-device jit-compatible pass:
quantize contracted positions → pack voxel keys → sort → segment means →
allocate capacity slots. Semantics preserved:

  - contraction: rel = xyz/extent, then `2 − 1/rel` where rel > 1
    (the reference's asymmetric contraction, 793-795 — faithfully kept)
  - voxel_reso = 0.02 · (reso_lvl / 4) on the contracted coords (800)
  - every attribute (including quaternions and logit opacities) is averaged
    raw, exactly as the reference averages raw parameter rows
  - merged scale ×= 2.0 / clip(pooled current-min-pixel-size, 0.25, 2.0)
    so the aggregate covers ≳2 px at the target resolution (833-835)
  - new rows: pixel-size stats reset to −1, target_reso_lvl = lvl,
    base_mask False (839-847 + densification_postfix)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from msgs.model.gaussians import GaussianState, _alloc_slots

_GRID = 1024          # voxel coord range per axis after clipping (±512)


def _voxel_keys(xyz, mask, scene_extent, voxel_reso):
    rel = xyz / scene_extent
    rel = jnp.where(rel > 1.0, 2.0 - 1.0 / rel, rel)
    coords = jnp.floor(rel / voxel_reso).astype(jnp.int32)
    coords = jnp.clip(coords + _GRID // 2, 0, _GRID - 1)
    # Max key = 1024³−1 < 2³¹; 2_147_000_000 is a safe invalid sentinel.
    key = ((coords[:, 0] * _GRID + coords[:, 1]) * _GRID + coords[:, 2])
    return jnp.where(mask, key, jnp.int32(2_147_000_000))


def insert_large_gaussians(st: GaussianState, mask: jnp.ndarray,
                           cur_min_pixel_sizes: jnp.ndarray, reso_lvl,
                           scene_extent: float, voxel_reso: float
                           ) -> Tuple[GaussianState, jnp.ndarray, jnp.ndarray]:
    """Aggregate `mask`-selected Gaussians into voxel means inserted as new
    rows tagged `reso_lvl`. Returns (state, touched, n_inserted)."""
    C = st.live.shape[0]
    mask = mask & st.live
    keys = _voxel_keys(st.xyz, mask, scene_extent, voxel_reso)

    order = jnp.argsort(keys)
    sk = keys[order]
    is_new = jnp.concatenate([
        jnp.ones((1,), bool), sk[1:] != sk[:-1]]) & (sk < 2_147_000_000)
    # voxel index per *sorted* row; invalid rows → C (dropped in scatters)
    vidx_sorted = jnp.where(sk < 2_147_000_000,
                            jnp.cumsum(is_new.astype(jnp.int32)) - 1, C)
    vidx = jnp.zeros((C,), jnp.int32).at[order].set(vidx_sorted)
    n_voxels = jnp.sum(is_new.astype(jnp.int32))

    counts = jax.ops.segment_sum(
        jnp.where(mask, 1.0, 0.0), vidx, num_segments=C + 1)[:C]
    denom = jnp.maximum(counts, 1.0)

    def pool(a):
        flat = a.reshape(C, -1)
        flat = jnp.where(mask[:, None], flat, 0.0)
        s = jax.ops.segment_sum(flat, vidx, num_segments=C + 1)[:C]
        return (s / denom[:, None]).reshape((C,) + a.shape[1:])

    v_xyz = pool(st.xyz)
    v_dc = pool(st.features_dc)
    v_rest = pool(st.features_rest)
    v_op = pool(st.opacity)
    v_occ = pool(st.occ_multiplier)
    v_dcd = pool(st.dc_delta)
    v_rot = pool(st.rotation)
    v_scaling = pool(st.scaling)
    v_cur_min = pool(cur_min_pixel_sizes[:, None])[:, 0]

    # Grow each aggregate to ≳2 px at its target resolution.
    factor = 2.0 / jnp.clip(v_cur_min, 0.25, 2.0)
    v_scaling = v_scaling + jnp.log(factor)[:, None]

    want = jnp.arange(C) < n_voxels
    slots, ok = _alloc_slots(st.live, want, copies=1)
    dst = slots[:, 0]

    def put(arr, vals):
        return arr.at[dst].set(vals, mode="drop")

    lvl_i = jnp.asarray(reso_lvl, jnp.int32)
    st = st._replace(
        xyz=put(st.xyz, v_xyz),
        features_dc=put(st.features_dc, v_dc),
        features_rest=put(st.features_rest, v_rest),
        opacity=put(st.opacity, v_op),
        occ_multiplier=put(st.occ_multiplier, v_occ),
        dc_delta=put(st.dc_delta, v_dcd),
        rotation=put(st.rotation, v_rot),
        scaling=put(st.scaling, v_scaling),
        max_pixel_sizes=st.max_pixel_sizes.at[dst].set(-1.0, mode="drop"),
        min_pixel_sizes=st.min_pixel_sizes.at[dst].set(-1.0, mode="drop"),
        base_mask=st.base_mask.at[dst].set(False, mode="drop"),
        target_reso_lvl=st.target_reso_lvl.at[dst].set(lvl_i, mode="drop"),
        max_radii2d=jnp.zeros_like(st.max_radii2d),  # postfix resets all
        xyz_grad_accum=st.xyz_grad_accum.at[dst].set(0.0, mode="drop"),
        denom=st.denom.at[dst].set(0.0, mode="drop"),
        live=st.live.at[dst].set(True, mode="drop"),
    )
    touched = jnp.zeros_like(st.live).at[dst].set(True, mode="drop")
    return st, touched, jnp.minimum(n_voxels, jnp.sum(ok))
