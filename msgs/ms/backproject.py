"""Screen-space back-projection insertion heuristic.

Functional equivalent of the reference's `add_large_gaussian`
(gaussian_model.py:707-787) — the older large-Gaussian creation path that
pre-dates voxel insert_large. Dead code in the reference's current flow
(only called from a commented block, train.py:389-413) but part of the
capability surface (SURVEY.md §2.2): average-pool the per-pixel accumulated
splat-footprint map, find blocks whose coverage is below a threshold,
back-project the block centers at the rendered depth into world space, and
emit one Gaussian per under-covered block sized to the block's world extent.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from msgs.core.sh import rgb2sh
from msgs.core.transforms import inverse_sigmoid
from msgs.model.gaussians import GaussianState, _alloc_slots


def add_large_gaussians_backproject(
        st: GaussianState, camera, acc_pixel_size, depth, image, lvl, *,
        block: int = 4, coverage_threshold: float = 1.0
) -> Tuple[GaussianState, jnp.ndarray, jnp.ndarray]:
    """Insert one Gaussian per `block`×`block` pixel block whose mean
    accumulated splat footprint is below `coverage_threshold`.

    acc_pixel_size/depth: (H, W); image: (H, W, 3) used to color new rows.
    Returns (state, touched, n_inserted).
    """
    H, W = acc_pixel_size.shape
    Hb, Wb = H // block, W // block
    C = st.live.shape[0]

    def pool(x):
        return x[:Hb * block, :Wb * block].reshape(
            Hb, block, Wb, block, -1).mean(axis=(1, 3))

    acc_b = pool(acc_pixel_size[..., None])[..., 0]
    depth_b = pool(depth[..., None])[..., 0]
    color_b = pool(image)

    under = (acc_b < coverage_threshold) & (depth_b > 0.0)

    # Back-project block centers at the pooled depth. Pixel → camera ray via
    # the tan-fov mapping; camera → world via the inverse view transform
    # (world_view is stored transposed, row-vector convention).
    ys = (jnp.arange(Hb) + 0.5) * block
    xs = (jnp.arange(Wb) + 0.5) * block
    px, py = jnp.meshgrid(xs, ys)
    ndc_x = (2.0 * px + 1.0) / W - 1.0
    ndc_y = (2.0 * py + 1.0) / H - 1.0
    cam_dir = jnp.stack([ndc_x * camera.tanfovx, ndc_y * camera.tanfovy,
                         jnp.ones_like(ndc_x)], axis=-1)
    cam_pos = cam_dir * depth_b[..., None]                     # (Hb, Wb, 3)
    R_wv = camera.world_view[:3, :3].T                         # world→view
    t_wv = camera.world_view[3, :3]
    world = (cam_pos - t_wv) @ R_wv                            # inverse map

    # World-space size of one block at that depth.
    pix_world = depth_b * (2.0 * camera.tanfovx) / W
    size = pix_world * block

    flat_mask = under.reshape(-1)
    flat_world = world.reshape(-1, 3)
    flat_color = color_b.reshape(-1, 3)
    flat_size = size.reshape(-1)
    M = flat_mask.shape[0]

    want = jnp.zeros((C,), bool)
    if M >= C:
        want = flat_mask[:C]
        flat_world = flat_world[:C]
        flat_color = flat_color[:C]
        flat_size = flat_size[:C]
    else:
        want = want.at[:M].set(flat_mask)
        pad = ((0, C - M),)
        flat_world = jnp.pad(flat_world, ((0, C - M), (0, 0)))
        flat_color = jnp.pad(flat_color, ((0, C - M), (0, 0)))
        flat_size = jnp.pad(flat_size, pad)

    slots, ok = _alloc_slots(st.live, want, copies=1)
    dst = slots[:, 0]
    lvl_i = jnp.asarray(lvl, jnp.int32)
    safe_size = jnp.log(jnp.maximum(flat_size, 1e-6))

    st = st._replace(
        xyz=st.xyz.at[dst].set(flat_world, mode="drop"),
        features_dc=st.features_dc.at[dst].set(
            rgb2sh(flat_color)[:, None, :], mode="drop"),
        features_rest=st.features_rest.at[dst].set(0.0, mode="drop"),
        scaling=st.scaling.at[dst].set(
            safe_size[:, None].repeat(3, 1), mode="drop"),
        rotation=st.rotation.at[dst].set(
            jnp.tile(jnp.array([1.0, 0, 0, 0]), (C, 1)), mode="drop"),
        opacity=st.opacity.at[dst].set(
            inverse_sigmoid(jnp.float32(0.5)), mode="drop"),
        max_pixel_sizes=st.max_pixel_sizes.at[dst].set(-1.0, mode="drop"),
        min_pixel_sizes=st.min_pixel_sizes.at[dst].set(-1.0, mode="drop"),
        base_mask=st.base_mask.at[dst].set(False, mode="drop"),
        target_reso_lvl=st.target_reso_lvl.at[dst].set(lvl_i, mode="drop"),
        live=st.live.at[dst].set(True, mode="drop"),
    )
    touched = jnp.zeros_like(st.live).at[dst].set(True, mode="drop")
    return st, touched, jnp.sum(ok)
