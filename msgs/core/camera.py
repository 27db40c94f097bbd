"""Functional camera pytree.

Replaces the reference's stateful `Camera`/`MiniCam` classes
(/root/reference/scene/cameras.py:17-77) with an immutable NamedTuple that
precomputes the same matrices: `world_view` (world→camera, row-vector
"transposed" layout as stored by the reference at cameras.py:54),
`full_proj` (view·projection), and `cam_center`. All fields are jnp arrays or
static Python ints so a Camera can cross jit boundaries as a pytree.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from msgs.core.transforms import perspective_projection, world_to_view

ZNEAR = 0.01
ZFAR = 100.0


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


@jax.tree_util.register_pytree_node_class
class Camera(NamedTuple):
    """Immutable camera. Matrices use the reference's row-vector convention:
    stored transposed, points transform as `p_row @ M`.

    Registered as a custom pytree so `width`/`height` stay *static* across
    jit boundaries (they determine tile-grid shapes) while the matrices are
    traced leaves."""

    world_view: jnp.ndarray   # (4,4) = W2V^T  (row-vector convention)
    full_proj: jnp.ndarray    # (4,4) = (P @ W2V)^T
    cam_center: jnp.ndarray   # (3,)
    tanfovx: jnp.ndarray      # scalar
    tanfovy: jnp.ndarray      # scalar
    width: int                # static
    height: int               # static

    def tree_flatten(self):
        leaves = (self.world_view, self.full_proj, self.cam_center,
                  self.tanfovx, self.tanfovy)
        return leaves, (self.width, self.height)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, width=aux[0], height=aux[1])

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tanfovy)


def make_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                translate=(0.0, 0.0, 0.0), scale: float = 1.0) -> Camera:
    """Build a Camera from COLMAP-convention extrinsics.

    R: (3,3) cam→world rotation (as stored by the reference's loaders),
    T: (3,) world→cam translation. `translate`/`scale` mirror the
    getWorld2View2 recentering knobs (graphics_utils.py:38-49).
    """
    W2V = np.zeros((4, 4), dtype=np.float64)
    W2V[:3, :3] = np.asarray(R).T
    W2V[:3, 3] = np.asarray(T)
    W2V[3, 3] = 1.0
    C2W = np.linalg.inv(W2V)
    C2W[:3, 3] = (C2W[:3, 3] + np.asarray(translate)) * scale
    W2V = np.linalg.inv(C2W).astype(np.float32)

    P = np.asarray(perspective_projection(ZNEAR, ZFAR, fovx, fovy))
    full = (P @ W2V).astype(np.float32)
    cam_center = np.linalg.inv(W2V)[:3, 3].astype(np.float32)
    return Camera(
        world_view=jnp.asarray(W2V.T),
        full_proj=jnp.asarray(full.T),
        cam_center=jnp.asarray(cam_center),
        tanfovx=jnp.float32(math.tan(fovx / 2.0)),
        tanfovy=jnp.float32(math.tan(fovy / 2.0)),
        width=int(width),
        height=int(height),
    )


def make_camera_from_matrices(world_view_t: np.ndarray, full_proj_t: np.ndarray,
                              fovx: float, fovy: float,
                              width: int, height: int) -> Camera:
    """Build a Camera directly from (transposed) matrices — the MiniCam path
    used by the live-view GUI (cameras.py:65-77)."""
    wv = np.asarray(world_view_t, dtype=np.float32)
    inv = np.linalg.inv(wv.T)
    return Camera(
        world_view=jnp.asarray(wv),
        full_proj=jnp.asarray(np.asarray(full_proj_t, dtype=np.float32)),
        cam_center=jnp.asarray(inv[:3, 3].astype(np.float32)),
        tanfovx=jnp.float32(math.tan(fovx / 2.0)),
        tanfovy=jnp.float32(math.tan(fovy / 2.0)),
        width=int(width),
        height=int(height),
    )
