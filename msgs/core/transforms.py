"""Pure-jnp geometric transforms for Gaussian splatting.

Numerical contracts follow the reference's own Python-side math
(/root/reference/utils/general_utils.py:78-110 build_rotation /
build_scaling_rotation, /root/reference/utils/graphics_utils.py:31-71
getWorld2View2 / getProjectionMatrix), re-expressed as batched functional jnp.
Quaternion convention: (w, x, y, z), normalized inside.
"""
from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Batched unit-quaternion → rotation matrix. q: (..., 4) wxyz → (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): (..., 3) scales, (..., 4) quats → (..., 3, 3)."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def build_covariance_3d(scales, quats, scale_modifier: float = 1.0):
    """Σ = L Lᵀ with L = R diag(m·s); returns full symmetric (..., 3, 3).

    Matches reference build_covariance_from_scaling_rotation
    (scene/gaussian_model.py:32-37), which returns the upper triangle of
    L Lᵀ with L = R diag(s).
    """
    L = build_scaling_rotation(scale_modifier * scales, quats)
    return L @ jnp.swapaxes(L, -1, -2)


def cov3d_to_sym6(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack symmetric (...,3,3) → (...,6) as (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def sym6_to_cov3d(s: jnp.ndarray) -> jnp.ndarray:
    """Unpack (...,6) (xx,xy,xz,yy,yz,zz) → full symmetric (...,3,3)."""
    row0 = jnp.stack([s[..., 0], s[..., 1], s[..., 2]], axis=-1)
    row1 = jnp.stack([s[..., 1], s[..., 3], s[..., 4]], axis=-1)
    row2 = jnp.stack([s[..., 2], s[..., 4], s[..., 5]], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def world_to_view(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """World→camera 4×4 from COLMAP-convention R (cam→world rotation) and t.

    Mirrors getWorld2View (graphics_utils.py:31-36): top-left Rᵀ, last column t.
    """
    V = jnp.zeros((4, 4), dtype=jnp.float32)
    V = V.at[:3, :3].set(R.T)
    V = V.at[:3, 3].set(t)
    V = V.at[3, 3].set(1.0)
    return V


def perspective_projection(znear: float, zfar: float, fovx, fovy) -> jnp.ndarray:
    """OpenGL-style perspective projection matrix, z ∈ [0, 1] after divide.

    Same convention as the reference getProjectionMatrix
    (graphics_utils.py:51-71): P[2,2] = zfar/(zfar-znear),
    P[2,3] = -zfar·znear/(zfar-znear), P[3,2] = 1.
    """
    tan_x = jnp.tan(fovx / 2.0)
    tan_y = jnp.tan(fovy / 2.0)
    P = jnp.zeros((4, 4), dtype=jnp.float32)
    P = P.at[0, 0].set(1.0 / tan_x)
    P = P.at[1, 1].set(1.0 / tan_y)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    P = P.at[3, 2].set(1.0)
    return P
