"""Real spherical harmonics evaluation (degrees 0–3) for view-dependent color.

The SH basis constants are the standard real-SH polynomial coefficients (the
same ones the reference duplicates in /root/reference/utils/sh_utils.py:26-54,
originally from PlenOctree). Implemented as a single vectorized basis-matrix
product so XLA can fuse it into the preprocess pipeline, with active-degree
masking done by zeroing basis entries (static shapes, jit-friendly) instead of
Python branching.
"""
from __future__ import annotations

import jax.numpy as jnp

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jnp.ndarray, max_degree: int = 3) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    dirs: (..., 3) unit vectors → (..., (max_degree+1)**2) basis values.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ones = jnp.ones_like(x)
    out = [_C0 * ones]
    if max_degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if max_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if max_degree >= 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(sh: jnp.ndarray, dirs: jnp.ndarray, active_degree,
            max_degree: int = 3) -> jnp.ndarray:
    """Evaluate SH color. sh: (..., K, 3) coeffs, dirs: (..., 3).

    `active_degree` may be a traced int: coefficients of bands above it are
    masked to zero (the reference's active_sh_degree warmup,
    gaussian_model.py:185-187, without retracing per degree).
    Returns raw SH color (no +0.5 shift / clamp — callers apply the
    rasterizer-side `max(sh_color + 0.5, 0)` rule themselves).
    """
    K = sh.shape[-2]
    basis = sh_basis(dirs, max_degree=max_degree)[..., :K]
    coeff_band = jnp.floor(jnp.sqrt(jnp.arange(K, dtype=jnp.float32))).astype(jnp.int32)
    mask = (coeff_band <= active_degree).astype(sh.dtype)
    return jnp.einsum("...k,...kc->...c", basis * mask, sh)


def rgb2sh(rgb):
    return (rgb - 0.5) / _C0


def sh2rgb(sh):
    return sh * _C0 + 0.5
