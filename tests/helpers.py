"""Shared test fixtures: random scenes, cameras, and a brute-force numpy
rasterizer oracle that is *independent* of the production code paths (direct
per-pixel front-to-back loop over globally depth-sorted Gaussians with the
tile-rect selection semantics of the reference CUDA rasterizer)."""
from __future__ import annotations

import math

import numpy as np

TILE = 16


def make_scene(n=200, seed=0, spread=1.0, z_range=(3.0, 8.0), sh_degree=0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.uniform(-spread, spread, (n, 2)),
         rng.uniform(*z_range, (n, 1))], axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    k = (sh_degree + 1) ** 2
    shs = rng.normal(0, 0.3, (n, k, 3)).astype(np.float32)
    shs[:, 0, :] += 0.8
    return means, scales, quats, opac, shs


def identity_camera(width=64, height=64, fov=0.8):
    """Camera at origin looking down +z (identity extrinsics)."""
    from msgs.core.camera import make_camera
    R = np.eye(3, dtype=np.float32)
    T = np.zeros(3, dtype=np.float32)
    return make_camera(R, T, fov, fov, width, height)


def brute_force_render(camera, means2d, conics, colors, opac, depths, radii,
                       visible, bg, width, height):
    """Direct per-pixel compositor over globally depth-sorted splats,
    replicating the reference CUDA semantics: a splat is evaluated at every
    pixel of every 16x16 tile its radius-rect touches; alpha = min(0.99,
    op*exp(power)) skipped below 1/255; a splat that would drop T below 1e-4
    is dropped and the pixel is finished."""
    order = np.argsort(depths, kind="stable")
    img = np.zeros((height, width, 3), np.float32)
    dep = np.zeros((height, width), np.float32)
    acc = np.zeros((height, width), np.float32)
    Tbuf = np.ones((height, width), np.float32)
    done = np.zeros((height, width), bool)
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE

    pys, pxs = np.mgrid[0:height, 0:width].astype(np.float32)
    tx_of_px = (pxs // TILE).astype(int)
    ty_of_px = (pys // TILE).astype(int)

    for g in order:
        if not visible[g]:
            continue
        r = radii[g]
        mx, my = means2d[g]
        rmin_x = min(tiles_x, max(0, int(math.floor((mx - r) / TILE))))
        rmin_y = min(tiles_y, max(0, int(math.floor((my - r) / TILE))))
        rmax_x = min(tiles_x, max(0, int(math.floor((mx + r + TILE - 1) / TILE))))
        rmax_y = min(tiles_y, max(0, int(math.floor((my + r + TILE - 1) / TILE))))
        in_rect = ((tx_of_px >= rmin_x) & (tx_of_px < rmax_x) &
                   (ty_of_px >= rmin_y) & (ty_of_px < rmax_y))
        dx = pxs - mx
        dy = pys - my
        cxx, cxy, cyy = conics[g]
        power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
        alpha = np.minimum(0.99, opac[g] * np.exp(power))
        sel = in_rect & (alpha >= 1.0 / 255.0) & (power <= 0) & ~done
        t_test = Tbuf * (1 - alpha)
        stop = sel & (t_test < 1e-4)
        done |= stop
        apply = sel & ~stop
        w = np.where(apply, Tbuf * alpha, 0.0)
        img += w[..., None] * colors[g]
        dep += w * depths[g]
        Tbuf = np.where(apply, t_test, Tbuf)
    return img + Tbuf[..., None] * np.asarray(bg), dep, Tbuf
