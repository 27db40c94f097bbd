"""Row-tight binning vs full-rect binning: rendered-image parity, Binned
invariants, and a brute-force coverage-superset check (ADVICE r2: the
row-tight path previously shipped untested behind an env flag).

The row-tight path may only DROP entries that cannot pass the compositor's
α ≥ 1/255 selection test; extra entries compose as exact no-ops. So:
  * images/depth/transmittance must match the rect path (tight tolerance —
    the only legal divergence is unstable-sort order among equal-depth
    quanta, absent in these scenes),
  * every (gaussian, tile) pair with a surviving pixel (evaluated in exact
    float64 by an independent numpy pass) must appear in the entry stream.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from msgs.core.camera import make_camera
from msgs.kernels.binning import SUB, bin_gaussians
from msgs.kernels.preprocess import ALPHA_MIN, TILE, preprocess
from msgs.kernels.rasterize import RasterSettings, rasterize
from tests.helpers import identity_camera, make_scene

W = H = 64


def _scene(kind, seed):
    if kind == "normal":
        return make_scene(n=200, seed=seed, sh_degree=0)
    # Large faint splats: the catastrophic-cancellation stress case for the
    # row-span radicand (big covariances → tiny conic coefficients) combined
    # with opacities near the α threshold (tangent rows carry α ≈ 1/255).
    rng = np.random.default_rng(seed)
    n = 64
    means = np.concatenate(
        [rng.uniform(-1.5, 1.5, (n, 2)),
         rng.uniform(3.0, 8.0, (n, 1))], axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(-1.5, -0.2, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.006, 0.08, (n,)).astype(np.float32)
    shs = rng.normal(0, 0.3, (n, 1, 3)).astype(np.float32) + 0.8
    return means, scales, quats, opac, shs


def _render(camera, scene, row_tight):
    means, scales, quats, opac, shs = scene
    settings = RasterSettings(backend="reference", entry_cap=1 << 15,
                              row_tight=row_tight)
    return rasterize(
        camera, jnp.asarray(means), jnp.asarray(opac), shs=jnp.asarray(shs),
        scales=jnp.asarray(scales), quats=jnp.asarray(quats),
        active_sh_degree=0, bg=jnp.array([0.2, 0.3, 0.4]), settings=settings)


@pytest.mark.parametrize("tight", [True, "bands"])
@pytest.mark.parametrize("kind,seed", [("normal", 1), ("normal", 7),
                                       ("faint", 3)])
def test_rowtight_image_parity(kind, seed, tight):
    camera = identity_camera(W, H)
    scene = _scene(kind, seed)
    rect = _render(camera, scene, row_tight=False)
    rowt = _render(camera, scene, row_tight=tight)
    assert int(rect.overflow) == 0 and int(rowt.overflow) == 0
    # Row-tight must never emit MORE entries than the rect path.
    assert int(rowt.num_entries) <= int(rect.num_entries)
    np.testing.assert_allclose(np.asarray(rowt.image),
                               np.asarray(rect.image), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rowt.depth),
                               np.asarray(rect.depth), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rowt.transmittance),
                               np.asarray(rect.transmittance), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rowt.pixel_sizes),
                               np.asarray(rect.pixel_sizes), atol=1e-6)


def _binned_pairs(binned, n):
    """Set of (gaussian, tile) pairs present in the packed entry stream,
    plus per-gaussian entry counts."""
    gid = np.asarray(binned.gauss_id)
    sub_tile = np.asarray(binned.sub_tile)
    sub_valid = np.asarray(binned.sub_valid)
    e_tile = np.repeat(sub_tile, SUB)
    e_live = np.repeat(sub_valid, SUB).astype(bool) & (gid < n)
    pairs = set(zip(gid[e_live].tolist(), e_tile[e_live].tolist()))
    counts = np.bincount(gid[e_live], minlength=n)
    return pairs, counts


@pytest.mark.parametrize("tight", [True, "bands"])
@pytest.mark.parametrize("kind,seed", [("normal", 1), ("faint", 3)])
def test_rowtight_coverage_superset_and_invariants(kind, seed, tight):
    camera = identity_camera(W, H)
    means, scales, quats, opac, shs = _scene(kind, seed)
    pre = preprocess(camera, jnp.asarray(means), jnp.asarray(opac),
                     shs=jnp.asarray(shs), scales=jnp.asarray(scales),
                     quats=jnp.asarray(quats), active_sh_degree=0)
    binned = bin_gaussians(pre, W, H, 1 << 15, row_tight=tight)
    n = means.shape[0]
    pairs, counts = _binned_pairs(binned, n)

    # Invariant: gid_starts segment widths == per-gaussian emitted entries.
    gs = np.asarray(binned.gid_starts)
    np.testing.assert_array_equal(np.diff(gs), counts)
    assert int(binned.num_entries) == int(counts.sum())

    # Brute-force float64 surviving-pixel set, restricted to the rect-path
    # tile rect (the reference's selection domain).
    m2d = np.asarray(pre.means2d, np.float64)
    con = np.asarray(pre.conics, np.float64)
    op = np.asarray(pre.opacities, np.float64)
    vis = np.asarray(pre.visible)
    rmin = np.asarray(pre.rect_min)
    rmax = np.asarray(pre.rect_max)
    tiles_x = (W + TILE - 1) // TILE
    pys, pxs = np.mgrid[0:H, 0:W].astype(np.float64)
    txp = (pxs // TILE).astype(int)
    typ = (pys // TILE).astype(int)
    missing = []
    for g in range(n):
        if not vis[g]:
            continue
        dx = pxs - m2d[g, 0]
        dy = pys - m2d[g, 1]
        power = (-0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy)
                 - con[g, 1] * dx * dy)
        alpha = op[g] * np.exp(power)
        in_rect = ((txp >= rmin[g, 0]) & (txp < rmax[g, 0]) &
                   (typ >= rmin[g, 1]) & (typ < rmax[g, 1]))
        live = in_rect & (alpha >= ALPHA_MIN) & (power <= 0)
        for t in np.unique(typ[live] * tiles_x + txp[live]):
            if (g, int(t)) not in pairs:
                missing.append((g, int(t)))
    assert not missing, f"tight binning dropped live (gaussian, tile): {missing[:10]}"
