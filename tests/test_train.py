"""End-to-end training smoke test: optimizing a fresh model against renders
of a known target model must reduce loss substantially (the CPU-scale
equivalent of BASELINE config 2)."""
import jax
import jax.numpy as jnp
import numpy as np

from msgs.core.camera import make_camera
from msgs.kernels.rasterize import RasterSettings
from msgs.model.gaussians import GaussianConfig, create_from_points
from msgs.train import loop as L
from msgs.train.optimizer import OptimParams

CAP = 256
H = W = 64


def test_training_reduces_loss():
    rng = np.random.default_rng(0)
    n = 96
    pts = np.concatenate([
        rng.uniform(-1, 1, (n, 2)), rng.uniform(3, 6, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = GaussianConfig(sh_degree=1, reso_lvls=1, capacity=CAP)
    settings = RasterSettings(backend="pallas", entry_cap=1 << 12)

    # Ground truth from a "true" model with shifted colors/positions.
    st_true = create_from_points(cfg, pts, cols)
    cams = [make_camera(np.eye(3), np.asarray([dx, 0, 0], np.float32),
                        0.9, 0.9, W, H) for dx in (-0.3, 0.0, 0.3)]
    gts = [L.eval_render(
        L.init_train_state(st_true), c, cfg=cfg, settings=settings).image
        for c in cams]

    # Train a perturbed model.
    pts2 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    cols2 = np.clip(cols + rng.normal(0, 0.2, cols.shape), 0, 1).astype(
        np.float32)
    state = L.init_train_state(create_from_points(cfg, pts2, cols2))
    op = OptimParams(position_lr_init=1.6e-3, position_lr_final=1.6e-4)

    losses = []
    for it in range(60):
        cam_i = it % len(cams)
        state, m = L.train_step(
            state, cams[cam_i], gts[cam_i],
            cfg=cfg, op=op, settings=settings, reso_lvl=0,
            spatial_lr_scale=1.0)
        losses.append(float(m["loss"]))
    first = np.mean(losses[:6])
    last = np.mean(losses[-6:])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)


def test_densify_step_runs_in_training():
    rng = np.random.default_rng(1)
    n = 64
    pts = np.concatenate([
        rng.uniform(-1, 1, (n, 2)), rng.uniform(3, 6, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = GaussianConfig(sh_degree=1, reso_lvls=1, capacity=CAP)
    settings = RasterSettings(backend="pallas", entry_cap=1 << 12)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, W, H)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    state = L.init_train_state(create_from_points(cfg, pts, cols))
    op = OptimParams(densify_grad_threshold=1e-7)  # force lots of candidates
    for _ in range(3):
        state, m = L.train_step(state, cam, gt, cfg=cfg, op=op,
                                settings=settings, reso_lvl=0,
                                spatial_lr_scale=1.0)
    before = int(state.gaussians.num_live)
    state = L.densify_step(state, jax.random.PRNGKey(0), op=op,
                           scene_extent=1.0, max_screen_size=0.0)
    after = int(state.gaussians.num_live)
    assert after != before  # clones/splits/prunes actually happened
    assert np.all(np.isfinite(np.asarray(state.gaussians.xyz)))
    # Adam moments of new rows are zeroed.
    state2, m = L.train_step(state, cam, gt, cfg=cfg, op=op,
                             settings=settings, reso_lvl=0,
                             spatial_lr_scale=1.0)
    assert np.isfinite(float(m["loss"]))
