"""Multi-scale subsystem: schedule semantics, filter_small/filter_large
selection behavior, and an end-to-end ms_train + insert_large smoke run."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from msgs.core.camera import make_camera
from msgs.kernels.rasterize import RasterSettings, rasterize
from msgs.model.gaussians import GaussianConfig, create_from_points
from msgs.ms.schedule import MsSchedule, loss_weight, train_scales
from msgs.train import loop as L


def test_train_scales_and_weights():
    assert train_scales(7) == [1, 2, 4, 8, 16, 32, 64, 128]
    assert loss_weight(0) == 1.0
    assert loss_weight(3) == 0.1


def test_schedule_unlocks():
    import random
    s = MsSchedule(max_reso_pow=7, ms_train=True, insert_large=True,
                   rng=random.Random(0))
    assert s.inc_reso_at == [1010, 1020, 1030]
    assert s.insert_target_for(1010) == 2
    assert s.insert_target_for(1030) == 6
    assert s.insert_target_for(999) is None
    # strictly-after unlock
    assert s._unlocked_levels(1010) == [0]
    assert s._unlocked_levels(1011) == [0, 2, 3]
    assert s._unlocked_levels(1031) == [0, 2, 3, 4, 5, 6, 7]
    # level 1 never unlocked under insert_large (reference quirk)
    assert 1 not in s._unlocked_levels(40000)


def test_schedule_sampling_proportion():
    import random
    s = MsSchedule(max_reso_pow=3, ms_train=True, insert_large=False,
                   rng=random.Random(0))
    lvls = [s.sample_level(5000) for _ in range(2000)]
    frac0 = sum(1 for l in lvls if l == 0) / len(lvls)
    assert 0.72 < frac0 < 0.85   # 75% + uniform includes 0


def test_schedule_fine_tail():
    """--ms_fine_tail_from: past the tail boundary only level 0 samples;
    before it, the normal 75/25 mix is untouched (same RNG stream)."""
    import random
    s = MsSchedule(max_reso_pow=3, ms_train=True, insert_large=False,
                   fine_tail_from=9000, rng=random.Random(0))
    pre = [s.sample_level(5000) for _ in range(500)]
    assert any(l != 0 for l in pre)
    post = [s.sample_level(9000 + i) for i in range(500)]
    assert all(l == 0 for l in post)


def _setup(filter_small=False, filter_large=False):
    rng = np.random.default_rng(0)
    n = 64
    pts = np.concatenate([
        rng.uniform(-1, 1, (n, 2)), rng.uniform(3, 6, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = GaussianConfig(sh_degree=0, reso_lvls=3, capacity=128)
    st = create_from_points(cfg, pts, cols)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, 64, 64)
    settings = RasterSettings(backend="reference", entry_cap=1 << 12,
                              filter_small=filter_small,
                              filter_large=filter_large)
    return cfg, st, cam, settings


def test_filter_small_drops_subpixel_gaussians():
    cfg, st, cam, settings0 = _setup(filter_small=False)
    # Shrink some rows well below one pixel of footprint.
    st = st._replace(scaling=st.scaling.at[:20].add(-3.0))
    out0 = L.eval_render(L.init_train_state(st), cam, cfg=cfg,
                         settings=settings0)
    n0 = int((out0.pixel_sizes > 0).sum())
    subpix = int(((out0.pixel_sizes > 0) & (out0.pixel_sizes < 1.0)).sum())
    assert subpix > 0  # scene includes sub-pixel splats

    settings1 = settings0._replace(filter_small=True)

    # The fade is gated on the *recorded* max_pixel_sizes: a sub-pixel row
    # never resolved at any finer level (record −1) must NOT be faded —
    # there is no coarse substitute for it (VERDICT r1 §missing 2).
    out_ungated = L.eval_render(L.init_train_state(st), cam, cfg=cfg,
                                settings=settings1)
    assert int((out_ungated.pixel_sizes > 0).sum()) == n0

    # Rows recorded as well-resolved at a finer level (max record ≥ 1) DO
    # fade when their current footprint is sub-pixel.
    st2 = st._replace(max_pixel_sizes=jnp.full((128,), 4.0))
    out1 = L.eval_render(L.init_train_state(st2), cam, cfg=cfg,
                         settings=settings1)
    n1 = int((out1.pixel_sizes > 0).sum())
    assert n1 == n0 - subpix

    # A sub-pixel record (< 1) does not trigger the fade either.
    st3 = st._replace(max_pixel_sizes=jnp.full((128,), 0.5))
    out2 = L.eval_render(L.init_train_state(st3), cam, cfg=cfg,
                         settings=settings1)
    assert int((out2.pixel_sizes > 0).sum()) == n0


def test_filter_large_retires_aggregates_at_fine_reso():
    cfg, st, cam, settings = _setup(filter_large=True)
    out0 = L.eval_render(L.init_train_state(st), cam, cfg=cfg,
                         settings=settings)
    big = np.asarray(out0.pixel_sizes) > 5.0
    assert big.sum() > 0
    # Mark every Gaussian as an aggregate built for ~2.5 px: rows now
    # rendering > 2·2.5 = 5 px are being drawn finer than built for...
    st2 = st._replace(min_pixel_sizes=jnp.full((128,), 2.5))
    out1 = L.eval_render(L.init_train_state(st2), cam, cfg=cfg,
                         settings=settings)
    vis1 = np.asarray(out1.pixel_sizes) > 0
    assert not np.any(vis1 & big)
    # ...unless protected by base_mask (preserve_large).
    st3 = st2._replace(base_mask=jnp.ones((128,), bool))
    out2 = L.eval_render(L.init_train_state(st3), cam, cfg=cfg,
                         settings=settings)
    assert int((np.asarray(out2.pixel_sizes) > 0).sum()) == \
        int((np.asarray(out0.pixel_sizes) > 0).sum())
    # Ordinary rows (min record ≈ their current home-level footprint, as the
    # per-level stat updates produce) are untouched: p is never > 2·p.
    st4 = st._replace(min_pixel_sizes=jnp.asarray(out0.pixel_sizes))
    out3 = L.eval_render(L.init_train_state(st4), cam, cfg=cfg,
                         settings=settings)
    assert int((np.asarray(out3.pixel_sizes) > 0).sum()) == \
        int((np.asarray(out0.pixel_sizes) > 0).sum())


def test_ms_training_with_insert_smoke():
    """A miniature ms_train run: levels 0/1/2, pixel stats accumulate, an
    insert episode adds aggregates, and training continues finite."""
    from msgs.train.optimizer import OptimParams
    cfg, st, cam_full, settings = _setup(filter_small=True)
    state = L.init_train_state(st)
    op = OptimParams()
    cams = {lvl: make_camera(np.eye(3), np.zeros(3), 0.9, 0.9,
                             64 // (2 ** lvl), 64 // (2 ** lvl))
            for lvl in range(3)}
    rng = np.random.default_rng(0)
    gt = {lvl: jnp.asarray(rng.uniform(0, 1, (64 // 2**lvl, 64 // 2**lvl, 3)
                                       ).astype(np.float32))
          for lvl in range(3)}

    for it in range(12):
        lvl = [0, 0, 0, 1, 0, 2, 0, 1, 0, 2, 0, 0][it]
        state, m = L.train_step(
            state, cams[lvl], gt[lvl], cfg=cfg, op=op, settings=settings,
            reso_lvl=lvl, spatial_lr_scale=1.0,
            loss_mult=1.0 if lvl == 0 else 0.1)
        assert np.isfinite(float(m["loss"]))

    st = state.gaussians
    # Per-home-level stats: lvl-0 rows record min at lvl-0 renders; max
    # stays uninitialized until coarse-level aggregates exist.
    assert np.any(np.asarray(st.min_pixel_sizes) >= 0)
    assert not np.any(np.asarray(st.max_pixel_sizes) >= 0)

    # Insert episode at level 2.
    out2 = L.eval_render(state, cams[2], cfg=cfg, settings=settings,
                         reso_lvl=2)
    px = jnp.where(out2.pixel_sizes > 0, out2.pixel_sizes, jnp.inf)
    sel = (px < 4.0) & state.gaussians.live
    assert int(sel.sum()) > 0
    n_before = int(state.gaussians.num_live)
    state, n_ins = L.insert_large_step(
        state, sel, jnp.where(jnp.isfinite(px), px, 0.0), 2,
        scene_extent=6.0, voxel_reso=0.01)
    assert int(n_ins) > 0
    assert int(state.gaussians.num_live) == n_before + int(n_ins)
    inserted = np.asarray(state.gaussians.target_reso_lvl) == 2
    assert inserted.sum() == int(n_ins)

    # Continue training after insert — still finite.
    state, m = L.train_step(
        state, cams[0], gt[0], cfg=cfg, op=op, settings=settings,
        reso_lvl=0, spatial_lr_scale=1.0)
    assert np.isfinite(float(m["loss"]))
