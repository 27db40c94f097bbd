"""GaussianState structural mutations: clone/split/prune/grow/insert under
fixed capacity, pixel-size stat rules, kNN init, PLY roundtrip."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from msgs.kernels.knn import knn_mean_sq_dist
from msgs.model import gaussians as G
from msgs.model.gaussians import GaussianConfig, create_from_points
from msgs.ms.voxel import insert_large_gaussians

CFG = GaussianConfig(sh_degree=2, reso_lvls=3, capacity=256)


def make_state(n=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return create_from_points(CFG, pts, cols)


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (200, 3)).astype(np.float32)
    d2 = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3))
    # brute force
    dist = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(dist, np.inf)
    expect = np.sort(dist, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(d2, expect, rtol=1e-4)


def test_create_live_count():
    st = make_state(64)
    assert int(st.num_live) == 64
    assert st.xyz.shape[0] == CFG.capacity


def test_clone_allocates_free_slots():
    st = make_state(64)
    grads = jnp.zeros((CFG.capacity,)).at[:10].set(1.0)
    st2, touched = G.densify_clone(st, grads, 0.5, 100.0, 1.0)
    assert int(st2.num_live) == 74
    assert int(touched.sum()) == 10
    # clones carry parent position
    new_rows = np.asarray(touched) & ~np.asarray(st.live)
    assert new_rows.sum() == 10


def test_split_prunes_parent_and_spawns_two():
    st = make_state(64)
    # make row 0 big so it splits
    st = st._replace(scaling=st.scaling.at[0].set(jnp.log(5.0)))
    grads = jnp.zeros((CFG.capacity,)).at[0].set(1.0)
    st2, touched = G.densify_split(st, grads, 0.5, 0.01, 1.0,
                                   jax.random.PRNGKey(0))
    assert int(st2.num_live) == 64 - 1 + 2
    assert not bool(st2.live[0])
    assert int(touched.sum()) == 2


def test_prune_by_opacity():
    st = make_state(64)
    st = st._replace(opacity=st.opacity.at[:5].set(-20.0))  # sigmoid ~ 0
    st2, _ = G.densify_and_prune(
        st, jax.random.PRNGKey(0), grad_threshold=10.0, min_opacity=0.005,
        scene_extent=1.0, max_screen_size=0.0, percent_dense=0.01)
    assert int(st2.num_live) == 59


def test_reset_opacity_only_lvl0():
    st = make_state(64)
    st = st._replace(target_reso_lvl=st.target_reso_lvl.at[1].set(2),
                     opacity=jnp.full_like(st.opacity, 3.0))
    st2, _ = G.reset_opacity(st)
    op = np.asarray(st2.act_opacity())
    assert op[0] <= 0.0101
    assert abs(op[1] - jax.nn.sigmoid(3.0)) < 1e-6  # non-lvl0 untouched


def test_pixel_size_stats_rules():
    st = make_state(8)
    px = jnp.full((CFG.capacity,), 4.0)
    # Stats are per-home-level (gaussian_model.py:664): a lvl-0 row updates
    # only at lvl-0 renders, and only its min side (max needs lvl > 0).
    st1 = G.update_pixel_sizes(st, px, 0, CFG.reso_lvls)
    assert float(st1.max_pixel_sizes[0]) == -1.0
    assert float(st1.min_pixel_sizes[0]) == 4.0
    # A lvl-1 render does not touch lvl-0 rows at all.
    st2 = G.update_pixel_sizes(st1, jnp.full((CFG.capacity,), 2.0), 1,
                               CFG.reso_lvls)
    assert float(st2.max_pixel_sizes[0]) == -1.0
    assert float(st2.min_pixel_sizes[0]) == 4.0
    # Rows homed at level 1 update max and min at lvl-1 renders, with the
    # 0.95 decay / 1.05 inflation freshness rules.
    st3 = st1._replace(target_reso_lvl=st1.target_reso_lvl.at[:].set(1))
    st4 = G.update_pixel_sizes(st3, jnp.full((CFG.capacity,), 2.0), 1,
                               CFG.reso_lvls)
    assert float(st4.max_pixel_sizes[0]) == 2.0
    np.testing.assert_allclose(float(st4.min_pixel_sizes[0]), 2.0, rtol=1e-6)
    st5 = G.update_pixel_sizes(st4, jnp.full((CFG.capacity,), 1.0), 1,
                               CFG.reso_lvls)
    np.testing.assert_allclose(float(st5.max_pixel_sizes[0]), 2.0 * 0.95,
                               rtol=1e-6)
    np.testing.assert_allclose(float(st5.min_pixel_sizes[0]), 1.0, rtol=1e-6)


def test_insert_large_voxel_means():
    st = make_state(32)
    # two clusters far apart -> two voxels
    xyz = np.zeros((CFG.capacity, 3), np.float32)
    xyz[:16] = [0.1, 0.1, 0.1]
    xyz[16:32] = [0.5, 0.5, 0.5]
    st = st._replace(xyz=jnp.asarray(xyz))
    mask = jnp.zeros((CFG.capacity,), bool).at[:32].set(True)
    cur_min = jnp.full((CFG.capacity,), 0.5)
    st2, touched, n_ins = insert_large_gaussians(
        st, mask, cur_min, 2, scene_extent=1.0, voxel_reso=0.1)
    assert int(n_ins) == 2
    assert int(st2.num_live) == 34
    new_idx = np.nonzero(np.asarray(touched))[0]
    new_xyz = np.asarray(st2.xyz)[new_idx]
    assert any(np.allclose(p, [0.1, 0.1, 0.1], atol=1e-5) for p in new_xyz)
    assert any(np.allclose(p, [0.5, 0.5, 0.5], atol=1e-5) for p in new_xyz)
    assert all(np.asarray(st2.target_reso_lvl)[new_idx] == 2)
    # scale = mean(log-scales of the cluster) + log(2/clip(0.5,0.25,2)=4)
    base = np.asarray(st.scaling)
    order = np.argsort(new_xyz[:, 0])   # cluster at 0.1 first
    expect0 = base[:16].mean(0) + np.log(4.0)
    expect1 = base[16:32].mean(0) + np.log(4.0)
    got = np.asarray(st2.scaling)[new_idx][order]
    np.testing.assert_allclose(got[0], expect0, atol=1e-5)
    np.testing.assert_allclose(got[1], expect1, atol=1e-5)


def test_ply_roundtrip(tmp_path):
    from msgs.train.checkpoint import load_ply_snapshot, save_ply_snapshot
    st = make_state(64, seed=5)
    p = os.path.join(tmp_path, "model.ply")
    save_ply_snapshot(p, st)
    st2 = load_ply_snapshot(p, CFG)
    assert int(st2.num_live) == 64
    live = np.asarray(st.live)
    np.testing.assert_allclose(np.asarray(st2.xyz)[:64],
                               np.asarray(st.xyz)[live], atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.features_rest)[:64],
                               np.asarray(st.features_rest)[live], atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.scaling)[:64],
                               np.asarray(st.scaling)[live], atol=1e-6)
