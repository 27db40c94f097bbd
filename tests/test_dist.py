"""Sharded (2-D mesh) rendering must match the single-device path: loss
values and parameter gradients, at lambda_dssim=0 (pure L1) AND at the
training value 0.2 (SSIM via the stripe halo exchange)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from msgs.core.camera import make_camera
from msgs.dist.mesh import GAUSS_AXIS, TILE_AXIS, make_mesh
from msgs.dist.shard import build_sharded_loss, state_as_dicts
from msgs.eval.metrics import photometric_loss
from msgs.kernels.preprocess import TILE
from msgs.kernels.rasterize import RasterSettings
from msgs.model.gaussians import GaussianConfig, create_from_points
from msgs.train.loop import render_state

CAP = 512
H, W = 128, 64  # 8 stripes of one tile-row each


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    n = CAP // 2
    means = np.concatenate([
        rng.uniform(-1.0, 1.0, (n, 2)),
        rng.uniform(2.5, 7.0, (n, 1))], axis=1).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = GaussianConfig(sh_degree=1, reso_lvls=2, capacity=CAP)
    st = create_from_points(cfg, means, colors)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9 * H / W, W, H)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    return cfg, st, cam, gt


@pytest.mark.parametrize("lambda_dssim", [0.0, 0.2])
def test_sharded_matches_single(setup, lambda_dssim):
    cfg, st, cam, gt = setup
    mesh = make_mesh(n_gauss=2, n_tile=4)
    settings = RasterSettings(backend="pallas", entry_cap=1 << 12)

    # packet_cap = C_local: no packet can overflow, so the sharded loss
    # must match the single-device one exactly (SSIM included — the halo
    # exchange restores stripe-boundary windows).
    sharded_loss = build_sharded_loss(mesh, cfg, settings, H, W,
                                      lambda_dssim=lambda_dssim,
                                      packet_cap=CAP // 2)
    params, side = state_as_dicts(st)
    gauss_sh = NamedSharding(mesh, P(GAUSS_AXIS))
    repl = NamedSharding(mesh, P())
    params = {k: jax.device_put(v, gauss_sh) for k, v in params.items()}
    side = {k: jax.device_put(v, repl if k == "active_sh_degree"
                              else gauss_sh) for k, v in side.items()}
    probe = jax.device_put(jnp.zeros((CAP, 2)), gauss_sh)
    gt_sh = jax.device_put(gt, NamedSharding(mesh, P((GAUSS_AXIS, TILE_AXIS))))

    @jax.jit
    def sh_val_grad(params, side, probe, gt):
        return jax.value_and_grad(sharded_loss, argnums=(0, 2),
                                  has_aux=True)(params, side, probe, cam, gt)

    (loss_sh, aux), (g_sh, pg_sh) = sh_val_grad(params, side, probe, gt_sh)

    # Single-device reference: same loss through the plain rasterizer.
    def single_loss(params, probe):
        st2 = st.with_params(params)
        out = render_state(st2, cam, cfg, settings,
                           bg=jnp.zeros((3,)), means2d_probe=probe)
        return photometric_loss(out.image, gt, lambda_dssim)

    (loss_1), (g_1, pg_1) = jax.value_and_grad(
        single_loss, argnums=(0, 1))(st.params(), jnp.zeros((CAP, 2)))

    np.testing.assert_allclose(float(loss_sh), float(loss_1), rtol=1e-5)
    for k in g_1:
        a, b = np.asarray(g_1[k]), np.asarray(g_sh[k])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=3e-5 * scale,
                                   err_msg=f"sharded grad mismatch: {k}")
    np.testing.assert_allclose(np.asarray(pg_sh), np.asarray(pg_1),
                               atol=3e-5 * max(np.abs(pg_1).max(), 1e-8))
    # Side outputs.
    assert bool(jnp.any(aux.contributed))
    assert int(aux.overflow) == 0


def test_packet_cap_growth_converges(setup):
    """The trainer's exchange-overflow recovery loop (apps/train.py
    packet_cap doubling): a deliberately undersized packet_cap must (a)
    report exch_overflow > 0, (b) leave the state bit-identical (the
    in-jit discard guard, dist/shard.py), and (c) after doubling until the
    overflow clears, produce the same step as an un-truncated run —
    VERDICT r3 item 5 (the growth path was never exercised end-to-end)."""
    from msgs.dist.mesh import make_mesh
    from msgs.dist.shard import (build_sharded_train_step, fetch_train_state,
                                 shard_train_state)
    from msgs.train.loop import init_train_state
    from msgs.train.optimizer import OptimParams

    cfg, st, cam, gt = setup
    mesh = make_mesh(n_gauss=2, n_tile=4)
    settings = RasterSettings(backend="pallas", entry_cap=1 << 12)
    op = OptimParams()
    gt_sh = jax.device_put(gt, NamedSharding(mesh, P((GAUSS_AXIS,
                                                      TILE_AXIS))))
    state0 = shard_train_state(init_train_state(st), mesh, CAP)

    def run(packet_cap):
        step = build_sharded_train_step(
            mesh, cfg, op, settings, H, W, spatial_lr_scale=1.0,
            packet_cap=packet_cap)
        return step(state0, cam, gt_sh)

    # Un-truncated control (every source shard's full capacity fits).
    s_big, m_big = run(CAP)
    assert int(m_big["exch_overflow"]) == 0

    # The trainer's sequence: undersized cap -> discarded step -> double ->
    # re-jit -> retry.
    pc = 4
    overflowed = 0
    while True:
        s_new, m = run(pc)
        if int(m["exch_overflow"]) == 0:
            break
        overflowed += 1
        # Discard guard: the overflowing step must not move the model.
        g_new = fetch_train_state(s_new).gaussians
        g_old = fetch_train_state(state0).gaussians
        for a, b in zip(jax.tree_util.tree_leaves(g_new),
                        jax.tree_util.tree_leaves(g_old)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        pc *= 2
        assert pc <= 4 * CAP, "packet_cap growth did not converge"
    assert overflowed >= 1, "undersized packet_cap never overflowed"

    # Post-growth step == un-truncated step.
    np.testing.assert_allclose(float(m["loss"]), float(m_big["loss"]),
                               rtol=1e-6)
    ga = fetch_train_state(s_new).gaussians
    gb = fetch_train_state(s_big).gaussians
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            scale = max(np.abs(a).max(), 1e-8)
            np.testing.assert_allclose(b, a, atol=1e-5 * scale)
        else:
            np.testing.assert_array_equal(a, b)
