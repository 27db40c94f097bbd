"""Sharded differentiable rendering + training step over a 2-D device mesh.

Design (SURVEY.md §5/§7.2 step 6 — the splatting analogue of the
sharding-recipe from the scaling playbook):

  - Parameters, Adam moments, and per-Gaussian side state are sharded on the
    leading (capacity) axis over the **gauss** mesh axis. Preprocess
    (projection, covariance, SH) runs on local shards only.
  - The image is partitioned into row stripes over **both** mesh axes
    (n_stripes = |gauss|·|tile|), so every device composites a distinct
    stripe — no redundant tile work on the gauss axis.
  - One `all_gather` along "gauss" moves the culled per-Gaussian compositor
    features to every device (its autodiff transpose is the
    `reduce_scatter` of per-Gaussian gradients — XLA inserts it); loss terms
    are `pmean`ed across the whole mesh. Both collectives ride ICI.
  - Binning + Pallas compositing run per-device on the stripe-local
    coordinate frame (means/rects shifted by the stripe offset).

Stripe SSIM note: SSIM windows are evaluated per stripe (no halo exchange
yet), so an 11-px band at each stripe boundary contributes slightly
different SSIM gradients than the single-device path. L1 is exact.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from msgs.dist.mesh import GAUSS_AXIS, TILE_AXIS
from msgs.eval.metrics import l1_loss, ssim
from msgs.kernels.preprocess import TILE, preprocess
from msgs.kernels.rasterize import RasterSettings, composite_pipeline
from msgs.model.gaussians import GaussianConfig, GaussianState
from msgs.train.loop import TrainState
from msgs.train.optimizer import OptimParams, adam_update, group_lrs

_GATHER_FIELDS = ("means2d", "depths", "conics", "colors", "opacities",
                  "radii", "pixel_sizes", "rect_min", "rect_max", "visible")


def _shift_stripe(pre, stripe_idx, tiles_y_local: int, h_local: int):
    """Re-express preprocess outputs in the stripe-local frame."""
    off = (stripe_idx * h_local).astype(jnp.float32)
    means2d = pre.means2d - jnp.stack(
        [jnp.zeros_like(off), off])[None, :]
    rmin_y = jnp.clip(pre.rect_min[:, 1] - stripe_idx * tiles_y_local,
                      0, tiles_y_local)
    rmax_y = jnp.clip(pre.rect_max[:, 1] - stripe_idx * tiles_y_local,
                      0, tiles_y_local)
    visible = pre.visible & (rmax_y > rmin_y)
    return pre._replace(
        means2d=means2d,
        rect_min=jnp.stack([pre.rect_min[:, 0], rmin_y], axis=1),
        rect_max=jnp.stack([pre.rect_max[:, 0], rmax_y], axis=1),
        visible=visible)


class ShardedAux(NamedTuple):
    l1: jnp.ndarray
    radii: jnp.ndarray         # (C,) sharded over gauss
    pixel_sizes_raw: jnp.ndarray
    contributed: jnp.ndarray   # (C,) replicated
    num_entries: jnp.ndarray
    overflow: jnp.ndarray


def build_sharded_loss(mesh: Mesh, cfg: GaussianConfig,
                       settings: RasterSettings, height: int, width: int,
                       *, lambda_dssim: float = 0.2, loss_mult: float = 1.0,
                       reso_lvl: int = 0, fade_size: float = 0.0):
    """Returns loss_fn(params, side, probe, camera, gt) → (loss, ShardedAux),
    where params/side/probe are gauss-sharded and gt is stripe-sharded."""
    n_gauss = mesh.shape[GAUSS_AXIS]
    n_tile = mesh.shape[TILE_AXIS]
    n_stripes = n_gauss * n_tile
    assert height % (n_stripes * TILE) == 0, (
        f"image height {height} must be divisible by n_stripes*TILE = "
        f"{n_stripes * TILE}")
    h_local = height // n_stripes
    tiles_y_local = h_local // TILE

    def loss_sm(params, side, probe, camera, gt_stripe):
        st = GaussianState(**params, **side)
        g_idx = jax.lax.axis_index(GAUSS_AXIS)
        t_idx = jax.lax.axis_index(TILE_AXIS)
        stripe_idx = g_idx * n_tile + t_idx

        pre = preprocess(
            camera, st.xyz, st.act_opacity(),
            shs=st.shs(), scales=st.act_scales(), quats=st.act_rotation(),
            active_sh_degree=st.active_sh_degree,
            live_mask=st.live, means2d_probe=probe,
            filter_small=settings.filter_small,
            filter_large=settings.filter_large,
            fade_size=fade_size,
            max_pixel_sizes=st.max_pixel_sizes,
            min_pixel_sizes=st.min_pixel_sizes,
            base_mask=st.base_mask,
            occ_multiplier=st.act_occ(cfg.multi_occ),
            dc_delta=st.dc_delta if cfg.multi_dc else None,
            reso_lvl=reso_lvl)

        # Ship culled per-Gaussian features to every device (ICI all-gather;
        # transpose = reduce-scatter of gradients).
        gathered = {
            k: jax.lax.all_gather(getattr(pre, k), GAUSS_AXIS, axis=0,
                                  tiled=True)
            for k in _GATHER_FIELDS}
        pre_full = pre._replace(**gathered)
        pre_stripe = _shift_stripe(pre_full, stripe_idx, tiles_y_local,
                                   h_local)
        res = composite_pipeline(pre_stripe, width, h_local, settings)

        image = res.image   # bg is zero in training (reference train.py:77)
        l1 = l1_loss(image, gt_stripe)
        loss = ((1.0 - lambda_dssim) * l1
                + lambda_dssim * (1.0 - ssim(image, gt_stripe)))
        loss = jax.lax.pmean(loss * loss_mult, (GAUSS_AXIS, TILE_AXIS))
        l1 = jax.lax.pmean(l1, (GAUSS_AXIS, TILE_AXIS))

        contributed = jax.lax.psum(
            res.contributed.astype(jnp.float32),
            (GAUSS_AXIS, TILE_AXIS)) > 0
        aux = ShardedAux(
            l1=l1,
            radii=pre.radii,
            pixel_sizes_raw=pre.pixel_sizes,
            contributed=contributed,
            num_entries=jax.lax.psum(res.num_entries, (GAUSS_AXIS, TILE_AXIS)),
            overflow=jax.lax.psum(res.overflow, (GAUSS_AXIS, TILE_AXIS)),
        )
        return loss, aux

    param_keys = ("xyz", "features_dc", "features_rest", "scaling",
                  "rotation", "opacity", "occ_multiplier", "dc_delta")
    side_keys = ("live", "max_radii2d", "max_pixel_sizes", "min_pixel_sizes",
                 "base_mask", "target_reso_lvl", "xyz_grad_accum", "denom",
                 "active_sh_degree")

    sharded = shard_map(
        loss_sm, mesh=mesh,
        in_specs=(
            {k: P(GAUSS_AXIS) for k in param_keys},
            {k: (P() if k == "active_sh_degree" else P(GAUSS_AXIS))
             for k in side_keys},
            P(GAUSS_AXIS),                       # probe
            P(),                                  # camera
            P((GAUSS_AXIS, TILE_AXIS)),           # gt stripes
        ),
        out_specs=(P(), ShardedAux(
            l1=P(), radii=P(GAUSS_AXIS), pixel_sizes_raw=P(GAUSS_AXIS),
            contributed=P(), num_entries=P(), overflow=P())),
        check_vma=False,
    )

    def loss_fn(params, side, probe, camera, gt):
        return sharded(params, side, probe, camera, gt)

    return loss_fn


def state_as_dicts(st: GaussianState):
    params = st.params()
    side = {
        "live": st.live, "max_radii2d": st.max_radii2d,
        "max_pixel_sizes": st.max_pixel_sizes,
        "min_pixel_sizes": st.min_pixel_sizes,
        "base_mask": st.base_mask, "target_reso_lvl": st.target_reso_lvl,
        "xyz_grad_accum": st.xyz_grad_accum, "denom": st.denom,
        "active_sh_degree": st.active_sh_degree,
    }
    return params, side


def build_sharded_train_step(mesh: Mesh, cfg: GaussianConfig,
                             op: OptimParams, settings: RasterSettings,
                             height: int, width: int, *,
                             spatial_lr_scale: float = 1.0,
                             reso_lvl: int = 0, loss_mult: float = 1.0):
    """Full sharded train step: sharded render+loss, backward (grads land
    gauss-sharded via the gather transpose), Adam, side-state updates."""
    from msgs.model import gaussians as G

    loss_fn = build_sharded_loss(
        mesh, cfg, settings, height, width, reso_lvl=reso_lvl,
        loss_mult=loss_mult)

    @jax.jit
    def step(state: TrainState, camera, gt):
        st = state.gaussians
        params, side = state_as_dicts(st)
        probe = jnp.zeros((st.xyz.shape[0], 2), jnp.float32)

        (loss, aux), (grads, probe_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 2), has_aux=True)(
                params, side, probe, camera, gt)

        lrs = group_lrs(op, spatial_lr_scale, state.iteration)
        new_params, new_adam = adam_update(params, grads, state.adam, lrs)
        st = st.with_params(new_params)

        vis = aux.radii > 0
        px = jnp.where(aux.contributed, aux.pixel_sizes_raw, 0.0)
        st = G.update_pixel_sizes(st, px, reso_lvl, cfg.reso_lvls)
        st = G.update_max_radii(st, aux.radii, vis)
        st = G.add_densification_stats(st, probe_grad, vis, reso_lvl)

        new_state = TrainState(gaussians=st, adam=new_adam,
                               iteration=state.iteration + 1)
        metrics = {"loss": loss, "l1": aux.l1,
                   "num_entries": aux.num_entries, "overflow": aux.overflow}
        return new_state, metrics

    return step
