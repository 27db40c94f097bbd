"""Jitted training step + structural-mutation steps.

One `train_step` fuses render → loss → backward → Adam → stat updates into a
single XLA program (per resolution level, since image shapes are static).
Structural mutations (densify/prune/reset/grow/insert) are separate jitted
functions invoked by the host schedule at their cadences (SURVEY.md §2.5),
each returning a `touched` row mask used to zero Adam moments — the
functional replacement for the reference's optimizer surgery.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from msgs.eval.metrics import l1_loss, ssim
from msgs.kernels.rasterize import RasterSettings, RenderOutput, rasterize
from msgs.model import gaussians as G
from msgs.model.gaussians import GaussianConfig, GaussianState
from msgs.ms.voxel import insert_large_gaussians
from msgs.train.optimizer import (AdamState, OptimParams, adam_update,
                                  group_lrs, init_adam, zero_moments_at)


class TrainState(NamedTuple):
    gaussians: GaussianState
    adam: AdamState
    iteration: jnp.ndarray   # () int32


def init_train_state(st: GaussianState) -> TrainState:
    return TrainState(gaussians=st, adam=init_adam(st.params()),
                      iteration=jnp.zeros((), jnp.int32))


def render_state(st: GaussianState, camera, cfg: GaussianConfig,
                 settings: RasterSettings, *, bg=None, reso_lvl: int = 0,
                 fade_size: float = 0.0, scale_modifier: float = 1.0,
                 means2d_probe=None, override_color=None,
                 active_sh_degree=None) -> RenderOutput:
    """Render a GaussianState through the rasterizer — the L3 'render bridge'
    (gaussian_renderer/__init__.py:18-119) as a pure function."""
    return rasterize(
        camera,
        st.xyz,
        st.act_opacity(),
        shs=None if override_color is not None else st.shs(),
        colors_precomp=override_color,
        scales=st.act_scales(scale_modifier),
        quats=st.act_rotation(),
        active_sh_degree=(st.active_sh_degree if active_sh_degree is None
                          else active_sh_degree),
        bg=bg,
        live_mask=st.live,
        means2d_probe=means2d_probe,
        fade_size=fade_size,
        max_pixel_sizes=st.max_pixel_sizes,
        min_pixel_sizes=st.min_pixel_sizes,
        base_mask=st.base_mask,
        occ_multiplier=st.act_occ(cfg.multi_occ),
        dc_delta=st.dc_delta if cfg.multi_dc else None,
        reso_lvl=reso_lvl,
        settings=settings,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "op", "settings", "reso_lvl", "spatial_lr_scale",
                     "lambda_dssim", "loss_mult", "fade_size"))
def train_step(state: TrainState, camera, gt_image, *,
               cfg: GaussianConfig, op: OptimParams,
               settings: RasterSettings, reso_lvl: int,
               spatial_lr_scale: float, lambda_dssim: float = 0.2,
               loss_mult: float = 1.0, fade_size: float = 0.0,
               do_px_update=True, do_densify_stats=True,
               do_base_mask=False, ms_lr_active=False):
    """One optimization step at a fixed resolution level.

    Mirrors the reference hot loop body (train.py:196-250): render, weighted
    photometric loss, backward, Adam with per-group LRs (xyz on the expon
    schedule), then pixel-size stats, max-radii, and densification-stat
    accumulation under their iteration gates (passed as traced bools).
    """
    st = state.gaussians
    probe = jnp.zeros((st.xyz.shape[0], 2), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)

    def loss_fn(params, probe):
        st2 = st.with_params(params)
        out = render_state(st2, camera, cfg, settings, bg=bg,
                           reso_lvl=reso_lvl, fade_size=fade_size,
                           means2d_probe=probe)
        l1 = l1_loss(out.image, gt_image)
        loss = ((1.0 - lambda_dssim) * l1
                + lambda_dssim * (1.0 - ssim(out.image, gt_image)))
        return loss * loss_mult, (out, l1)

    (loss, (out, l1)), (grads, probe_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(st.params(), probe)

    lrs = group_lrs(op, spatial_lr_scale, state.iteration,
                    ms_lr_active=ms_lr_active)
    new_params, new_adam = adam_update(st.params(), grads, state.adam, lrs)
    st = st.with_params(new_params)

    # Side-state updates (train.py:239-250), gated by traced bools.
    vis = out.visible
    px = jnp.where(jnp.asarray(do_px_update), out.pixel_sizes, 0.0)
    st = G.update_pixel_sizes(st, px, reso_lvl, cfg.reso_lvls)

    ds = jnp.asarray(do_densify_stats)
    st = G.update_max_radii(st, out.radii, vis & ds)
    st = G.add_densification_stats(st, probe_grad * ds, vis & ds, reso_lvl)

    # preserve_large: record coarsest-level visibility into base_mask
    # (reference train.py:239-241 — the host passes do_base_mask=True iff
    # --preserve_large, past densify_until, at the coarsest level).
    st = G.update_base_mask(st, vis & jnp.asarray(do_base_mask))

    # Overflow safety: a step whose binning truncated entries rendered (and
    # differentiated) a wrong image — discard every update it produced so the
    # host can grow entry_cap and never trains on a truncated render. The
    # iteration counter still advances (the host loop drives it).
    ok = out.overflow == 0

    def keep(new, old):
        return jnp.where(ok, new, old)

    st = jax.tree_util.tree_map(keep, st, state.gaussians)
    new_adam = jax.tree_util.tree_map(keep, new_adam, state.adam)

    new_state = TrainState(gaussians=st, adam=new_adam,
                           iteration=state.iteration + 1)
    metrics = {
        "loss": loss, "l1": l1,
        "num_entries": out.num_entries, "overflow": out.overflow,
        "num_live": st.num_live,
    }
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("op", "scene_extent",
                                             "max_screen_size"))
def densify_step(state: TrainState, key, *, op: OptimParams,
                 scene_extent: float, max_screen_size: float) -> TrainState:
    st, touched = G.densify_and_prune(
        state.gaussians, key,
        grad_threshold=op.densify_grad_threshold,
        min_opacity=0.005,
        scene_extent=scene_extent,
        max_screen_size=max_screen_size,
        percent_dense=op.percent_dense)
    return state._replace(gaussians=st,
                          adam=zero_moments_at(state.adam, touched))


@functools.partial(jax.jit, static_argnames=("op",))
def grow_step(state: TrainState, lvl, *, op: OptimParams) -> TrainState:
    st, touched = G.grow_large_gaussians(
        state.gaussians, lvl, grad_threshold=op.densify_grad_threshold)
    return state._replace(gaussians=st,
                          adam=zero_moments_at(state.adam, touched))


@jax.jit
def reset_opacity_step(state: TrainState) -> TrainState:
    st, touched = G.reset_opacity(state.gaussians)
    # The reference swaps the opacity tensor in the optimizer, zeroing its
    # moments (replace_tensor_to_optimizer, gaussian_model.py:419-432) —
    # here: zero only the opacity group's moments at touched rows.
    adam = state.adam
    m = touched[:, None]
    adam = adam._replace(
        mu={**adam.mu, "opacity": jnp.where(m, 0.0, adam.mu["opacity"])},
        nu={**adam.nu, "opacity": jnp.where(m, 0.0, adam.nu["opacity"])})
    return state._replace(gaussians=st, adam=adam)


@functools.partial(jax.jit, static_argnames=("voxel_reso", "scene_extent"))
def insert_large_step(state: TrainState, mask, cur_min_pixel_sizes, lvl, *,
                      scene_extent: float, voxel_reso: float
                      ) -> Tuple[TrainState, jnp.ndarray]:
    st, touched, n_ins = insert_large_gaussians(
        state.gaussians, mask, cur_min_pixel_sizes, lvl, scene_extent,
        voxel_reso)
    return (state._replace(gaussians=st,
                           adam=zero_moments_at(state.adam, touched)),
            n_ins)


@functools.partial(
    jax.jit, static_argnames=("cfg", "settings", "reso_lvl", "fade_size",
                              "scale_modifier"))
def eval_render(state: TrainState, camera, *, cfg: GaussianConfig,
                settings: RasterSettings, reso_lvl: int = 0,
                fade_size: float = 0.0, bg=None,
                scale_modifier: float = 1.0) -> RenderOutput:
    return render_state(state.gaussians, camera, cfg, settings, bg=bg,
                        reso_lvl=reso_lvl, fade_size=fade_size,
                        scale_modifier=scale_modifier)
