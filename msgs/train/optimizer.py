"""Per-group Adam optimizer over the GaussianState parameter dict.

Mirrors the reference's 8-named-group torch.optim.Adam with eps=1e-15
(gaussian_model.py:236-252): fixed LRs per group (f_rest = feature_lr/20,
occ/dc start at 0 until `start_ms_lr`), and the xyz group on a log-lerp
exponential decay scaled by `spatial_lr_scale` (= scene extent), replicating
get_expon_lr_func (general_utils.py:29-62). The whole thing is one
jit-friendly optax chain; structural-mutation support is `zero_moments_at`
(the functional equivalent of the reference's optimizer-state surgery).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class OptimParams(NamedTuple):
    """Hashable mirror of the reference OptimizationParams
    (arguments/__init__.py:71-89) + MS extras."""
    iterations: int = 30_000
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_steps: int = 0
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 2e-4


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-lerp exponential decay with optional sine warm-up delay
    (general_utils.py:29-62)."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return delay_rate * log_lerp


def group_lrs(op: OptimParams, spatial_lr_scale: float, step,
              ms_lr_active=False):
    """Current per-group learning rates; `ms_lr_active` enables the occ/dc
    groups (start_ms_lr, gaussian_model.py:270-283)."""
    ms = jnp.asarray(ms_lr_active, jnp.float32)
    return {
        "xyz": expon_lr(step,
                        op.position_lr_init * spatial_lr_scale,
                        op.position_lr_final * spatial_lr_scale,
                        op.position_lr_delay_steps,
                        op.position_lr_delay_mult,
                        op.position_lr_max_steps),
        "features_dc": jnp.float32(op.feature_lr),
        "features_rest": jnp.float32(op.feature_lr / 20.0),
        "opacity": jnp.float32(op.opacity_lr),
        "scaling": jnp.float32(op.scaling_lr),
        "rotation": jnp.float32(op.rotation_lr),
        "occ_multiplier": ms * op.opacity_lr,
        "dc_delta": ms * op.feature_lr * 0.1,
    }


class AdamState(NamedTuple):
    mu: dict
    nu: dict
    count: jnp.ndarray


def init_adam(params: dict) -> AdamState:
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=z, nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(params: dict, grads: dict, state: AdamState, lrs: dict,
                b1=0.9, b2=0.999, eps=1e-15):
    """One Adam step with per-group LRs (torch.optim.Adam semantics,
    eps inside the sqrt denominator add)."""
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** c
    bc2 = 1.0 - b2 ** c
    new_mu, new_nu, new_p = {}, {}, {}
    for k in params:
        g = grads[k]
        mu = b1 * state.mu[k] + (1 - b1) * g
        nu = b2 * state.nu[k] + (1 - b2) * g * g
        update = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        new_p[k] = params[k] - lrs[k] * update
        new_mu[k], new_nu[k] = mu, nu
    return new_p, AdamState(mu=new_mu, nu=new_nu, count=count)


def zero_moments_at(state: AdamState, touched: jnp.ndarray) -> AdamState:
    """Zero Adam moments of rows whose content was structurally replaced —
    the functional analogue of cat_tensors_to_optimizer /
    replace_tensor_to_optimizer (gaussian_model.py:419-537)."""
    def z(a):
        m = touched.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(m, 0.0, a)
    return AdamState(mu=jax.tree_util.tree_map(z, state.mu),
                     nu=jax.tree_util.tree_map(z, state.nu),
                     count=state.count)
