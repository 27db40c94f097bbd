"""Fixed-capacity functional Gaussian model state.

TPU-first redesign of the reference `GaussianModel`
(scene/gaussian_model.py:50-877, SURVEY.md §2.2): instead of reallocating
parameter tensors and performing optimizer-state surgery on every
densify/prune, state lives in capacity-`C` arrays with a `live` mask. All
structural mutations (clone, split, prune, grow, insert) are pure
state→state functions built from masks, ranked free-slot allocation
(`jnp.nonzero(..., size=...)`) and scatters — fully jit-compatible with
static shapes. The optimizer (optax Adam) sees the same capacity arrays;
moments of touched rows are zeroed via the returned `touched` mask
(equivalent to the reference's cat/prune optimizer rewrites at
gaussian_model.py:419-537).

Parameter storage conventions (activations applied at render time, matching
gaussian_model.py:127-183):
  scaling   — log-space (activation exp)
  rotation  — unnormalized quaternion wxyz (activation L2-normalize)
  opacity   — logit (activation sigmoid)
  occ_multiplier — logit if multi_occ else raw-1.0 (gaussian_model.py:205-208)
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msgs.core.sh import num_sh_coeffs, rgb2sh
from msgs.core.transforms import inverse_sigmoid
from msgs.kernels.knn import knn_mean_sq_dist

N_APP_LEVELS = 4   # occ/dc appearance buckets (scales 2/4/8/16)


class GaussianConfig(NamedTuple):
    """Static model configuration (hashable)."""
    sh_degree: int = 3
    reso_lvls: int = 1
    multi_occ: bool = False
    multi_dc: bool = False
    capacity: int = 1 << 20


class GaussianState(NamedTuple):
    # --- learnable parameters (raw storage) ---
    xyz: jnp.ndarray            # (C, 3)
    features_dc: jnp.ndarray    # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, K-1, 3)
    scaling: jnp.ndarray        # (C, 3) log
    rotation: jnp.ndarray       # (C, 4) wxyz
    opacity: jnp.ndarray        # (C, 1) logit
    occ_multiplier: jnp.ndarray # (C, 4)
    dc_delta: jnp.ndarray       # (C, 4, 3)
    # --- per-Gaussian side state ---
    live: jnp.ndarray           # (C,) bool
    max_radii2d: jnp.ndarray    # (C,) f32
    max_pixel_sizes: jnp.ndarray  # (C,) f32, -1 = uninitialized
    min_pixel_sizes: jnp.ndarray  # (C,) f32, -1 = uninitialized
    base_mask: jnp.ndarray      # (C,) bool — visible at coarsest level
    target_reso_lvl: jnp.ndarray  # (C,) int32
    xyz_grad_accum: jnp.ndarray  # (C, L) per-level densification stats
    denom: jnp.ndarray          # (C, L)
    # --- scalars ---
    active_sh_degree: jnp.ndarray  # () int32

    @property
    def num_live(self):
        return jnp.sum(self.live.astype(jnp.int32))

    def params(self):
        """The optax-optimized leaves, as a dict pytree."""
        return {
            "xyz": self.xyz,
            "features_dc": self.features_dc,
            "features_rest": self.features_rest,
            "scaling": self.scaling,
            "rotation": self.rotation,
            "opacity": self.opacity,
            "occ_multiplier": self.occ_multiplier,
            "dc_delta": self.dc_delta,
        }

    def with_params(self, p) -> "GaussianState":
        return self._replace(**p)

    # --- activations ---
    def act_scales(self, modifier: float = 1.0):
        return jnp.exp(self.scaling) * modifier

    def act_rotation(self):
        return self.rotation / (jnp.linalg.norm(
            self.rotation, axis=-1, keepdims=True) + 1e-12)

    def act_opacity(self):
        return jax.nn.sigmoid(self.opacity)[:, 0]

    def act_occ(self, multi_occ: bool):
        if multi_occ:
            return jax.nn.sigmoid(self.occ_multiplier)
        return jnp.ones_like(self.occ_multiplier)

    def shs(self):
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)


def empty_state(cfg: GaussianConfig) -> GaussianState:
    C, L = cfg.capacity, cfg.reso_lvls
    K = num_sh_coeffs(cfg.sh_degree)
    occ_init = inverse_sigmoid(jnp.float32(0.99)) if cfg.multi_occ else 1.0
    return GaussianState(
        xyz=jnp.zeros((C, 3), jnp.float32),
        features_dc=jnp.zeros((C, 1, 3), jnp.float32),
        features_rest=jnp.zeros((C, K - 1, 3), jnp.float32),
        scaling=jnp.full((C, 3), -10.0, jnp.float32),
        rotation=jnp.zeros((C, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.zeros((C, 1), jnp.float32),
        occ_multiplier=jnp.full((C, N_APP_LEVELS), occ_init, jnp.float32),
        dc_delta=jnp.zeros((C, N_APP_LEVELS, 3), jnp.float32),
        live=jnp.zeros((C,), bool),
        max_radii2d=jnp.zeros((C,), jnp.float32),
        max_pixel_sizes=jnp.full((C,), -1.0, jnp.float32),
        min_pixel_sizes=jnp.full((C,), -1.0, jnp.float32),
        base_mask=jnp.zeros((C,), bool),
        target_reso_lvl=jnp.zeros((C,), jnp.int32),
        xyz_grad_accum=jnp.zeros((C, L), jnp.float32),
        denom=jnp.zeros((C, L), jnp.float32),
        active_sh_degree=jnp.int32(0),
    )


def create_from_points(cfg: GaussianConfig, points: np.ndarray,
                       colors: np.ndarray) -> GaussianState:
    """Initialize from an SfM point cloud (reference create_from_pcd,
    gaussian_model.py:189-227): color → SH DC, scale from 3-NN mean squared
    distance, identity rotation, opacity logit(0.1)."""
    st = empty_state(cfg)
    n = points.shape[0]
    if n > cfg.capacity:
        raise ValueError(f"{n} points exceed capacity {cfg.capacity}")
    pts = jnp.asarray(points, jnp.float32)
    d2 = jnp.clip(knn_mean_sq_dist(pts, k=3), 1e-7, None)
    scales = jnp.log(jnp.sqrt(d2))[:, None].repeat(3, axis=1)
    st = st._replace(
        xyz=st.xyz.at[:n].set(pts),
        features_dc=st.features_dc.at[:n, 0].set(
            rgb2sh(jnp.asarray(colors, jnp.float32))),
        scaling=st.scaling.at[:n].set(scales),
        opacity=st.opacity.at[:n].set(
            inverse_sigmoid(jnp.float32(0.1))),
        live=st.live.at[:n].set(True),
    )
    return st


def one_up_sh_degree(st: GaussianState, max_degree: int) -> GaussianState:
    return st._replace(active_sh_degree=jnp.minimum(
        st.active_sh_degree + 1, max_degree))


# ---------------------------------------------------------------------------
# Structural mutations
# ---------------------------------------------------------------------------

def _alloc_slots(live: jnp.ndarray, want_mask: jnp.ndarray,
                 copies: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign `copies` free slots to each row selected by want_mask.

    Returns (slots (C, copies) int32 — destination row per (source, copy),
    C = dropped — and ok (C,) bool — candidate actually got its slots).
    Candidates beyond free capacity are dropped deterministically (by row
    order), mirroring the reference's behavior of just growing (we can't).
    """
    C = live.shape[0]
    free = jnp.nonzero(~live, size=C, fill_value=C)[0]        # (C,)
    n_free = jnp.sum(~live)
    rank = jnp.cumsum(want_mask.astype(jnp.int32)) - 1        # rank per cand
    ok = want_mask & ((rank + 1) * copies <= n_free)
    base = rank * copies
    slots = jnp.stack(
        [jnp.where(ok, free[jnp.clip(base + i, 0, C - 1)], C)
         for i in range(copies)], axis=1)
    return slots, ok


def _scatter_rows(dst, src_idx, dst_idx):
    """dst[dst_idx[i]] = dst-source rows src_idx[i], dropping dst_idx == C."""
    return dst.at[dst_idx].set(dst[src_idx], mode="drop")


def _copy_selected(st: GaussianState, src_mask: jnp.ndarray,
                   slots: jnp.ndarray, copy: int) -> GaussianState:
    """Copy every field of rows in src_mask to their allocated slot."""
    C = st.live.shape[0]
    src = jnp.arange(C)
    dst = slots[:, copy]

    def cp(arr):
        return arr.at[dst].set(arr[src], mode="drop")

    return st._replace(
        xyz=cp(st.xyz), features_dc=cp(st.features_dc),
        features_rest=cp(st.features_rest), scaling=cp(st.scaling),
        rotation=cp(st.rotation), opacity=cp(st.opacity),
        occ_multiplier=cp(st.occ_multiplier), dc_delta=cp(st.dc_delta),
        max_radii2d=cp(st.max_radii2d),
        max_pixel_sizes=cp(st.max_pixel_sizes),
        min_pixel_sizes=cp(st.min_pixel_sizes),
        base_mask=st.base_mask.at[dst].set(False, mode="drop"),
        target_reso_lvl=cp(st.target_reso_lvl),
        xyz_grad_accum=st.xyz_grad_accum.at[dst].set(0.0, mode="drop"),
        denom=st.denom.at[dst].set(0.0, mode="drop"),
        live=st.live.at[dst].set(True, mode="drop"),
    )


def add_densification_stats(st: GaussianState, probe_grad: jnp.ndarray,
                            update_mask: jnp.ndarray, lvl) -> GaussianState:
    """Accumulate screen-space gradient norms per level
    (gaussian_model.py:698-705)."""
    norms = jnp.linalg.norm(probe_grad[:, :2], axis=1)
    m = update_mask & st.live
    lvl_oh = jax.nn.one_hot(lvl, st.denom.shape[1], dtype=jnp.float32)
    return st._replace(
        xyz_grad_accum=st.xyz_grad_accum
        + (m * norms)[:, None] * lvl_oh[None, :],
        denom=st.denom + m.astype(jnp.float32)[:, None] * lvl_oh[None, :],
    )


def update_max_radii(st: GaussianState, radii, visible) -> GaussianState:
    return st._replace(max_radii2d=jnp.where(
        visible & st.live, jnp.maximum(st.max_radii2d, radii.astype(jnp.float32)),
        st.max_radii2d))


def densify_clone(st: GaussianState, grads, grad_threshold, percent_dense,
                  scene_extent) -> Tuple[GaussianState, jnp.ndarray]:
    """Clone small under-reconstructed Gaussians
    (gaussian_model.py:576-597). Acts on level-0 rows only (599-605).
    Returns (state, touched mask — rows whose Adam moments must be zeroed)."""
    small = jnp.max(st.act_scales(), axis=1) <= percent_dense * scene_extent
    cand = (st.live & (grads >= grad_threshold) & small
            & (st.target_reso_lvl == 0))
    slots, ok = _alloc_slots(st.live, cand, copies=1)
    st = _copy_selected(st, cand, slots, 0)
    touched = jnp.zeros_like(st.live).at[slots[:, 0]].set(True, mode="drop")
    return st, touched


def densify_split(st: GaussianState, grads, grad_threshold, percent_dense,
                  scene_extent, key) -> Tuple[GaussianState, jnp.ndarray]:
    """Split large over-reconstructed Gaussians into 2 children sampled from
    the parent distribution; child scale ÷ 1.6; parent pruned
    (gaussian_model.py:539-574). Child pixel sizes ÷ 1.6 (561-562)."""
    from msgs.core.transforms import quat_to_rotmat
    n_split = 2
    big = jnp.max(st.act_scales(), axis=1) > percent_dense * scene_extent
    cand = (st.live & (grads >= grad_threshold) & big
            & (st.target_reso_lvl == 0))
    slots, ok = _alloc_slots(st.live, cand, copies=n_split)

    C = st.live.shape[0]
    scales = st.act_scales()
    R = quat_to_rotmat(st.act_rotation())
    touched = jnp.zeros_like(st.live)
    for i in range(n_split):
        st = _copy_selected(st, cand, slots, i)
        noise = jax.random.normal(jax.random.fold_in(key, i), (C, 3)) * scales
        offset = jnp.einsum("nij,nj->ni", R, noise)
        dst = slots[:, i]
        st = st._replace(
            xyz=st.xyz.at[dst].set(st.xyz[jnp.arange(C)] + offset,
                                   mode="drop"),
            scaling=st.scaling.at[dst].set(
                jnp.log(scales / (0.8 * n_split)), mode="drop"),
            max_pixel_sizes=st.max_pixel_sizes.at[dst].set(
                jnp.where(st.max_pixel_sizes >= 0,
                          st.max_pixel_sizes / (0.8 * n_split),
                          st.max_pixel_sizes), mode="drop"),
            min_pixel_sizes=st.min_pixel_sizes.at[dst].set(
                jnp.where(st.min_pixel_sizes >= 0,
                          st.min_pixel_sizes / (0.8 * n_split),
                          st.min_pixel_sizes), mode="drop"),
        )
        touched = touched.at[dst].set(True, mode="drop")
    # Prune split parents.
    st = st._replace(live=st.live & ~ok)
    return st, touched


def prune(st: GaussianState, prune_mask: jnp.ndarray) -> GaussianState:
    return st._replace(live=st.live & ~prune_mask)


def densify_and_prune(st: GaussianState, key, *, grad_threshold: float,
                      min_opacity: float, scene_extent: float,
                      max_screen_size: float, percent_dense: float
                      ) -> Tuple[GaussianState, jnp.ndarray]:
    """Full level-0 densify + prune pass (gaussian_model.py:599-625):
    clone, split, prune by opacity / screen size / world size; clears
    level-0 grad stats. Returns (state, touched)."""
    grads = st.xyz_grad_accum[:, 0] / jnp.maximum(st.denom[:, 0], 1.0)
    grads = jnp.where((st.denom[:, 0] > 0) & (st.target_reso_lvl == 0),
                      grads, 0.0)

    st, touched_c = densify_clone(st, grads, grad_threshold, percent_dense,
                                  scene_extent)
    st, touched_s = densify_split(st, grads, grad_threshold, percent_dense,
                                  scene_extent, key)

    prune_mask = st.act_opacity() < min_opacity
    lvl0 = st.target_reso_lvl == 0
    if max_screen_size > 0:
        big_screen = st.max_radii2d > max_screen_size
        big_world = jnp.max(st.act_scales(), axis=1) > 0.1 * scene_extent
        prune_mask = prune_mask | big_screen | big_world
    # The whole prune — the opacity term included — applies to level-0 rows
    # only ("do not prune gaussians from other lvls at all",
    # gaussian_model.py:616-621): inserted coarse aggregates are created at
    # pooled/half opacity and must not be deleted here.
    st = prune(st, prune_mask & lvl0 & st.live)

    # Clear level-0 accumulators and reset ALL max screen radii
    # (densification_postfix, gaussian_model.py:520-526 — max_radii2D only
    # ever accumulates between densify calls; without the reset the >20 px
    # screen-size prune eventually fires on the whole scene).
    st = st._replace(
        xyz_grad_accum=st.xyz_grad_accum.at[:, 0].set(0.0),
        denom=st.denom.at[:, 0].set(0.0),
        max_radii2d=jnp.zeros_like(st.max_radii2d),
    )
    return st, touched_c | touched_s


def grow_large_gaussians(st: GaussianState, lvl, *, grad_threshold: float,
                         key=None) -> Tuple[GaussianState, jnp.ndarray]:
    """Per-level creation of 2× larger, ½-opacity copies tagged to that level
    (gaussian_model.py:627-661; `--grow_large`)."""
    grads = st.xyz_grad_accum[:, lvl] / jnp.maximum(st.denom[:, lvl], 1.0)
    grads = jnp.where(st.denom[:, lvl] > 0, grads, 0.0)
    cand = st.live & (grads >= grad_threshold)
    slots, ok = _alloc_slots(st.live, cand, copies=1)
    st = _copy_selected(st, cand, slots, 0)
    dst = slots[:, 0]
    C = st.live.shape[0]
    half_op = inverse_sigmoid(jnp.clip(st.act_opacity() * 0.5, 1e-4, 1 - 1e-4))
    st = st._replace(
        scaling=st.scaling.at[dst].set(st.scaling[jnp.arange(C)] + jnp.log(2.0),
                                       mode="drop"),
        opacity=st.opacity.at[dst].set(half_op[:, None], mode="drop"),
        target_reso_lvl=st.target_reso_lvl.at[dst].set(
            jnp.full((C,), lvl, jnp.int32), mode="drop"),
        # Seed the grown rows' footprint records at the parent's ×2 (the 2×
        # scale doubles the screen extent — reference grow_large_gaussians
        # initializes new_max/min_pixel_sizes = parent*2); a −1 reset would
        # leave filter_large inapplicable until stats re-accumulate.
        max_pixel_sizes=st.max_pixel_sizes.at[dst].set(
            jnp.where(st.max_pixel_sizes >= 0,
                      st.max_pixel_sizes * 2.0, -1.0), mode="drop"),
        min_pixel_sizes=st.min_pixel_sizes.at[dst].set(
            jnp.where(st.min_pixel_sizes >= 0,
                      st.min_pixel_sizes * 2.0, -1.0), mode="drop"),
        xyz_grad_accum=st.xyz_grad_accum.at[:, lvl].set(0.0),
        denom=st.denom.at[:, lvl].set(0.0),
        max_radii2d=jnp.zeros_like(st.max_radii2d),
    )
    touched = jnp.zeros_like(st.live).at[dst].set(True, mode="drop")
    return st, touched


def reset_opacity(st: GaussianState) -> Tuple[GaussianState, jnp.ndarray]:
    """Clamp opacity to ≤ 0.01 — level-0 rows only
    (gaussian_model.py:346-356). Returns (state, touched)."""
    lvl0 = (st.target_reso_lvl == 0) & st.live
    new_op = jnp.minimum(st.opacity,
                         inverse_sigmoid(jnp.float32(0.01)))
    return st._replace(
        opacity=jnp.where(lvl0[:, None], new_op, st.opacity)), lvl0


def update_pixel_sizes(st: GaussianState, pixel_sizes, lvl,
                       reso_lvls: int) -> GaussianState:
    """Running screen-footprint extrema (gaussian_model.py:663-686).

    Crucially, stats update only for Gaussians whose *own* target level is
    the rendered level (the reference's mask at line 664): the records mean
    "this row's footprint at its home resolution", not a cross-scale extreme.
    Max side decays ×0.95 then max-in (renders at lvl>0 only); min side
    inflates ×1.05 then min-in (renders at lvl<L−1 only); uninitialized (−1)
    rows adopt the first observed value."""
    seen = (pixel_sizes > 0) & st.live & (st.target_reso_lvl == lvl)
    upd_max = seen & (lvl > 0)
    decayed = jnp.where(st.max_pixel_sizes >= 0,
                        st.max_pixel_sizes * 0.95, st.max_pixel_sizes)
    new_max = jnp.where(
        upd_max,
        jnp.where(decayed >= 0, jnp.maximum(decayed, pixel_sizes),
                  pixel_sizes),
        st.max_pixel_sizes)

    upd_min = seen & (lvl < reso_lvls - 1)
    inflated = jnp.where(st.min_pixel_sizes >= 0,
                         st.min_pixel_sizes * 1.05, st.min_pixel_sizes)
    new_min = jnp.where(
        upd_min,
        jnp.where(inflated >= 0, jnp.minimum(inflated, pixel_sizes),
                  pixel_sizes),
        st.min_pixel_sizes)
    return st._replace(max_pixel_sizes=new_max, min_pixel_sizes=new_min)


def update_base_mask(st: GaussianState, visible) -> GaussianState:
    """Record coarsest-level visibility (preserve_large, train.py:239-241)."""
    return st._replace(base_mask=st.base_mask | (visible & st.live))


def prune_small_points(st: GaussianState):
    """Surface-parity stub: the reference's prune_small_points raises
    NotImplementedError at its first line (gaussian_model.py:688-696) and the
    --prune_small path is therefore dead there too."""
    raise NotImplementedError(
        "prune_small_points is unimplemented in the reference (gaussian_"
        "model.py:689) and intentionally mirrored as such here")


def filter_center(st: GaussianState, center, radius) -> GaussianState:
    """Radial crop for visualization (gaussian_model.py:850-877, used by the
    trajectory renderer): keep only Gaussians within `radius` of `center`."""
    d = jnp.linalg.norm(st.xyz - jnp.asarray(center)[None, :], axis=1)
    return st._replace(live=st.live & (d <= radius))
