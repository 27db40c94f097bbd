"""Per-Gaussian preprocessing: projection, EWA 2D covariance, SH color,
multi-scale splat selection.

Pure vectorized jnp — XLA fuses the whole thing into a handful of kernels and
autodiff gives the backward for free. Functionally equivalent to the
`preprocess` stage of the reference CUDA rasterizer (reconstructed in
SURVEY.md §2.3: frustum cull, perspective projection, EWA Jacobian, +0.3 px
low-pass, conic/radius, 16×16 tile counting, SH eval), extended with the MS-GS
scale-aware selection (filter_small / filter_large / fade, SURVEY.md §2.3)
expressed as a smooth opacity weight so it is differentiable where faded.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from msgs.core.camera import Camera
from msgs.core.sh import eval_sh


TILE = 16
NEAR_CULL = 0.2           # view-space z culling threshold (reference CUDA: 0.2)
LOWPASS = 0.3             # screen-space dilation added to cov2d diagonal
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
N_APP_LEVELS = 4          # occ_multiplier / dc_delta level buckets (scales 2/4/8/16)


def _build_cov6(scales, quats, modifier):
    """Packed symmetric 3-D covariance (xx, xy, xz, yy, yz, zz) from scales
    and quaternions, componentwise (see _ewa_project's precision note).
    Matches build_covariance_from_scaling_rotation (gaussian_model.py:32-37,
    general_utils.py:78-110): Σ = R diag((m·s)²) Rᵀ."""
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = (modifier * scales[:, 0]) ** 2
    s1 = (modifier * scales[:, 1]) ** 2
    s2 = (modifier * scales[:, 2]) ** 2
    sxx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    sxy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    sxz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    syy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    syz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    szz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return jnp.stack([sxx, sxy, sxz, syy, syz, szz], axis=1)


class PreprocessOut(NamedTuple):
    means2d: jnp.ndarray      # (N, 2) pixel coords
    depths: jnp.ndarray       # (N,)  view-space z
    conics: jnp.ndarray       # (N, 3) inverse 2D covariance (xx, xy, yy)
    colors: jnp.ndarray       # (N, 3) RGB after SH + clamp
    opacities: jnp.ndarray    # (N,)  effective opacity (after MS weights)
    radii: jnp.ndarray        # (N,)  int32 screen radius, 0 if culled
    pixel_sizes: jnp.ndarray  # (N,)  current footprint in pixels (2σ diameter)
    rect_min: jnp.ndarray     # (N, 2) int32 inclusive tile bounds (x, y)
    rect_max: jnp.ndarray     # (N, 2) int32 exclusive tile bounds (x, y)
    visible: jnp.ndarray      # (N,)  bool — survives culling + MS selection


def _ewa_project(cov6, means3d, world_view_t, tanfovx, tanfovy, focal_x, focal_y):
    """EWA splatting: project 3D covariance to screen-space 2D covariance.

    world_view_t is the transposed world→view matrix (row-vector convention),
    so the view rotation is world_view_t[:3, :3].T. cov6 is the packed
    symmetric 3-D covariance (xx, xy, xz, yy, yz, zz).

    Written componentwise ((N,) vector arithmetic, no batched 3×3 matmuls):
    under the f32-precision default, XLA's tiny-batched matmuls run 6-pass
    on the MXU and dominated the preprocess fwd+bwd cost; elementwise VPU
    math is exact f32 and an order of magnitude cheaper here.

    Rows with view-space z below the near-cull plane get a safe unit depth:
    they are culled downstream, but without the guard their 1/z produces
    inf/NaN intermediates whose zero-cotangent backward turns into NaN
    gradients (0·NaN) at dead/culled rows.
    """
    W = world_view_t[:3, :3].T                      # (3,3) view rotation
    t = means3d @ world_view_t[:3, :3] + world_view_t[3, :3]  # view-space pos

    # Clamp the view ray to the frustum edge before building the Jacobian
    # (mirrors the reference kernel's 1.3·tanfov clamp).
    tz_real = t[:, 2]
    tz = jnp.where(tz_real >= NEAR_CULL, tz_real, 1.0)
    lim_x = 1.3 * tanfovx
    lim_y = 1.3 * tanfovy
    txz = jnp.clip(t[:, 0] / tz, -lim_x, lim_x) * tz
    tyz = jnp.clip(t[:, 1] / tz, -lim_y, lim_y) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx·x/z²], [0, fy/z, -fy·y/z²]
    j00 = focal_x * inv_z
    j02 = -focal_x * txz * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * tyz * inv_z2

    # M = J @ W, rows m0/m1 as per-component (N,) vectors.
    m00 = j00 * W[0, 0] + j02 * W[2, 0]
    m01 = j00 * W[0, 1] + j02 * W[2, 1]
    m02 = j00 * W[0, 2] + j02 * W[2, 2]
    m10 = j11 * W[1, 0] + j12 * W[2, 0]
    m11 = j11 * W[1, 1] + j12 * W[2, 1]
    m12 = j11 * W[1, 2] + j12 * W[2, 2]

    sxx, sxy, sxz, syy, syz, szz = (cov6[:, 0], cov6[:, 1], cov6[:, 2],
                                    cov6[:, 3], cov6[:, 4], cov6[:, 5])

    # cov2d = M Σ Mᵀ, expanded: first v_i = Σ · m_i.
    v0x = sxx * m00 + sxy * m01 + sxz * m02
    v0y = sxy * m00 + syy * m01 + syz * m02
    v0z = sxz * m00 + syz * m01 + szz * m02
    v1x = sxx * m10 + sxy * m11 + sxz * m12
    v1y = sxy * m10 + syy * m11 + syz * m12
    v1z = sxz * m10 + syz * m11 + szz * m12
    cxx0 = m00 * v0x + m01 * v0y + m02 * v0z
    cxy = m00 * v1x + m01 * v1y + m02 * v1z
    cyy0 = m10 * v1x + m11 * v1y + m12 * v1z

    # Return both the raw and low-pass-dilated covariance: rendering uses the
    # dilated one (the reference's +0.3 px anti-collapse filter), but the
    # MS pixel-size statistic must come from the *undilated* footprint — the
    # dilation floors 2·sqrt(λ) at ~1.1 px, which would make the sub-pixel
    # tests of filter_small and insert-large selection unsatisfiable.
    return cxx0 + LOWPASS, cxy, cyy0 + LOWPASS, cxx0, cyy0, t


def _fade01(x):
    return jnp.clip(x, 0.0, 1.0)


def preprocess(
    camera: Camera,
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    *,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    scales: Optional[jnp.ndarray] = None,
    quats: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    active_sh_degree=3,
    scale_modifier: float = 1.0,
    live_mask: Optional[jnp.ndarray] = None,
    means2d_probe: Optional[jnp.ndarray] = None,
    # --- MS-GS extensions ---
    filter_small: bool = False,
    filter_large: bool = False,
    fade_ungated: bool = False,
    fade_size: float = 0.0,
    max_pixel_sizes: Optional[jnp.ndarray] = None,
    min_pixel_sizes: Optional[jnp.ndarray] = None,
    base_mask: Optional[jnp.ndarray] = None,
    occ_multiplier: Optional[jnp.ndarray] = None,   # (N, 4) in (0,1]
    dc_delta: Optional[jnp.ndarray] = None,          # (N, 4, 3)
    reso_lvl: int = 0,
) -> PreprocessOut:
    """Project Gaussians to screen and build compositor inputs.

    Mirrors the contract of the reference rasterizer's per-Gaussian stage
    (gaussian_renderer/__init__.py:37-108 call signature); the MS selection
    semantics are the SURVEY.md §2.3 reconstruction:

    - `pixel_size` p = 2·sqrt(λ_max(cov2d)) — current screen footprint.
    - filter_small: a Gaussian known to be well-resolved at a finer scale
      (recorded max_pixel_sizes ≥ 1) is faded out when its current footprint
      p drops sub-pixel; `fade_size` widens the hard cutoff into a linear ramp.
    - filter_large: a Gaussian whose recorded min footprint is min_rec fades
      out once p exceeds 2·max(min_rec, 1) — coarse aggregates retire at finer
      resolutions; `base_mask=True` rows are exempt (preserve_large).
    - occ_multiplier / dc_delta: per-level appearance deltas selected by the
      render's level bucket (4 buckets for scales 2/4/8/16).
    """
    N = means3d.shape[0]
    H, W_img = camera.height, camera.width

    if cov3d_precomp is not None:
        cov6 = cov3d_precomp
    else:
        cov6 = _build_cov6(scales, quats, scale_modifier)

    # Projection (row-vector convention: p_row @ M_T).
    hom = jnp.concatenate([means3d, jnp.ones((N, 1), means3d.dtype)], axis=1)
    p_hom = hom @ camera.full_proj
    # w ≈ view-space z; rows behind the near plane are culled downstream but
    # need a safe divisor so 0·NaN doesn't poison gradients of dead rows.
    denom = jnp.where(p_hom[:, 3] >= NEAR_CULL, p_hom[:, 3] + 1e-7, 1.0)
    p_w = 1.0 / denom
    ndc = p_hom[:, :3] * p_w[:, None]
    if means2d_probe is not None:
        # Densification gradient probe: zeros added in NDC so its gradient is
        # the reference-convention screen-space gradient (train.py:249-250).
        ndc = ndc.at[:, :2].add(means2d_probe)
    mean_px = jnp.stack(
        [((ndc[:, 0] + 1.0) * W_img - 1.0) * 0.5,
         ((ndc[:, 1] + 1.0) * H - 1.0) * 0.5], axis=1)

    focal_x = W_img / (2.0 * camera.tanfovx)
    focal_y = H / (2.0 * camera.tanfovy)
    cxx, cxy, cyy, cxx0, cyy0, t_view = _ewa_project(
        cov6, means3d, camera.world_view, camera.tanfovx, camera.tanfovy,
        focal_x, focal_y)
    depths = t_view[:, 2]

    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(det > 0, det, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=1)

    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam_max = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    # Footprint statistic from the undilated covariance (see _ewa_project).
    # Positive floors keep sqrt gradients finite at degenerate/dead rows
    # (d√x at 0 is ∞, and 0·∞ = NaN through the zero cotangents).
    det0 = cxx0 * cyy0 - cxy * cxy
    mid0 = 0.5 * (cxx0 + cyy0)
    disc0 = jnp.sqrt(jnp.maximum(mid0 * mid0 - det0, 1e-8))
    pixel_size = 2.0 * jnp.sqrt(jnp.maximum(mid0 + disc0, 1e-8))

    visible = (depths > NEAR_CULL) & (det > 0)
    if live_mask is not None:
        visible = visible & live_mask

    # Color.
    if colors_precomp is not None:
        colors = colors_precomp
    else:
        sh = shs
        if dc_delta is not None and reso_lvl >= 1:
            bucket = min(max(int(reso_lvl) - 1, 0), N_APP_LEVELS - 1)
            sh = sh.at[:, 0, :].add(dc_delta[:, bucket, :])
        dirs = means3d - camera.cam_center[None, :]
        # eps inside the sqrt: norm's gradient at 0 is NaN, which would
        # poison dead-row xyz gradients through the zero cotangent.
        dirs = dirs / jnp.sqrt(
            jnp.sum(dirs * dirs, axis=1, keepdims=True) + 1e-12)
        colors = jnp.maximum(eval_sh(sh, dirs, active_sh_degree) + 0.5, 0.0)

    # Effective opacity: MS selection weights fold in multiplicatively.
    op = opacities
    if occ_multiplier is not None and reso_lvl >= 1:
        bucket = min(max(int(reso_lvl) - 1, 0), N_APP_LEVELS - 1)
        op = op * occ_multiplier[:, bucket]

    def _fade_weight(arg_num):
        """Fade weight for a signed margin: linear ramp over `fade_size`
        pixels, or — at fade_size=0 — a *stop-gradient* hard step (a 1e-6-wide
        ramp would hand any row landing inside the window a 1e6-slope opacity
        gradient for one step)."""
        if fade_size <= 0.0:
            return jax.lax.stop_gradient(
                (arg_num >= 0.0).astype(jnp.float32))
        return _fade01(arg_num / fade_size)

    if filter_small:
        # Sub-pixel splats are the aliasing source — fade them out below
        # 1 px of (undilated) footprint; fade_size widens the hard cutoff
        # into a linear ramp (MS-GS paper; viewer anti_alias uses fade 1.0).
        # The fade is gated on the *recorded* max_pixel_sizes ≥ 1 (the row is
        # known to be well-resolved at a finer level, so a coarse substitute
        # exists — gaussian_renderer/__init__.py:50,98 passes the recorded
        # stats into the kernel for exactly this test); rows never resolved
        # anywhere (record −1 or sub-pixel) keep rendering so genuinely fine
        # detail is not suppressed at its only usable scale.
        # `fade_ungated` probes the alternative reading of the unrecoverable
        # CUDA test (fade on the current footprint alone, no recorded-max
        # gate) — BASELINE.md "filter_small semantics", round-4 experiment.
        if fade_ungated:
            applies = jnp.ones((N,), bool)
        elif max_pixel_sizes is not None:
            applies = max_pixel_sizes >= 1.0
        else:
            applies = jnp.zeros((N,), bool)
        w_small = jnp.where(
            applies, _fade_weight(pixel_size - 1.0 + fade_size), 1.0)
        op = op * w_small
        visible = visible & (w_small > 0)
    if filter_large and min_pixel_sizes is not None:
        # Retire rows rendered at resolutions much finer than their home
        # level: min_pixel_sizes records a row's footprint *at its own
        # target level* (per-level stat masking, gaussian_model.py:664), so
        # a current footprint beyond 2× that record means the render is ≥2
        # levels finer than the row was built for — true for inserted
        # aggregates at fine scales, never for level-0 rows (whose home is
        # the finest level). base_mask rows are exempt (preserve_large,
        # train.py:239-241).
        exempt = base_mask if base_mask is not None else jnp.zeros((N,), bool)
        applies = (~exempt) & (min_pixel_sizes >= 0.0)
        thresh = 2.0 * min_pixel_sizes
        w_large = jnp.where(
            applies, _fade_weight(thresh - pixel_size + fade_size), 1.0)
        op = op * w_large
        visible = visible & (w_large > 0)

    # Tile rectangle. The reference includes every pixel of every tile its
    # square ceil(3σ_max) box touches, α-masked at 1/255 in the kernel
    # (getRect + SURVEY §2.3 step 3). The pixels that actually survive the
    # mask lie inside the ellipse dᵀΣ⁻¹d ≤ k², k² = 2·ln(255·op), whose
    # bbox is k·sqrt(cov_xx) × k·sqrt(cov_yy). Intersecting the tile-rects
    # of that ellipse bbox and of the reference box keeps *exactly* the
    # reference's surviving pixel set (the α mask does the rest) while
    # touching far fewer tiles for anisotropic or faint splats (~0.5×
    # entries at bench shapes). `radius` (3σ of λ_max) is still reported
    # for the reference's screen-size statistics (max_radii2D pruning,
    # train.py:249).
    op_struct = jax.lax.stop_gradient(op)
    k2 = 2.0 * jnp.log(jnp.maximum(op_struct, 1e-12) / ALPHA_MIN)
    k = jnp.sqrt(jnp.maximum(k2, 0.0))
    ext_x = k * jnp.sqrt(jnp.maximum(cxx, 0.0))
    ext_y = k * jnp.sqrt(jnp.maximum(cyy, 0.0))
    tiles_x = (W_img + TILE - 1) // TILE
    tiles_y = (H + TILE - 1) // TILE
    mx = jax.lax.stop_gradient(mean_px[:, 0])
    my = jax.lax.stop_gradient(mean_px[:, 1])
    rad = jax.lax.stop_gradient(radius)

    def lo(m, e):
        return jnp.clip(jnp.floor(
            jnp.maximum(m - e, m - rad) / TILE), 0, tiles_x + tiles_y
        ).astype(jnp.int32)

    def hi(m, e):
        return jnp.clip(jnp.minimum(
            jnp.floor((m + e) / TILE) + 1.0,
            jnp.floor((m + rad + TILE - 1) / TILE)), 0, tiles_x + tiles_y
        ).astype(jnp.int32)

    rmin_x = jnp.minimum(lo(mx, ext_x), tiles_x)
    rmin_y = jnp.minimum(lo(my, ext_y), tiles_y)
    rmax_x = jnp.minimum(hi(mx, ext_x), tiles_x)
    rmax_y = jnp.minimum(hi(my, ext_y), tiles_y)
    n_touched = jnp.maximum(rmax_x - rmin_x, 0) * \
        jnp.maximum(rmax_y - rmin_y, 0)
    visible = visible & (n_touched > 0) & (k2 > 0)

    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)
    return PreprocessOut(
        means2d=mean_px,
        depths=depths,
        conics=conics,
        colors=colors,
        opacities=op,
        radii=radii,
        pixel_sizes=jnp.where(visible, pixel_size, 0.0),
        rect_min=jnp.stack([rmin_x, rmin_y], axis=1),
        rect_max=jnp.stack([rmax_x, rmax_y], axis=1),
        visible=visible,
    )
