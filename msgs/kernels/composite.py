"""Pallas tile compositor: depth-ordered alpha blending, forward + backward.

Design (TPU-first, not a CUDA translation — see SURVEY.md §7):

The binner (binning.py) packs depth-sorted splat entries into contiguous
128-entry blocks, each owned by exactly one 16×16 tile. The kernel runs a flat
1-D grid over blocks; consecutive blocks of the same tile accumulate into the
same output buffer (standard Pallas revisiting/accumulation pattern), with
per-tile state (transmittance, done flag) carried in the output buffer itself.
Scalar-prefetched `block_tile` drives the output index map.

Within a block the sequential front-to-back recurrence
    C += T·α·c ;  T *= (1−α)
is reformulated with prefix products: cum_i = Π_{j≤i}(1−α_j) computed as
exp(cumsum(log(1−α))) along the 128-lane axis, giving all per-entry weights
w_i = α_i·T_in·cum_{i−1} at once; color/depth/footprint accumulation is then a
single (256×128)@(128×5) MXU matmul. The reference CUDA early-out semantics
(skip α<1/255; a splat that would push T below 1e-4 is dropped and the pixel
is done — SURVEY.md §2.3 step 3) are reproduced exactly via prefix-monotone
alive masks and a sticky done flag.

The backward pass is a single front-to-back re-traversal (no atomics, no
back-to-front pass): with φ_i = gC·c_i + gD·d_i + gA·p_i and
S_i = Σ_{j>i} w_jφ_j + T_final·gT, the alpha gradient is
    dL/dα_i = T_i·φ_i − S_i/(1−α_i),
and S_i = (gC·C + gD·D + gA·A) − prefix_i + T_final·gT needs only the forward
outputs as residuals. Per-entry gradients land in the entry's own block
(race-free); the caller's XLA gather-VJP scatter-adds them per Gaussian.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msgs.kernels.binning import BLOCK
from msgs.kernels.preprocess import ALPHA_MAX, ALPHA_MIN, T_EPS, TILE

NPIX = TILE * TILE     # 256 pixels per tile
NFEAT = 16             # payload feature rows (12 used + pad)
NOUT = 8               # output channels: r g b depth acc T done pad

# Payload feature row indices. [F_R..F_PSIZE] must stay contiguous — the
# compositor accumulates that slice with one matmul.
F_MX, F_MY, F_CXX, F_CXY, F_CYY, F_OP, F_VALID = 0, 1, 2, 3, 4, 5, 6
F_R, F_G, F_B, F_DEPTH, F_PSIZE = 7, 8, 9, 10, 11
# Output channel indices.
O_R, O_G, O_B, O_DEPTH, O_ACC, O_T, O_DONE = 0, 1, 2, 3, 4, 5, 6


def _pixel_coords(tile_id, tiles_x: int):
    """Per-tile pixel centers as (NPIX, 1) columns (row-major within tile)."""
    tile_x = (tile_id % tiles_x).astype(jnp.float32)
    tile_y = (tile_id // tiles_x).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px_local = (p % TILE).astype(jnp.float32)
    py_local = (p // TILE).astype(jnp.float32)
    px = tile_x * TILE + px_local
    py = tile_y * TILE + py_local
    return px, py


def _alpha_terms(feat, px, py):
    """Shared fwd/bwd per-block alpha math. feat: (NFEAT, BLOCK)."""
    mx = feat[F_MX:F_MX + 1, :]
    my = feat[F_MY:F_MY + 1, :]
    cxx = feat[F_CXX:F_CXX + 1, :]
    cxy = feat[F_CXY:F_CXY + 1, :]
    cyy = feat[F_CYY:F_CYY + 1, :]
    op = feat[F_OP:F_OP + 1, :]
    valid = feat[F_VALID:F_VALID + 1, :]

    dx = px - mx                                   # (NPIX, BLOCK)
    dy = py - my
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    g = jnp.exp(power)
    alpha_raw = op * g
    mask = (valid > 0.0) & (alpha_raw >= ALPHA_MIN) & (power <= 0.0)
    alpha = jnp.where(mask, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
    return alpha, alpha_raw, g, dx, dy, mask


def _cumsum_lanes(x):
    """Inclusive cumulative sum along the last (lane) axis via an
    upper-triangular ones matmul — Mosaic has no cumsum lowering, and this
    form rides the MXU. x: (NPIX, BLOCK)."""
    tri = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
           ).astype(jnp.float32)
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _prefix_products(alpha, t_in):
    """cum_incl/cum_excl along the lane (entry) axis + per-entry T_after."""
    f = 1.0 - alpha
    logf = jnp.log(f)
    cum_incl = jnp.exp(_cumsum_lanes(logf))
    cum_excl = cum_incl / f
    t_after = t_in * cum_incl                     # T if entries ≤ i applied
    return f, cum_incl, cum_excl, t_after


def _is_first_block(b, bt_ref):
    prev = bt_ref[jnp.maximum(b - 1, 0)]
    return (b == 0) | (bt_ref[b] != prev)


def _init_state(tile_id, tiles_x: int, width: int, height: int):
    """Fresh per-tile pixel state: T=1, done=1 for off-image pixels (the
    reference kernel's `inside` mask — such pixels neither accumulate nor
    count toward contribution). Built with concat (no jnp .at — scatter is
    unsupported inside Mosaic kernels)."""
    px, py = _pixel_coords(tile_id, tiles_x)
    outside = ((px >= width) | (py >= height)).astype(jnp.float32)  # (NPIX,1)
    zeros5 = jnp.zeros((NPIX, O_T), jnp.float32)
    ones = jnp.ones((NPIX, 1), jnp.float32)
    pad = jnp.zeros((NPIX, NOUT - O_DONE - 1), jnp.float32)
    return jnp.concatenate([zeros5, ones, outside, pad], axis=1)


def _fwd_kernel(bt_ref, bv_ref, payload_ref, out_ref, contrib_ref, *,
                tiles_x: int, width: int, height: int):
    b = pl.program_id(0)
    tile_id = bt_ref[b]

    @pl.when(_is_first_block(b, bt_ref))
    def _():
        out_ref[0] = _init_state(tile_id, tiles_x, width, height)

    # contrib rows are grouped 8 blocks per (8, 128) VMEM block (Mosaic min
    # output tile); each grid step owns row b % 8 of block b // 8.
    crow = b % 8
    contrib_ref[crow, :] = jnp.zeros((BLOCK,), jnp.float32)

    done_all = jnp.min(out_ref[0, :, O_DONE]) > 0.5

    @pl.when((bv_ref[b] == 1) & jnp.logical_not(done_all))
    def _():
        feat = payload_ref[0]
        px, py = _pixel_coords(tile_id, tiles_x)
        alpha, _, _, _, _, _ = _alpha_terms(feat, px, py)

        t_in = out_ref[0, :, O_T:O_T + 1]          # (NPIX, 1)
        done = out_ref[0, :, O_DONE:O_DONE + 1]
        _, cum_incl, cum_excl, t_after = _prefix_products(alpha, t_in)

        alive = (t_after >= T_EPS).astype(jnp.float32) * (1.0 - done)
        w = alpha * t_in * cum_excl * alive        # (NPIX, BLOCK)

        acc_feats = feat[F_R:F_PSIZE + 1, :]       # (5, BLOCK): r g b depth psize
        acc = jax.lax.dot_general(
            w, acc_feats, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (NPIX, 5)
        out_ref[0, :, O_R:O_ACC + 1] += acc

        t_new = jnp.min(jnp.where(alive > 0.0, t_after, t_in), axis=1,
                        keepdims=True)
        done_new = jnp.maximum(
            done, (t_after[:, BLOCK - 1:] < T_EPS).astype(jnp.float32))
        out_ref[0, :, O_T:O_T + 1] = t_new
        out_ref[0, :, O_DONE:O_DONE + 1] = done_new

        contrib_ref[crow, :] = jnp.max(w, axis=0)


def _bwd_kernel(bt_ref, bv_ref, payload_ref, res_ref, cot_ref, dpay_ref,
                state_ref, *, tiles_x: int, width: int, height: int):
    b = pl.program_id(0)
    tile_id = bt_ref[b]

    @pl.when(_is_first_block(b, bt_ref))
    def _():
        full = _init_state(tile_id, tiles_x, width, height)
        # columns: T_run=1, done=outside, prefix=0, pad=0
        state_ref[:] = jnp.concatenate([
            jnp.ones((NPIX, 1), jnp.float32),
            full[:, O_DONE:O_DONE + 1],
            jnp.zeros((NPIX, 2), jnp.float32)], axis=1)

    dpay_ref[0] = jnp.zeros((NFEAT, BLOCK), jnp.float32)

    done_all = jnp.min(state_ref[:, 1]) > 0.5

    @pl.when((bv_ref[b] == 1) & jnp.logical_not(done_all))
    def _():
        feat = payload_ref[0]
        res = res_ref[0]                            # (NPIX, NOUT) fwd outputs
        cot = cot_ref[0]                            # (NPIX, NOUT) cotangents
        px, py = _pixel_coords(tile_id, tiles_x)
        alpha, alpha_raw, g, dx, dy, mask = _alpha_terms(feat, px, py)

        t_in = state_ref[:, 0:1]
        done = state_ref[:, 1:2]
        p_carry = state_ref[:, 2:3]
        f, cum_incl, cum_excl, t_after = _prefix_products(alpha, t_in)

        alive = (t_after >= T_EPS).astype(jnp.float32) * (1.0 - done)
        t_i = t_in * cum_excl                       # transmittance before i
        w = alpha * t_i * alive

        g_c = cot[:, O_R:O_B + 1]                   # (NPIX, 3)
        g_d = cot[:, O_DEPTH:O_DEPTH + 1]
        g_a = cot[:, O_ACC:O_ACC + 1]
        g_t = cot[:, O_T:O_T + 1]

        colors = feat[F_R:F_B + 1, :]               # (3, BLOCK)
        phi = jax.lax.dot_general(
            g_c, colors, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (NPIX, BLOCK)
        phi = phi + g_d * feat[F_DEPTH:F_DEPTH + 1, :]
        phi = phi + g_a * feat[F_PSIZE:F_PSIZE + 1, :]

        wphi = w * phi
        prefix = p_carry + _cumsum_lanes(wphi)       # inclusive, (NPIX, BLOCK)

        total_phi = (jnp.sum(res[:, O_R:O_B + 1] * g_c, axis=1, keepdims=True)
                     + res[:, O_DEPTH:O_DEPTH + 1] * g_d
                     + res[:, O_ACC:O_ACC + 1] * g_a)
        t_final = res[:, O_T:O_T + 1]
        suffix = total_phi - prefix + t_final * g_t

        d_alpha = (t_i * phi - suffix / f) * alive * mask.astype(jnp.float32)
        unclamped = (alpha_raw < ALPHA_MAX).astype(jnp.float32)
        d_power = d_alpha * alpha * unclamped
        op_row = feat[F_OP:F_OP + 1, :]
        cxx = feat[F_CXX:F_CXX + 1, :]
        cxy = feat[F_CXY:F_CXY + 1, :]
        cyy = feat[F_CYY:F_CYY + 1, :]

        d_op = jnp.sum(d_alpha * g * unclamped, axis=0)          # (BLOCK,)
        ddx = d_power * (-(cxx * dx + cxy * dy))
        ddy = d_power * (-(cyy * dy + cxy * dx))
        d_mx = -jnp.sum(ddx, axis=0)
        d_my = -jnp.sum(ddy, axis=0)
        d_cxx = jnp.sum(d_power * (-0.5 * dx * dx), axis=0)
        d_cxy = jnp.sum(d_power * (-dx * dy), axis=0)
        d_cyy = jnp.sum(d_power * (-0.5 * dy * dy), axis=0)

        d_colors = jax.lax.dot_general(
            w, g_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (BLOCK, 3)
        d_depth = jnp.sum(w * g_d, axis=0)
        d_psize = jnp.sum(w * g_a, axis=0)

        # Row-by-row stores (Mosaic rejects a 16-way stack of reduce results
        # with heterogeneous layouts; the buffer was zeroed above).
        dpay_ref[0, F_MX, :] = d_mx
        dpay_ref[0, F_MY, :] = d_my
        dpay_ref[0, F_CXX, :] = d_cxx
        dpay_ref[0, F_CXY, :] = d_cxy
        dpay_ref[0, F_CYY, :] = d_cyy
        dpay_ref[0, F_OP, :] = d_op
        dpay_ref[0, F_R, :] = d_colors[:, 0]
        dpay_ref[0, F_G, :] = d_colors[:, 1]
        dpay_ref[0, F_B, :] = d_colors[:, 2]
        dpay_ref[0, F_DEPTH, :] = d_depth
        dpay_ref[0, F_PSIZE, :] = d_psize

        # Advance per-tile state exactly as the forward pass does.
        t_new = jnp.min(jnp.where(alive > 0.0, t_after, t_in), axis=1,
                        keepdims=True)
        done_new = jnp.maximum(
            done, (t_after[:, BLOCK - 1:] < T_EPS).astype(jnp.float32))
        state_ref[:, 0:1] = t_new
        state_ref[:, 1:2] = done_new
        state_ref[:, 2:3] = prefix[:, BLOCK - 1:]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _composite_fwd_call(payload, block_tile, block_valid, tiles: int,
                        tiles_x: int, width: int, height: int):
    b_cap = payload.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_cap,),
        in_specs=[
            pl.BlockSpec((1, NFEAT, BLOCK), lambda b, bt, bv: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NPIX, NOUT), lambda b, bt, bv: (bt[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BLOCK), lambda b, bt, bv: (b // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    assert b_cap % 8 == 0, "entry capacity must cover whole 8-block groups"
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, width=width,
                          height=height),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, NPIX, NOUT), jnp.float32),
            jax.ShapeDtypeStruct((b_cap, BLOCK), jnp.float32),
        ],
        interpret=_interpret(),
    )(block_tile, block_valid, payload)


def _composite_bwd_call(payload, block_tile, block_valid, res, cot,
                        tiles_x: int, width: int, height: int):
    b_cap = payload.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_cap,),
        in_specs=[
            pl.BlockSpec((1, NFEAT, BLOCK), lambda b, bt, bv: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, NOUT), lambda b, bt, bv: (bt[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, NOUT), lambda b, bt, bv: (bt[b], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NFEAT, BLOCK), lambda b, bt, bv: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((NPIX, 4), jnp.float32)],
    )
    (dpay,) = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, width=width,
                          height=height),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(payload.shape, jnp.float32)],
        interpret=_interpret(),
    )(block_tile, block_valid, payload, res, cot)
    return dpay


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def composite(payload, block_tile, block_valid, tiles: int, tiles_x: int,
              width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite packed splat blocks into per-tile images.

    payload: (B_cap, NFEAT, BLOCK) f32 — blocked, depth-sorted, tile-aligned.
    Returns (tiles_out (T, 256, NOUT), contrib (B_cap, BLOCK)).
    """
    return _composite_fwd_call(payload, block_tile, block_valid, tiles,
                               tiles_x, width, height)


def _composite_fwd(payload, block_tile, block_valid, tiles, tiles_x, width,
                   height):
    out = _composite_fwd_call(payload, block_tile, block_valid, tiles,
                              tiles_x, width, height)
    return out, (payload, block_tile, block_valid, out[0])


def _composite_bwd(tiles, tiles_x, width, height, residuals, cotangents):
    payload, block_tile, block_valid, res = residuals
    g_tiles, _g_contrib = cotangents
    dpay = _composite_bwd_call(payload, block_tile, block_valid, res,
                               g_tiles, tiles_x, width, height)

    def _f0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return dpay, _f0(block_tile), _f0(block_valid)


composite.defvjp(_composite_fwd, _composite_bwd)


def composite_reference(payload, block_tile, block_valid, tiles: int,
                        tiles_x: int, width: int, height: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-jnp gold oracle: a `lax.scan` over blocks with *identical*
    arithmetic and early-out semantics to the Pallas kernel, differentiable
    end-to-end via autodiff. Used as the correctness reference for both values
    and gradients (BASELINE.md config 1) and as the CPU fallback backend."""
    state0 = jax.vmap(
        lambda t: _init_state(t, tiles_x, width, height))(
            jnp.arange(tiles, dtype=jnp.int32))

    def step(state, inp):
        feat, bt, bv = inp
        tile_state = state[bt]                       # (NPIX, NOUT)
        px, py = _pixel_coords(bt, tiles_x)
        alpha, _, _, _, _, _ = _alpha_terms(feat, px, py)
        t_in = tile_state[:, O_T:O_T + 1]
        done = tile_state[:, O_DONE:O_DONE + 1]
        _, cum_incl, cum_excl, t_after = _prefix_products(alpha, t_in)
        alive = (t_after >= T_EPS).astype(jnp.float32) * (1.0 - done)
        w = alpha * t_in * cum_excl * alive
        acc_feats = feat[F_R:F_PSIZE + 1, :]
        acc = jax.lax.dot_general(
            w, acc_feats, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t_new = jnp.min(jnp.where(alive > 0.0, t_after, t_in), axis=1,
                        keepdims=True)
        done_new = jnp.maximum(
            done, (t_after[:, BLOCK - 1:] < T_EPS).astype(jnp.float32))
        new_tile = tile_state.at[:, O_R:O_ACC + 1].add(acc)
        new_tile = new_tile.at[:, O_T:O_T + 1].set(t_new)
        new_tile = new_tile.at[:, O_DONE:O_DONE + 1].set(done_new)
        live = (bv == 1).astype(jnp.float32)
        new_tile = tile_state + live * (new_tile - tile_state)
        state = state.at[bt].set(new_tile)
        contrib = jnp.max(w, axis=0) * live
        return state, contrib

    state, contrib = jax.lax.scan(
        step, state0, (payload, block_tile, block_valid))
    return state, contrib
