"""Pallas tile compositor: depth-ordered alpha blending, forward + backward.

Design (TPU-first, not a CUDA translation — see SURVEY.md §7):

The binner (binning.py) packs depth-sorted splat entries into contiguous
128-entry blocks, each owned by exactly one 16×16 tile (per-tile dummy
entries injected before the sort make every tile's segment block-aligned).
The kernel runs a 1-D grid over *groups* of G consecutive blocks — TPU
grids execute sequentially on one core, so per-tile state (transmittance,
done flag, accumulators) is carried across steps in VMEM scratch; grouping
amortizes the per-grid-step pipeline overhead (~1 µs) over G blocks. After
each block the kernel dumps the running tile state into that block's slot of
the output; the caller reads each tile's final state from its *last* block
(`tile_last_block`, closed form from the binning histogram).

Register layout: **entries live on sublanes (128), pixels on lanes (256)** —
per-entry constants broadcast as (128, 1) columns, per-pixel state packs into
dense (1, 256) / (8, 256) rows, prefix products are (128, 128) left-matmuls
on the MXU, and every per-entry gradient lands as a natural (128, 1) column
store. No strided sub-lane-width accesses anywhere.

Within a block the sequential front-to-back recurrence
    C += T·α·c ;  T *= (1−α)
is reformulated with prefix products: cum_i = Π_{j≤i}(1−α_j) computed as
exp(L·log(1−α)) with a lower-triangular ones matrix on the MXU; weights
w_i = α_i·T_in·cum_{i−1} come out all at once. The reference CUDA early-out
semantics (skip α<1/255; a splat that would push T below 1e-4 is dropped and
the pixel is done — SURVEY.md §2.3 step 3) are reproduced exactly via
prefix-monotone alive masks and a sticky done flag; fully-done tiles skip
whole blocks.

The backward pass is a single front-to-back re-traversal (no atomics): with
φ_i = gC·c_i + gD·d_i + gA·p_i and S_i = Σ_{j>i} w_jφ_j + T_final·gT,
    dL/dα_i = T_i·φ_i − S_i/(1−α_i),
and S_i = (gC·C + gD·D + gA·A) − prefix_i + T_final·gT needs only the forward
outputs as residuals (pre-gathered per block by the caller). Per-entry
gradients land in the entry's own block (race-free); the caller reduces them
per Gaussian with a gid sort + segmented reduction (rasterize._gather_payload).
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
NFEAT = 16             # payload feature columns (12 used + pad)
NOUT = 8               # output channels: r g b depth acc T done pad
GROUP = 8              # blocks per grid step (amortizes pipeline overhead)

# Payload feature column indices. [F_R..F_PSIZE] must stay contiguous — the
# compositor accumulates that slice with one matmul.
F_MX, F_MY, F_CXX, F_CXY, F_CYY, F_OP, F_VALID = 0, 1, 2, 3, 4, 5, 6
F_R, F_G, F_B, F_DEPTH, F_PSIZE = 7, 8, 9, 10, 11
# Output channel (row) indices.
O_R, O_G, O_B, O_DEPTH, O_ACC, O_T, O_DONE = 0, 1, 2, 3, 4, 5, 6
# Backward per-block constant rows (pre-gathered by the caller):
# [g_r, g_g, g_b, g_depth, g_acc, total_phi, t_final·g_T, pad]
C_GR, C_GG, C_GB, C_GD, C_GA, C_TPHI, C_TFGT = 0, 1, 2, 3, 4, 5, 6


def _pixel_coords(tile_id, tiles_x: int):
    """Per-tile pixel centers as (1, NPIX) rows (row-major within tile)."""
    tile_x = (tile_id % tiles_x).astype(jnp.float32)
    tile_y = (tile_id // tiles_x).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = tile_x * TILE + (p % TILE).astype(jnp.float32)
    py = tile_y * TILE + (p // TILE).astype(jnp.float32)
    return px, py


def _alpha_terms(feat, px, py):
    """Shared fwd/bwd per-block alpha math.

    feat: (BLOCK, NFEAT) entry-major; px/py: (1, NPIX).
    Returns (BLOCK, NPIX)-shaped alpha products.
    """
    mx = feat[:, F_MX:F_MX + 1]                    # (BLOCK, 1)
    my = feat[:, F_MY:F_MY + 1]
    cxx = feat[:, F_CXX:F_CXX + 1]
    cxy = feat[:, F_CXY:F_CXY + 1]
    cyy = feat[:, F_CYY:F_CYY + 1]
    op = feat[:, F_OP:F_OP + 1]
    valid = feat[:, F_VALID:F_VALID + 1]

    dx = px - mx                                   # (BLOCK, NPIX)
    dy = py - my
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    g = jnp.exp(power)
    alpha_raw = op * g
    mask = (valid > 0.0) & (alpha_raw >= ALPHA_MIN) & (power <= 0.0)
    alpha = jnp.where(mask, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
    return alpha, alpha_raw, g, dx, dy, mask


def _tri_lower():
    """(BLOCK, BLOCK) lower-triangular ones (incl. diagonal): left-matmul
    gives an inclusive prefix sum along the entry (sublane) axis."""
    return (jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
            ).astype(jnp.float32)


def _cumsum_entries(x):
    """Inclusive prefix sum along axis 0 (entries) via MXU matmuls — Mosaic
    has no cumsum lowering, and only DEFAULT/HIGHEST dot precisions.

    Single-pass MXU matmuls round inputs to bf16; the triangular side is 0/1
    (bf16-exact), so splitting x into three bf16 terms recovers full f32
    fidelity in 3 passes (vs 6 for HIGHEST)."""
    tri = _tri_lower()

    def dot(a):
        return jax.lax.dot_general(
            tri, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    x0 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - x0
    x1 = r.astype(jnp.bfloat16).astype(jnp.float32)
    x2 = r - x1
    return dot(x0) + dot(x1) + dot(x2)


def _prefix_products(alpha, t_in):
    """cum_incl/cum_excl along the entry axis + per-entry T_after.

    alpha: (BLOCK, NPIX); t_in: (1, NPIX).
    """
    f = 1.0 - alpha
    logf = jnp.log(f)
    cum_incl = jnp.exp(_cumsum_entries(logf))
    cum_excl = cum_incl / f
    t_after = t_in * cum_incl                     # T if entries ≤ i applied
    return f, cum_incl, cum_excl, t_after


def _block_forward(feat, px, py, t_in, done):
    """One block of front-to-back compositing (shared by kernel + oracle).

    Returns (acc_delta (5, NPIX), t_new (1, NPIX), done_new (1, NPIX),
    w (BLOCK, NPIX))."""
    alpha, _, _, _, _, _ = _alpha_terms(feat, px, py)
    _, cum_incl, cum_excl, t_after = _prefix_products(alpha, t_in)
    alive = (t_after >= T_EPS).astype(jnp.float32) * (1.0 - done)
    w = alpha * t_in * cum_excl * alive            # (BLOCK, NPIX)

    # Feature accumulation as exact-f32 VPU broadcast-reduces (5 features:
    # cheaper than precision-preserving MXU passes at this tiny contraction).
    acc = jnp.stack([
        jnp.sum(feat[:, F_R + i:F_R + i + 1] * w, axis=0)
        for i in range(5)], axis=0)                # (5, NPIX)

    t_new = jnp.min(jnp.where(alive > 0.0, t_after, t_in), axis=0,
                    keepdims=True)
    done_new = jnp.maximum(
        done, (t_after[BLOCK - 1:, :] < T_EPS).astype(jnp.float32))
    return acc, t_new, done_new, w


def _init_state(tile_id, tiles_x: int, width: int, height: int):
    """Fresh per-tile pixel state (NOUT, NPIX): T=1, done=1 for off-image
    pixels (the reference kernel's `inside` mask)."""
    px, py = _pixel_coords(tile_id, tiles_x)
    outside = ((px >= width) | (py >= height)).astype(jnp.float32)  # (1,NPIX)
    zeros5 = jnp.zeros((O_T, NPIX), jnp.float32)
    ones = jnp.ones((1, NPIX), jnp.float32)
    pad = jnp.zeros((NOUT - O_DONE - 1, NPIX), jnp.float32)
    return jnp.concatenate([zeros5, ones, outside, pad], axis=0)


def _fwd_kernel(bt_ref, bv_ref, payload_ref, out_ref, contrib_ref, state_ref,
                *, tiles_x: int, width: int, height: int):
    s = pl.program_id(0)

    # contrib columns are grouped 128 blocks per (128, 128) VMEM block; the
    # buffer is zeroed at each 128-block window and each block accumulates
    # its column through a one-hot lane mask (Mosaic forbids dynamic
    # lane-index stores).
    @pl.when(s % (128 // GROUP) == 0)
    def _():
        contrib_ref[:, :] = jnp.zeros((BLOCK, 128), jnp.float32)

    for g in range(GROUP):
        b = s * GROUP + g
        tile_id = bt_ref[b]
        prev = bt_ref[jnp.maximum(b - 1, 0)]
        first = (b == 0) | (tile_id != prev)

        @pl.when(first)
        def _():
            state_ref[:] = _init_state(tile_id, tiles_x, width, height)

        done_all = jnp.min(state_ref[O_DONE, :]) > 0.5

        @pl.when((bv_ref[b] == 1) & jnp.logical_not(done_all))
        def _():
            feat = payload_ref[g]                   # (BLOCK, NFEAT)
            px, py = _pixel_coords(tile_id, tiles_x)
            t_in = state_ref[O_T:O_T + 1, :]        # (1, NPIX)
            done = state_ref[O_DONE:O_DONE + 1, :]
            acc, t_new, done_new, w = _block_forward(feat, px, py, t_in, done)
            state_ref[O_R:O_ACC + 1, :] += acc
            state_ref[O_T:O_T + 1, :] = t_new
            state_ref[O_DONE:O_DONE + 1, :] = done_new
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                      == b % 128).astype(jnp.float32)
            contrib_ref[:, :] += jnp.max(w, axis=1, keepdims=True) * onehot

        # Dump the running tile state: the caller reads each tile's final
        # state from its last block's slot.
        out_ref[g] = state_ref[:]


def _bwd_kernel(bt_ref, bv_ref, payload_ref, cst_ref, dpay_ref, state_ref,
                *, tiles_x: int, width: int, height: int,
                image_only: bool = False):
    s = pl.program_id(0)

    dpay_ref[...] = jnp.zeros((GROUP, BLOCK, NFEAT), jnp.float32)

    for g in range(GROUP):
        b = s * GROUP + g
        tile_id = bt_ref[b]
        prev = bt_ref[jnp.maximum(b - 1, 0)]
        first = (b == 0) | (tile_id != prev)

        @pl.when(first)
        def _():
            full = _init_state(tile_id, tiles_x, width, height)
            # rows: T_run=1, done=outside, prefix=0, pad
            state_ref[:] = jnp.concatenate([
                jnp.ones((1, NPIX), jnp.float32),
                full[O_DONE:O_DONE + 1, :],
                jnp.zeros((2, NPIX), jnp.float32)], axis=0)

        done_all = jnp.min(state_ref[1, :]) > 0.5

        @pl.when((bv_ref[b] == 1) & jnp.logical_not(done_all))
        def _():
            feat = payload_ref[g]                   # (BLOCK, NFEAT)
            cst = cst_ref[g]                        # (8, NPIX) bwd constants
            px, py = _pixel_coords(tile_id, tiles_x)
            alpha, alpha_raw, gsp, dx, dy, mask = _alpha_terms(feat, px, py)

            t_in = state_ref[0:1, :]                # (1, NPIX)
            done = state_ref[1:2, :]
            p_carry = state_ref[2:3, :]
            f, cum_incl, cum_excl, t_after = _prefix_products(alpha, t_in)

            alive = (t_after >= T_EPS).astype(jnp.float32) * (1.0 - done)
            t_i = t_in * cum_excl                   # transmittance before i
            w = alpha * t_i * alive                 # (BLOCK, NPIX)

            g_c = cst[C_GR:C_GB + 1, :]             # (3, NPIX)

            phi = (feat[:, F_R:F_R + 1] * g_c[0:1, :]
                   + feat[:, F_G:F_G + 1] * g_c[1:2, :]
                   + feat[:, F_B:F_B + 1] * g_c[2:3, :])  # (BLOCK, NPIX)
            if not image_only:
                g_d = cst[C_GD:C_GD + 1, :]
                g_a = cst[C_GA:C_GA + 1, :]
                phi = phi + feat[:, F_DEPTH:F_DEPTH + 1] * g_d
                phi = phi + feat[:, F_PSIZE:F_PSIZE + 1] * g_a

            wphi = w * phi
            prefix = p_carry + _cumsum_entries(wphi)  # inclusive

            suffix = (cst[C_TPHI:C_TPHI + 1, :] - prefix
                      + cst[C_TFGT:C_TFGT + 1, :])

            d_alpha = (t_i * phi - suffix / f) * alive * \
                mask.astype(jnp.float32)
            unclamped = (alpha_raw < ALPHA_MAX).astype(jnp.float32)
            d_power = d_alpha * alpha * unclamped
            d_op = jnp.sum(d_alpha * gsp * unclamped, axis=1)    # (BLOCK,)

            cxx = feat[:, F_CXX:F_CXX + 1]
            cxy = feat[:, F_CXY:F_CXY + 1]
            cyy = feat[:, F_CYY:F_CYY + 1]
            ddx = d_power * (-(cxx * dx + cxy * dy))
            ddy = d_power * (-(cyy * dy + cxy * dx))
            d_mx = -jnp.sum(ddx, axis=1)
            d_my = -jnp.sum(ddy, axis=1)
            d_cxx = jnp.sum(d_power * (-0.5 * dx * dx), axis=1)
            d_cxy = jnp.sum(d_power * (-dx * dy), axis=1)
            d_cyy = jnp.sum(d_power * (-0.5 * dy * dy), axis=1)

            d_colors = jnp.stack([
                jnp.sum(w * g_c[i:i + 1, :], axis=1) for i in range(3)],
                axis=1)                             # (BLOCK, 3)

            # Column stores — natural in the entry-major layout.
            dpay_ref[g, :, F_MX] = d_mx
            dpay_ref[g, :, F_MY] = d_my
            dpay_ref[g, :, F_CXX] = d_cxx
            dpay_ref[g, :, F_CXY] = d_cxy
            dpay_ref[g, :, F_CYY] = d_cyy
            dpay_ref[g, :, F_OP] = d_op
            dpay_ref[g, :, F_R] = d_colors[:, 0]
            dpay_ref[g, :, F_G] = d_colors[:, 1]
            dpay_ref[g, :, F_B] = d_colors[:, 2]
            if not image_only:
                dpay_ref[g, :, F_DEPTH] = jnp.sum(w * g_d, axis=1)
                dpay_ref[g, :, F_PSIZE] = jnp.sum(w * g_a, axis=1)

            # Advance per-tile state exactly as the forward pass does.
            t_new = jnp.min(jnp.where(alive > 0.0, t_after, t_in), axis=0,
                            keepdims=True)
            done_new = jnp.maximum(
                done, (t_after[BLOCK - 1:, :] < T_EPS).astype(jnp.float32))
            state_ref[0:1, :] = t_new
            state_ref[1:2, :] = done_new
            state_ref[2:3, :] = prefix[BLOCK - 1:, :]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _composite_fwd_call(payload, block_tile, block_valid, tile_last_block,
                        tiles: int, tiles_x: int, width: int, height: int):
    b_cap = payload.shape[0]
    assert b_cap % max(GROUP, 128) == 0, \
        "entry capacity must cover whole block groups"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_cap // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, BLOCK, NFEAT), lambda s, bt, bv: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((GROUP, NOUT, NPIX), lambda s, bt, bv: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 128),
                         lambda s, bt, bv: (0, s // (128 // GROUP)),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((NOUT, NPIX), jnp.float32)],
    )
    states, contrib = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, width=width,
                          height=height),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_cap, NOUT, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((BLOCK, b_cap), jnp.float32),
        ],
        interpret=_interpret(),
    )(block_tile, block_valid, payload)
    tiles_out = states[jnp.clip(tile_last_block, 0, b_cap - 1)]
    return tiles_out, contrib


def _composite_bwd_call(payload, block_tile, block_valid, res, cot,
                        tiles_x: int, width: int, height: int,
                        image_only: bool = False):
    b_cap = payload.shape[0]
    # Per-tile backward constants, pre-gathered per block (a block-row gather
    # from the small (T, 8, NPIX) table):
    # [g_r, g_g, g_b, g_depth, g_acc, total_phi, t_final·g_T, pad].
    g_c = cot[:, O_R:O_B + 1, :]
    total_phi = (jnp.sum(res[:, O_R:O_B + 1, :] * g_c, axis=1, keepdims=True)
                 + res[:, O_DEPTH:O_DEPTH + 1, :] * cot[:, O_DEPTH:O_DEPTH + 1, :]
                 + res[:, O_ACC:O_ACC + 1, :] * cot[:, O_ACC:O_ACC + 1, :])
    tf_gt = res[:, O_T:O_T + 1, :] * cot[:, O_T:O_T + 1, :]
    cst_t = jnp.concatenate([
        g_c,
        cot[:, O_DEPTH:O_DEPTH + 1, :],
        cot[:, O_ACC:O_ACC + 1, :],
        total_phi, tf_gt,
        jnp.zeros_like(tf_gt)], axis=1)             # (T, 8, NPIX)
    cst_b = cst_t[block_tile]                       # (B_cap, 8, NPIX)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_cap // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, BLOCK, NFEAT), lambda s, bt, bv: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 8, NPIX), lambda s, bt, bv: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((GROUP, BLOCK, NFEAT), lambda s, bt, bv: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((4, NPIX), jnp.float32)],
    )
    (dpay,) = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, width=width,
                          height=height, image_only=image_only),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(payload.shape, jnp.float32)],
        interpret=_interpret(),
    )(block_tile, block_valid, payload, cst_b)
    return dpay


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def composite(payload, block_tile, block_valid, tile_last_block, tiles: int,
              tiles_x: int, width: int, height: int,
              image_only: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite packed splat blocks into per-tile images.

    payload: (B_cap, BLOCK, NFEAT) f32 — blocked, depth-sorted, tile-aligned.
    With `image_only`, depth/acc/T cotangents are treated as structurally
    zero in the backward pass (the reference's training grad contract).
    Returns (tiles_out (T, NOUT, 256), contrib (BLOCK, B_cap)).
    """
    return _composite_fwd_call(payload, block_tile, block_valid,
                               tile_last_block, tiles, tiles_x, width, height)


def _composite_fwd(payload, block_tile, block_valid, tile_last_block, tiles,
                   tiles_x, width, height, image_only):
    out = _composite_fwd_call(payload, block_tile, block_valid,
                              tile_last_block, tiles, tiles_x, width, height)
    return out, (payload, block_tile, block_valid, out[0])


def _composite_bwd(tiles, tiles_x, width, height, image_only, residuals,
                   cotangents):
    payload, block_tile, block_valid, res = residuals
    g_tiles, _g_contrib = cotangents
    dpay = _composite_bwd_call(payload, block_tile, block_valid, res,
                               g_tiles, tiles_x, width, height,
                               image_only=image_only)

    def _f0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return dpay, _f0(block_tile), _f0(block_valid), _f0(block_tile)


composite.defvjp(_composite_fwd, _composite_bwd)


def composite_reference(payload, block_tile, block_valid, tile_last_block,
                        tiles: int, tiles_x: int, width: int, height: int,
                        image_only: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-jnp gold oracle: a `lax.scan` over blocks sharing
    `_block_forward` with the Pallas kernel — identical arithmetic and
    early-out semantics, differentiable end-to-end via autodiff. The
    correctness reference for values and gradients (BASELINE.md config 1)
    and the CPU fallback backend."""
    state0 = jax.vmap(
        lambda t: _init_state(t, tiles_x, width, height))(
            jnp.arange(tiles, dtype=jnp.int32))

    def step(state, inp):
        feat, bt, bv = inp                           # feat: (BLOCK, NFEAT)
        tile_state = state[bt]                       # (NOUT, NPIX)
        px, py = _pixel_coords(bt, tiles_x)
        t_in = tile_state[O_T:O_T + 1, :]
        done = tile_state[O_DONE:O_DONE + 1, :]
        acc, t_new, done_new, w = _block_forward(feat, px, py, t_in, done)
        new_tile = tile_state.at[O_R:O_ACC + 1, :].add(acc)
        new_tile = new_tile.at[O_T:O_T + 1, :].set(t_new)
        new_tile = new_tile.at[O_DONE:O_DONE + 1, :].set(done_new)
        live = (bv == 1).astype(jnp.float32)
        new_tile = tile_state + live * (new_tile - tile_state)
        state = state.at[bt].set(new_tile)
        contrib = jnp.max(w, axis=1) * live          # (BLOCK,)
        return state, contrib

    state, contrib = jax.lax.scan(
        step, state0, (payload, block_tile, block_valid))
    return state, contrib.T                          # (BLOCK, B_cap)
