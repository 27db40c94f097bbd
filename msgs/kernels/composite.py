"""Pallas tile compositor: depth-ordered alpha blending, forward + backward.

Design (TPU-first, not a CUDA translation — see SURVEY.md §7):

The binner (binning.py) packs depth-sorted splat entries into a contiguous
stream whose 32-entry sub-blocks each belong to exactly one 16×16 tile
(per-tile dummy entries injected before the sort align tile segments to
SUB=32 — 4× less padding than 128-alignment, and ~20% fewer wasted
entry×pixel pairs). The kernel still runs a 1-D grid over groups of
128-entry payload blocks: the heavy per-pair math (alpha eval,
transcendentals, prefix products) executes at full 128-row width; only the
cheap bookkeeping (T/done updates, state dumps) iterates per sub-block.
TPU grids execute sequentially on one core, so the running tile state
lives in VMEM scratch across steps. After each sub-block the kernel dumps
the running tile state into that sub-block's slot of the output; the
caller reads each tile's final state from its *last* sub-block
(`tile_last_sub`, closed form from the binning histogram).

Register layout: **entries live on sublanes (128), pixels on lanes (256)** —
per-entry constants broadcast as (128, 1) columns, per-pixel state packs into
dense (1, 256) / (8, 256) rows, prefix products are static sublane-shift
scans on the VPU, and every per-entry gradient lands as a natural (128, 1)
column store. No strided sub-lane-width accesses anywhere.

Work split between the VPU and the MXU:
- Alpha evaluation (the quadratic form in *mean-centred* pixel offsets, the
  exp, the reference's selection tests) stays on the VPU: expanding the
  quadratic about the tile origin so the MXU could evaluate it as
  (coeffs @ pixel-basis) loses ~1e-4 of absolute precision to cancellation
  for tight splats (terms ~ conic·(TILE+radius)² ≫ |power|), which busts
  the 1e-5 oracle-parity budget.
- Backward geometry gradients are the six pixel-monomial moments of
  d_power ([x², xy, y², x, y, 1] weights) as VPU multiply + lane
  reductions, from which d{conic, mean2D} follow by per-entry chain rules
  and d_opacity falls out of the ones moment (d_op = d_q00/op). EVERY
  in-kernel matmul was tried and measured slower (r3: per-sub φ/dfeat
  matmuls too small to amortize dispatch, ~5 ms; r4: Mosaic f32 dots are
  HIGHEST-only 6-pass — the per-block d_power @ basis contraction costs
  +2.4 ms vs these reductions, and the full MXU-alpha formulation loses
  outright, tools/exp_mxu.py / tools/exp_bwd2.py).

Within a block the sequential front-to-back recurrence
    C += T·α·c ;  T *= (1−α)
is reformulated with prefix products: cum_i = Π_{j≤i}(1−α_j) via 5 *static*
sublane-shift Hillis-Steele steps per 32-entry sub-block (sub boundaries
are static, so the step masks are compile-time row predicates — no
run-label compares) chained across sub-blocks with scalar-selected carry
rows; cum_excl is the sublane *shift* of cum_incl (exact — no per-pair
divide). The reference CUDA early-out semantics (skip α<1/255; a splat
that would push T below 1e-4 is dropped and the pixel is done — SURVEY.md
§2.3 step 3) are reproduced exactly via prefix-monotone alive masks and a
sticky done flag.

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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msgs.kernels.binning import BLOCK, SUB
from msgs.kernels.preprocess import ALPHA_MAX, ALPHA_MIN, T_EPS, TILE

NPIX = TILE * TILE     # 256 pixels per tile
NFEAT = 12             # payload feature columns (11 used + pad)
NOUT = 8               # output channels: r g b depth acc T done pad
# GROUP pinned by the bench A/B (r3): 4 and 16 measure no better than 8.
# The saturated-tile skip stays on (it costs ~3% on the semi-transparent
# bench scene but skips most of the entry stream on real opaque scenes
# whose tiles carry hundreds-deep depth-sorted lists).
GROUP = 8              # payload blocks / grid step
_SKIP_SATURATED = True
# Under bwd_bf16, compute the per-block wφ prefix with the block-diagonal
# triangular bf16 dot (True) or the 5-step VPU Hillis-Steele scan (False).
# The dot is the last remaining per-block MXU dispatch in the backward —
# kept A/B-able while the dispatch-cost question is live (PERF_NOTES r4).
_BF16_TRI_DOT = True
NSUB = BLOCK // SUB    # tile-aligned sub-blocks per payload block
SPG = GROUP * NSUB     # sub-blocks per grid step
SPB = GROUP * BLOCK    # entries per grid step (bwd moment staging rows)

# Payload feature column indices. All 11 live columns are differentiable
# and contiguous — the gather VJP sorts exactly g[:, :F_PSIZE+1] (or
# g[:, :F_B+1] under image-only grads). [F_R..F_PSIZE] must stay contiguous:
# the compositor accumulates that slice with one matmul. There is no VALID
# column: dummy/null rows carry opacity 0, which the α ≥ 1/255 selection
# test rejects identically.
F_MX, F_MY, F_CXX, F_CXY, F_CYY, F_OP = 0, 1, 2, 3, 4, 5
F_R, F_G, F_B, F_DEPTH, F_PSIZE = 6, 7, 8, 9, 10
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

    dx = px - mx                                   # (BLOCK, NPIX)
    dy = py - my
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    g = jnp.exp(power)
    alpha_raw = op * g
    mask = (alpha_raw >= ALPHA_MIN) & (power <= 0.0)
    alpha = jnp.where(mask, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
    return alpha, alpha_raw, g, dx, dy, mask


def _sub_row_iota(B):
    return jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) % SUB


def _sub_cumprod_static(x):
    """Inclusive prefix product along sublanes, segmented at the static
    SUB-row boundaries: log2(SUB) Hillis-Steele steps whose masks are
    compile-time row predicates (row%SUB ≥ k) — no run-label compares.
    The multiply tree matches the oracle's per-sub scan exactly."""
    B = x.shape[0]
    row = _sub_row_iota(B)
    y = x
    k = 1
    while k < SUB:
        pad = jnp.ones((k,) + x.shape[1:], x.dtype)
        ysh = jnp.concatenate([pad, y[:-k]], axis=0)
        y = y * jnp.where(row >= k, ysh, 1.0)
        k *= 2
    return y


def _sub_cumsum_static(x):
    """Inclusive prefix sum — same static tree with add as the monoid."""
    B = x.shape[0]
    row = _sub_row_iota(B)
    y = x
    k = 1
    while k < SUB:
        pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
        ysh = jnp.concatenate([pad, y[:-k]], axis=0)
        y = y + jnp.where(row >= k, ysh, 0.0)
        k *= 2
    return y


def _seg_cumsum_rows(x, tid_col):
    """Run-masked inclusive prefix sum (legacy helper, kept for the oracle
    and the distribution layer's stripe math): Hillis-Steele with dynamic
    run-label compares. The kernels now use the static per-sub scans."""
    B = x.shape[0]
    y = x
    k = 1
    while k < B:
        pad_x = jnp.zeros((k,) + x.shape[1:], x.dtype)
        pad_t = jnp.full((k, 1), -1.0, tid_col.dtype)
        ysh = jnp.concatenate([pad_x, y[:-k]], axis=0)
        tsh = jnp.concatenate([pad_t, tid_col[:-k]], axis=0)
        y = y + jnp.where(tid_col == tsh, ysh, 0.0)
        k *= 2
    return y


def _chain_carries(loc_incl, fresh, mode: str):
    """Per-sub carry rows for chaining static per-sub scans across a
    multi-sub tile run within one block.

    loc_incl: (BLOCK, NPIX) within-sub inclusive scan; fresh: NSUB python
    list of scalar bools (fresh[0] unused — sub 0's carry is the identity:
    prior-block factors live in the per-row carried state, not the carry).
    Returns NSUB × (1, NPIX) carry rows (prefix over previous same-run subs).
    """
    ident = 1.0 if mode == "mul" else 0.0
    carries = [jnp.full((1, NPIX), ident, jnp.float32)]
    for k in range(1, NSUB):
        last = loc_incl[k * SUB - 1:k * SUB, :]
        prev_tot = (carries[k - 1] * last if mode == "mul"
                    else carries[k - 1] + last)
        carries.append(jnp.where(fresh[k], ident, prev_tot))
    return carries


def _prefix_products(alpha, t_in):
    """cum_incl/cum_excl along the entry axis + per-entry T_after.

    alpha: (SUB, NPIX) single-tile rows; t_in: (1, NPIX). cum_excl is the
    sublane shift of cum_incl (exact), matching the kernel."""
    f = 1.0 - alpha
    cum_incl = _sub_cumprod_static(f)
    cum_excl = jnp.concatenate(
        [jnp.ones((1, alpha.shape[1]), jnp.float32), cum_incl[:-1]], axis=0)
    t_after = t_in * cum_incl                     # T if entries ≤ i applied
    return f, cum_incl, cum_excl, t_after


def _block_forward(feat, px, py, t_in, done):
    """One sub-block of front-to-back compositing (oracle building block).

    Returns (acc_delta (5, NPIX), t_new (1, NPIX), done_new (1, NPIX),
    w (SUB, NPIX))."""
    alpha, _, _, _, _, _ = _alpha_terms(feat, px, py)
    _, cum_incl, cum_excl, t_after = _prefix_products(alpha, t_in)
    alive = (t_after >= T_EPS).astype(jnp.float32) * (1.0 - done)
    w = alpha * t_in * cum_excl * alive            # (SUB, NPIX)

    # Exact-f32 VPU broadcast-reduces, same addition tree as the kernel.
    acc = jnp.stack([
        jnp.sum(feat[:, F_R + i:F_R + i + 1] * w, axis=0)
        for i in range(5)], axis=0)                # (5, NPIX)

    t_new = jnp.min(jnp.where(alive > 0.0, t_after, t_in), axis=0,
                    keepdims=True)
    done_new = jnp.maximum(
        done, (t_after[-1:, :] < T_EPS).astype(jnp.float32))
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


def _local_pix():
    """Tile-local pixel centers as (1, NPIX) int-valued f32 rows."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    return ((p % TILE).astype(jnp.float32),
            (p // TILE).astype(jnp.float32))


def _sub_cols(vals):
    """NSUB scalars → (BLOCK, 1) f32 column, constant per SUB-row group."""
    return jnp.concatenate(
        [jnp.full((SUB, 1), v, jnp.float32) for v in vals], axis=0)


def _sub_rows(rows):
    """NSUB × (1, NPIX) rows → (BLOCK, NPIX), broadcast per SUB-row group."""
    return jnp.concatenate(
        [jnp.broadcast_to(r, (SUB, NPIX)) for r in rows], axis=0)


class _BlockCtx:
    """Per-128-block shared fwd/bwd math with intra-block tile runs.

    Every SUB-entry row group belongs to one tile (binning aligns tile
    segments to SUB); the heavy per-pair math runs at full 128-row width,
    with per-sub static scans chained by scalar-selected carries and
    per-row incoming state selected between the carried scratch state and
    a fresh tile."""

    def __init__(self, feat, tids, prev_tid, not_first, t_run, done_run,
                 tiles_x: int, width: int, height: int):
        txs = [(t % tiles_x).astype(jnp.float32) * TILE for t in tids]
        tys = [(t // tiles_x).astype(jnp.float32) * TILE for t in tids]
        ox_col = _sub_cols(txs)
        oy_col = _sub_cols(tys)
        prev_f = prev_tid.astype(jnp.float32)
        tid_col = _sub_cols([t.astype(jnp.float32) for t in tids])
        # Bool select (never an arithmetic blend): the scratch state is
        # garbage before the first real tile, and 0·NaN would poison it.
        carried = (tid_col == prev_f) & not_first   # (BLOCK, 1) bool

        pxl, pyl = _local_pix()                    # (1, NPIX)
        mxl = feat[:, F_MX:F_MX + 1] - ox_col      # (BLOCK, 1)
        myl = feat[:, F_MY:F_MY + 1] - oy_col
        cxx = feat[:, F_CXX:F_CXX + 1]
        cxy = feat[:, F_CXY:F_CXY + 1]
        cyy = feat[:, F_CYY:F_CYY + 1]
        op = feat[:, F_OP:F_OP + 1]

        dx = pxl - mxl                             # (BLOCK, NPIX)
        dy = pyl - myl
        power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
        gsp = jnp.exp(power)
        alpha_raw = op * gsp
        mask = (alpha_raw >= ALPHA_MIN) & (power <= 0.0)
        alpha = jnp.where(mask, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)

        # fresh[k]: sub k starts a new tile run within this block (fresh[0]
        # refers to the block boundary and only gates the *state chain* —
        # the scan carry for sub 0 is always the identity).
        fresh = [None] * NSUB
        for k in range(1, NSUB):
            fresh[k] = tids[k] != tids[k - 1]

        f = 1.0 - alpha
        loc = _sub_cumprod_static(f)
        carries = _chain_carries(loc, fresh, "mul")
        row = _sub_row_iota(BLOCK)
        excl_loc = jnp.where(
            row >= 1,
            jnp.concatenate([jnp.ones((1, NPIX), jnp.float32), loc[:-1]], 0),
            1.0)
        cum_incl = jnp.concatenate(
            [loc[k * SUB:(k + 1) * SUB] * carries[k] for k in range(NSUB)], 0)
        cum_excl = jnp.concatenate(
            [excl_loc[k * SUB:(k + 1) * SUB] * carries[k]
             for k in range(NSUB)], 0)

        # Per-row incoming transmittance/done: a carried run continues the
        # scratch state; fresh runs start at T=1 with off-image pixels done.
        outside = (((pxl + ox_col) >= width)
                   | ((pyl + oy_col) >= height)).astype(jnp.float32)
        t_in = jnp.where(carried, t_run, 1.0)      # (BLOCK, NPIX)
        done = jnp.where(carried, done_run, outside)
        t_after = t_in * cum_incl
        alive = (t_after >= T_EPS).astype(jnp.float32) * (1.0 - done)

        self.mxl, self.myl = mxl, myl
        self.cxx, self.cxy, self.cyy, self.op = cxx, cxy, cyy, op
        self.alpha, self.alpha_raw, self.gsp = alpha, alpha_raw, gsp
        self.mask, self.f = mask, f
        self.dx, self.dy = dx, dy
        self.cum_excl, self.t_after = cum_excl, t_after
        self.t_in, self.alive = t_in, alive
        self.w = alpha * t_in * cum_excl * alive   # (BLOCK, NPIX)
        self.tids, self.carried, self.fresh = tids, carried, fresh
        self.outside = outside                     # (BLOCK, NPIX)
        self.carried0 = (tids[0] == prev_tid) & not_first


def _sub_accs(ctx, feat, w):
    """Per-sub feature accumulation: exact-f32 VPU broadcast-reduces (the
    MXU form needs a transposed operand Mosaic can't be trusted with, and
    at 5×SUB×256 the VPU cost is small)."""
    out = []
    for k in range(NSUB):
        rows = slice(k * SUB, (k + 1) * SUB)
        out.append(jnp.stack([
            jnp.sum(feat[rows, F_R + i:F_R + i + 1] * w[rows], axis=0)
            for i in range(5)], axis=0))           # (5, NPIX)
    return out


def _sub_states(ctx, accs, state_ref):
    """Per-sub-block output states as a branch-free select chain.

    Returns states where states[k] is the (NOUT, NPIX) tile state after
    applying sub-block k. Rounding stays left-associative (base, then
    acc_j ascending) so values match the jnp oracle exactly."""
    tmins, lastts = [], []
    for k in range(NSUB):
        rows = slice(k * SUB, (k + 1) * SUB)
        tmins.append(jnp.min(
            jnp.where(ctx.alive[rows] > 0.0, ctx.t_after[rows], 2.0),
            axis=0, keepdims=True))                # (1, NPIX)
        lastts.append(ctx.t_after[(k + 1) * SUB - 1:(k + 1) * SUB, :])

    states = []
    acc_st = state_ref[O_R:O_ACC + 1, :]
    t_st = state_ref[O_T:O_T + 1, :]
    done_st = state_ref[O_DONE:O_DONE + 1, :]
    for k in range(NSUB):
        fresh = ctx.fresh[k] if k > 0 else jnp.logical_not(ctx.carried0)
        outside_k = ctx.outside[k * SUB:k * SUB + 1, :]
        acc_st = jnp.where(fresh, accs[k], acc_st + accs[k])
        t_st = jnp.minimum(jnp.where(fresh, 1.0, t_st), tmins[k])
        done_st = jnp.maximum(
            jnp.where(fresh, outside_k, done_st),
            (lastts[k] < T_EPS).astype(jnp.float32))
        states.append(jnp.concatenate(
            [acc_st, t_st, done_st,
             jnp.zeros((NOUT - O_DONE - 1, NPIX), jnp.float32)], axis=0))
    return states


def _fwd_kernel(st_ref, sv_ref, payload_ref, out_ref, state_ref,
                *, tiles_x: int, width: int, height: int):
    s = pl.program_id(0)

    for g in range(GROUP):
        b = s * GROUP + g
        sb0 = b * NSUB
        tids = [st_ref[sb0 + k] for k in range(NSUB)]
        prev = st_ref[jnp.maximum(sb0 - 1, 0)]
        nf = sb0 > 0
        compute = sv_ref[sb0] == 1

        # Saturated-tile block skip (the TPU form of the reference kernel's
        # per-pixel early-out): when every sub continues the carried tile
        # AND every carried pixel is done (T < T_EPS or off-image), the
        # whole block provably contributes nothing (alive ≡ 0 ⇒ w ≡ 0) and
        # leaves the tile state unchanged — exact equivalence, not an
        # approximation. done values are exactly 0.0/1.0, so the f32 sum
        # test is exact. Typical scenes saturate tiles within the first
        # block or two of their (often hundreds-deep) entry list.
        same_tile = nf
        for k in range(NSUB):
            same_tile = jnp.logical_and(same_tile, tids[k] == prev)
        if _SKIP_SATURATED:
            saturated = (jnp.sum(state_ref[O_DONE:O_DONE + 1, :])
                         >= float(NPIX))
            skip = jnp.logical_and(same_tile, saturated)

            @pl.when(jnp.logical_and(compute, skip))
            def _():
                # State is unchanged; the tile's last sub may live here, so
                # its slots must still carry the running state.
                for k in range(NSUB):
                    out_ref[g * NSUB + k] = state_ref[:]
        else:
            skip = jnp.full((), False)

        @pl.when(jnp.logical_and(compute, jnp.logical_not(skip)))
        def _():
            feat = payload_ref[g]                  # (BLOCK, NFEAT)
            ctx = _BlockCtx(feat, tids, prev, nf,
                            state_ref[O_T:O_T + 1, :],
                            state_ref[O_DONE:O_DONE + 1, :],
                            tiles_x, width, height)
            accs = _sub_accs(ctx, feat, ctx.w)
            states = _sub_states(ctx, accs, state_ref)
            for k in range(NSUB):
                out_ref[g * NSUB + k] = states[k]
            state_ref[:] = states[NSUB - 1]


def _tri_subdiag():
    """(BLOCK, BLOCK) f32 block-diagonal lower-triangular matrix: out row i
    sums rows j ≤ i of the same SUB-row group. Entries are exactly 0/1, so a
    bf16 MXU contraction against it loses only the operand rounding."""
    i = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    return ((j <= i) & (i // SUB == j // SUB)).astype(jnp.float32)


def _moment_basis():
    """(NPIX, 8) f32 pixel-monomial basis [x, y, 1, 0…] in tile-local
    integer coordinates — every value ≤ 15 is exact in bf16."""
    p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 8), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 8), 1)
    x = (p % TILE).astype(jnp.float32)
    y = (p // TILE).astype(jnp.float32)
    return jnp.where(c == 0, x, jnp.where(c == 1, y,
                     jnp.where(c == 2, 1.0, 0.0)))


def _bf16_dot(a, b):
    """a @ b on the MXU with bf16 operands and f32 accumulation (one-pass;
    the f32 HIGHEST dot Mosaic would otherwise emit is 6-pass and loses to
    VPU reductions at these shapes — tools/exp_bwd2.py, PERF_NOTES).
    Precision must be DEFAULT explicitly: the package pins the global
    matmul default to HIGHEST (bf16-default corrupts projections/SSIM in
    XLA-land math), and Mosaic rejects an fp32-precision contract over
    bf16 operands ("Bad lhs type")."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def _bwd_kernel(st_ref, sv_ref, payload_ref, *rest,
                tiles_x: int, width: int, height: int,
                image_only: bool = False, bwd_bf16: bool = False):
    cst_refs = rest[:SPG]                          # SPG × (1, 8, NPIX)
    if bwd_bf16:
        cstT_refs = rest[SPG:2 * SPG]              # SPG × (1, NPIX, 8)
        dpay_ref, state_ref = rest[2 * SPG], rest[2 * SPG + 1]
        mom_ref = rest[2 * SPG + 2]                # (4·SPB, NPIX) bf16
    else:
        dpay_ref, state_ref = rest[SPG], rest[SPG + 1]
    s = pl.program_id(0)
    nf_phi = 3 if image_only else 5                # r g b (depth psize)
    row_in_sub = [
        jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0) // SUB == k
        for k in range(NSUB)]

    if bwd_bf16:
        # Phase 0 — step-batched φ: one (SPB, SPG·nf)·(SPG·nf, NPIX) bf16
        # dot serves every block (φ is state-free). Row r's features sit in
        # column group r//SUB of the block-diagonal lhs, matching the
        # sub-major rhs row order; dead blocks' sentinel payload rows give
        # zero φ, which the live/dead predicates ignore anyway.
        feats_all = payload_ref[:].reshape(SPB, NFEAT)
        rhs_all = jnp.concatenate(
            [cst_refs[j][0][C_GR:C_GR + nf_phi, :] for j in range(SPG)],
            axis=0)                                # (SPG·nf, NPIX)
        r_grp = jax.lax.broadcasted_iota(jnp.int32, (SPB, SPG * nf_phi),
                                         0) // SUB
        c_grp = jax.lax.broadcasted_iota(jnp.int32, (SPB, SPG * nf_phi),
                                         1) // nf_phi
        lhs_all = jnp.where(
            r_grp == c_grp,
            jnp.tile(feats_all[:, F_R:F_R + nf_phi], (1, SPG)), 0.0)
        phi_all = _bf16_dot(lhs_all, rhs_all)      # (SPB, NPIX) f32

    for g in range(GROUP):
        b = s * GROUP + g
        sb0 = b * NSUB
        tids = [st_ref[sb0 + k] for k in range(NSUB)]
        prev = st_ref[jnp.maximum(sb0 - 1, 0)]
        nf = sb0 > 0
        compute = sv_ref[sb0] == 1

        # Same saturated-tile skip as the forward kernel: alive ≡ 0 ⇒ all
        # gradients of this block are zero and the carried (t, done,
        # wφ-prefix) scratch is unchanged.
        same_tile = nf
        for k in range(NSUB):
            same_tile = jnp.logical_and(same_tile, tids[k] == prev)
        if _SKIP_SATURATED:
            saturated = jnp.sum(state_ref[1:2, :]) >= float(NPIX)
            live = jnp.logical_and(
                compute,
                jnp.logical_not(jnp.logical_and(same_tile, saturated)))
        else:
            live = compute

        # Zero only dead blocks (live ones overwrite every column): the
        # unconditional pre-zero double-wrote the whole dpay stream
        # (measured −1.0 ms at bench shapes, tools/exp_bwd3.py).
        @pl.when(jnp.logical_not(live))
        def _():
            dpay_ref[g] = jnp.zeros((BLOCK, NFEAT), jnp.float32)
            if bwd_bf16:
                z = jnp.zeros((BLOCK, NPIX), jnp.bfloat16)
                for q in range(4):
                    mom_ref[q * SPB + g * BLOCK:q * SPB + (g + 1) * BLOCK] = z

        @pl.when(live)
        def _():
            feat = payload_ref[g]                  # (BLOCK, NFEAT)
            ctx = _BlockCtx(feat, tids, prev, nf,
                            state_ref[0:1, :], state_ref[1:2, :],
                            tiles_x, width, height)
            csts = [cst_refs[g * NSUB + k][0] for k in range(NSUB)]

            t_i = ctx.t_in * ctx.cum_excl          # transmittance before i
            w = ctx.w                              # (BLOCK, NPIX)

            if bwd_bf16:
                # φ from the phase-0 batched dot; w staged (bf16) for the
                # phase-2 batched dfeat contraction — both replace
                # per-block dots that measured dispatch-bound.
                phi = phi_all[g * BLOCK:(g + 1) * BLOCK]
                mom_ref[3 * SPB + g * BLOCK:3 * SPB + (g + 1) * BLOCK] = \
                    w.astype(jnp.bfloat16)
                dfeat = None
            else:
                # φ and per-entry feature grads on the VPU: per-sub MXU
                # matmuls here are (32×nf)·(nf×256) — far too small to
                # amortize dispatch (8 tiny matmuls per block ≈ 115k
                # dispatches per pass, measured several ms of pure launch
                # latency). Each sub's constant cotangent rows stay
                # (1, NPIX) and broadcast implicitly in the per-sub
                # arithmetic — materializing them to block width first
                # measured ~0.6 ms slower (tools/exp_bwd3.py `nogrows`).
                phi_subs, df_subs = [], []
                for k in range(NSUB):
                    rows = slice(k * SUB, (k + 1) * SUB)
                    pk = csts[k][C_GR:C_GR + 1, :] * feat[rows, F_R:F_R + 1]
                    for c in range(1, nf_phi):
                        pk = pk + csts[k][C_GR + c:C_GR + c + 1, :] * \
                            feat[rows, F_R + c:F_R + c + 1]
                    phi_subs.append(pk)
                    df_subs.append(jnp.stack(
                        [jnp.sum(w[rows] * csts[k][C_GR + c:C_GR + c + 1, :],
                                 axis=1) for c in range(nf_phi)],
                        axis=1))                       # (SUB, nf)
                phi = jnp.concatenate(phi_subs, axis=0)
                dfeat = jnp.concatenate(df_subs, axis=0)   # (BLOCK, nf)

            # Per-run wφ prefix: static per-sub scans + scalar carries +
            # the carried-run scratch offset. Under bwd_bf16 the per-sub
            # inclusive scan is one block-diagonal triangular bf16 matmul
            # (exact 0/1 triangle; only the wφ operand rounds) instead of
            # the 5-step Hillis-Steele chain.
            p_rows = jnp.where(ctx.carried, state_ref[2:3, :], 0.0)
            if bwd_bf16 and _BF16_TRI_DOT:
                loc = _bf16_dot(_tri_subdiag(), w * phi)
            else:
                loc = _sub_cumsum_static(w * phi)
            carries = _chain_carries(loc, ctx.fresh, "add")
            prefix = p_rows + jnp.concatenate(
                [loc[k * SUB:(k + 1) * SUB] + carries[k]
                 for k in range(NSUB)], axis=0)

            sfx_c = _sub_rows([
                c[C_TPHI:C_TPHI + 1, :] + c[C_TFGT:C_TFGT + 1, :]
                for c in csts])
            suffix = sfx_c - prefix

            d_alpha = (t_i * phi - suffix / ctx.f) * ctx.alive * \
                ctx.mask.astype(jnp.float32)
            unclamped = (ctx.alpha_raw < ALPHA_MAX).astype(jnp.float32)
            d_power = d_alpha * ctx.alpha * unclamped

            mxl, myl = ctx.mxl, ctx.myl
            cxx, cxy, cyy = ctx.cxx, ctx.cxy, ctx.cyy
            if bwd_bf16:
                # Stage the three moment lhs matrices (d_power, d_power·dx,
                # d_power·dy in the MEAN-CENTRED form — bounds bf16 rounding
                # amplification to ~(|mxl|/r + 1) instead of the (mxl/σ)²
                # blow-up of raw monomials) for ONE step-wide batched MXU
                # dot after the block loop: per-block (128,256)·(256,8)
                # dots measured dispatch/latency-bound at ~10 ms per pass
                # (tools/exp_fwd_ablate.py bwd/full vs bwd/no_geom), the
                # same cost as the six VPU lane reductions they replaced.
                # Geometry chains + stores happen in the phase-3 loop below.
                mom_ref[g * BLOCK:(g + 1) * BLOCK] = \
                    d_power.astype(jnp.bfloat16)
                mom_ref[SPB + g * BLOCK:SPB + (g + 1) * BLOCK] = \
                    (d_power * ctx.dx).astype(jnp.bfloat16)
                mom_ref[2 * SPB + g * BLOCK:2 * SPB + (g + 1) * BLOCK] = \
                    (d_power * ctx.dy).astype(jnp.bfloat16)
            else:
                # Exact-f32 path: the six pixel-monomial moments of d_power
                # as VPU multiply + lane reductions, then per-entry chain
                # rules. (The r3 design contracted d_power against a static
                # (NPIX, 8) basis on the MXU; under the package's HIGHEST
                # default that matmul runs 6-pass f32 and measures ~2.4 ms
                # SLOWER per pass than these reductions — tools/exp_bwd2.py.)
                pxl_r, pyl_r = _local_pix()        # (1, NPIX)
                dp_x = d_power * pxl_r
                dp_y = d_power * pyl_r
                d_q20 = jnp.sum(dp_x * pxl_r, axis=1, keepdims=True)
                d_q11 = jnp.sum(dp_x * pyl_r, axis=1, keepdims=True)
                d_q02 = jnp.sum(dp_y * pyl_r, axis=1, keepdims=True)
                d_q10 = jnp.sum(dp_x, axis=1, keepdims=True)
                d_q01 = jnp.sum(dp_y, axis=1, keepdims=True)
                d_q00 = jnp.sum(d_power, axis=1, keepdims=True)
                # power = −½cxx(x−mxl)² − ½cyy(y−myl)² − cxy(x−mxl)(y−myl):
                # d_cxx = Σ d_power·(−½(x−mxl)²) in the monomial sums.
                d_cxx = -0.5 * (d_q20 - 2.0 * mxl * d_q10 + mxl * mxl * d_q00)
                d_cyy = -0.5 * (d_q02 - 2.0 * myl * d_q01 + myl * myl * d_q00)
                d_cxy = -(d_q11 - myl * d_q10 - mxl * d_q01
                          + mxl * myl * d_q00)
                d_mx = cxx * (d_q10 - mxl * d_q00) + \
                    cxy * (d_q01 - myl * d_q00)
                d_my = cyy * (d_q01 - myl * d_q00) + \
                    cxy * (d_q10 - mxl * d_q00)
            if not bwd_bf16:
                # α = op·exp(power) ⇒ d_op = Σ d_alpha·exp(power) = d_q00/op
                # (d_power = d_alpha·α·unclamped and α = op·exp(power) on
                # the surviving rows; op = 0 only on dummy rows, masked 0).
                d_op = jnp.where(
                    ctx.op > 0.0, d_q00 / jnp.maximum(ctx.op, 1e-30), 0.0)

                # Column stores — natural in the entry-major layout.
                dpay_ref[g, :, F_MX] = d_mx[:, 0]
                dpay_ref[g, :, F_MY] = d_my[:, 0]
                dpay_ref[g, :, F_CXX] = d_cxx[:, 0]
                dpay_ref[g, :, F_CXY] = d_cxy[:, 0]
                dpay_ref[g, :, F_CYY] = d_cyy[:, 0]
                dpay_ref[g, :, F_OP] = d_op[:, 0]
            if not bwd_bf16:
                for i in range(nf_phi):
                    dpay_ref[g, :, F_R + i] = dfeat[:, i]

            # Advance the per-tile scratch exactly as the forward pass
            # does, but branch-free and only to the block's final state
            # (intermediate sub-block states are never read back here).
            t_st = state_ref[0:1, :]
            done_st = state_ref[1:2, :]
            for k in range(NSUB):
                fresh = ctx.fresh[k] if k > 0 else \
                    jnp.logical_not(ctx.carried0)
                rows = slice(k * SUB, (k + 1) * SUB)
                tmin = jnp.min(
                    jnp.where(ctx.alive[rows] > 0.0, ctx.t_after[rows], 2.0),
                    axis=0, keepdims=True)
                lastt = ctx.t_after[(k + 1) * SUB - 1:(k + 1) * SUB, :]
                outside_k = ctx.outside[k * SUB:k * SUB + 1, :]
                t_st = jnp.minimum(jnp.where(fresh, 1.0, t_st), tmin)
                done_st = jnp.maximum(
                    jnp.where(fresh, outside_k, done_st),
                    (lastt < T_EPS).astype(jnp.float32))
            state_ref[0:1, :] = t_st
            state_ref[1:2, :] = done_st
            state_ref[2:3, :] = prefix[BLOCK - 1:BLOCK, :]

    if bwd_bf16:
        # Phase 2: two batched MXU dots for the whole step — the moment
        # contraction (3·SPB rows = GROUP blocks × {dp, dp·dx, dp·dy}) and
        # the dfeat contraction of the staged w rows against the sub-major
        # transposed cotangent columns.
        dcoef = _bf16_dot(mom_ref[0:3 * SPB], _moment_basis())  # (3·SPB, 8)
        cstT_all = jnp.concatenate(
            [cstT_refs[j][0][:, C_GR:C_GR + nf_phi] for j in range(SPG)],
            axis=1)                                    # (NPIX, SPG·nf)
        df_all = _bf16_dot(mom_ref[3 * SPB:4 * SPB], cstT_all)  # (SPB, SPG·nf)
        # Phase 3: per-block chain rules + geometry column stores.
        # Unpredicated: dead/skipped blocks staged zero moments, so their
        # chains produce zeros — consistent with the dead-block dpay
        # zeroing (payload sentinel rows are finite, so no NaN leaks).
        for g in range(GROUP):
            feat = payload_ref[g]
            sb0 = (s * GROUP + g) * NSUB
            txs = [(st_ref[sb0 + k] % tiles_x).astype(jnp.float32) * TILE
                   for k in range(NSUB)]
            tys = [(st_ref[sb0 + k] // tiles_x).astype(jnp.float32) * TILE
                   for k in range(NSUB)]
            mxl = feat[:, F_MX:F_MX + 1] - _sub_cols(txs)
            myl = feat[:, F_MY:F_MY + 1] - _sub_cols(tys)
            cxx = feat[:, F_CXX:F_CXX + 1]
            cxy = feat[:, F_CXY:F_CXY + 1]
            cyy = feat[:, F_CYY:F_CYY + 1]
            op = feat[:, F_OP:F_OP + 1]
            m0 = dcoef[g * BLOCK:(g + 1) * BLOCK]
            m1 = dcoef[SPB + g * BLOCK:SPB + (g + 1) * BLOCK]
            m2 = dcoef[2 * SPB + g * BLOCK:2 * SPB + (g + 1) * BLOCK]
            q00 = m0[:, 2:3]                       # ⟨dp⟩
            q10c = m1[:, 2:3]                      # ⟨dp·dx⟩
            q01c = m2[:, 2:3]                      # ⟨dp·dy⟩
            q20c = m1[:, 0:1] - mxl * q10c         # ⟨dp·dx²⟩
            q11c = m1[:, 1:2] - myl * q10c         # ⟨dp·dx·dy⟩
            q02c = m2[:, 1:2] - myl * q01c         # ⟨dp·dy²⟩
            dpay_ref[g, :, F_MX] = (cxx * q10c + cxy * q01c)[:, 0]
            dpay_ref[g, :, F_MY] = (cyy * q01c + cxy * q10c)[:, 0]
            dpay_ref[g, :, F_CXX] = (-0.5 * q20c)[:, 0]
            dpay_ref[g, :, F_CXY] = (-q11c)[:, 0]
            dpay_ref[g, :, F_CYY] = (-0.5 * q02c)[:, 0]
            # α = op·exp(power) ⇒ d_op = q00/op (op = 0 only on dummy rows,
            # whose moments are zero).
            dpay_ref[g, :, F_OP] = jnp.where(
                op > 0.0, q00 / jnp.maximum(op, 1e-30), 0.0)[:, 0]
            # dfeat extraction from the batched contraction: row r of block
            # g, sub k reads column group g·NSUB+k.
            dfg = df_all[g * BLOCK:(g + 1) * BLOCK]
            dfeat = sum(
                jnp.where(row_in_sub[k],
                          dfg[:, (g * NSUB + k) * nf_phi:
                              (g * NSUB + k + 1) * nf_phi], 0.0)
                for k in range(NSUB))                  # (BLOCK, nf)
            for i in range(nf_phi):
                dpay_ref[g, :, F_R + i] = dfeat[:, i]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _composite_fwd_call(payload, sub_tile, sub_valid, tile_last_sub,
                        tiles: int, tiles_x: int, width: int, height: int):
    b_cap = payload.shape[0]
    s_cap = b_cap * NSUB
    assert s_cap % max(SPG, 128) == 0, \
        "entry capacity must cover whole sub-block groups"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_cap // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, BLOCK, NFEAT), lambda s, st, sv: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SPG, NOUT, NPIX), lambda s, st, sv: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((NOUT, NPIX), jnp.float32)],
    )
    (states,) = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, width=width,
                          height=height),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s_cap, NOUT, NPIX), jnp.float32),
        ],
        interpret=_interpret(),
    )(sub_tile, sub_valid, payload)
    return states[jnp.clip(tile_last_sub, 0, s_cap - 1)]


def _composite_bwd_call(payload, sub_tile, sub_valid, res, cot,
                        tiles_x: int, width: int, height: int,
                        image_only: bool = False, bwd_bf16: bool = False):
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
    # The kernel pulls each sub-block's constant rows straight from the
    # small (T, 8, NPIX) table with scalar-prefetched dynamic index maps —
    # no (S_cap, 8, NPIX) materialization.
    def cst_spec(j):
        return pl.BlockSpec(
            (1, 8, NPIX),
            lambda s, st, sv, j=j: (st[s * SPG + j], 0, 0),
            memory_space=pltpu.VMEM)

    def cst_t_spec(j):
        return pl.BlockSpec(
            (1, NPIX, 8),
            lambda s, st, sv, j=j: (st[s * SPG + j], 0, 0),
            memory_space=pltpu.VMEM)

    extra_in = []
    extra_specs = []
    if bwd_bf16:
        # The dfeat contraction consumes the cotangent rows lane-major: one
        # caller-side transpose of the small (T, 8, NPIX) table instead of
        # an in-kernel relayout per block.
        cstT_t = jnp.swapaxes(cst_t, 1, 2)          # (T, NPIX, 8)
        extra_in = [cstT_t] * SPG
        extra_specs = [cst_t_spec(j) for j in range(SPG)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_cap // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, BLOCK, NFEAT), lambda s, st, sv: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [cst_spec(j) for j in range(SPG)] + extra_specs,
        out_specs=[
            pl.BlockSpec((GROUP, BLOCK, NFEAT), lambda s, st, sv: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((4, NPIX), jnp.float32)] + (
            [pltpu.VMEM((4 * SPB, NPIX), jnp.bfloat16)] if bwd_bf16 else []),
    )
    # Under bwd_bf16 the step-wide staging scratch ((4·SPB, NPIX) bf16 =
    # 2 MB) plus the phase-0 φ batch and phase-2 dot operands exceed
    # Mosaic's default 16 MB scoped-VMEM window at driver shapes (measured
    # 16.83 MB → hard compile OOM, VERDICT r4 #1). v5e/v5p carry 128 MB of
    # physical VMEM; raising this kernel's scoped window to 24 MB leaves
    # >100 MB for the pipeline's double-buffered block windows.
    params = (pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024)
              if bwd_bf16 else None)
    (dpay,) = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, width=width,
                          height=height, image_only=image_only,
                          bwd_bf16=bwd_bf16),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(payload.shape, jnp.float32)],
        compiler_params=params,
        interpret=_interpret(),
    )(sub_tile, sub_valid, payload, *([cst_t] * SPG), *extra_in)
    return dpay


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def composite(payload, sub_tile, sub_valid, tile_last_sub, tiles: int,
              tiles_x: int, width: int, height: int,
              image_only: bool = False, bwd_bf16: bool = False) -> jnp.ndarray:
    """Composite packed splat blocks into per-tile images.

    payload: (B_cap, BLOCK, NFEAT) f32 — blocked, depth-sorted, with every
    SUB-entry sub-block owned by exactly one tile.
    With `image_only`, depth/acc/T cotangents are treated as structurally
    zero in the backward pass (the reference's training grad contract).
    With `bwd_bf16`, the backward kernel's moment reductions and wφ prefix
    run as bf16 MXU contractions (forward values stay exact f32) — see
    RasterSettings.bwd_bf16.
    Returns tiles_out (T, NOUT, 256).
    """
    return _composite_fwd_call(payload, sub_tile, sub_valid,
                               tile_last_sub, tiles, tiles_x, width, height)


def _composite_fwd(payload, sub_tile, sub_valid, tile_last_sub, tiles,
                   tiles_x, width, height, image_only, bwd_bf16):
    out = _composite_fwd_call(payload, sub_tile, sub_valid,
                              tile_last_sub, tiles, tiles_x, width, height)
    return out, (payload, sub_tile, sub_valid, out)


def _composite_bwd(tiles, tiles_x, width, height, image_only, bwd_bf16,
                   residuals, g_tiles):
    payload, sub_tile, sub_valid, res = residuals
    dpay = _composite_bwd_call(payload, sub_tile, sub_valid, res,
                               g_tiles, tiles_x, width, height,
                               image_only=image_only, bwd_bf16=bwd_bf16)

    def _f0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return dpay, _f0(sub_tile), _f0(sub_valid), _f0(sub_tile)


composite.defvjp(_composite_fwd, _composite_bwd)


def composite_reference(payload, sub_tile, sub_valid, tile_last_sub,
                        tiles: int, tiles_x: int, width: int, height: int,
                        image_only: bool = False,
                        bwd_bf16: bool = False) -> jnp.ndarray:
    """Pure-jnp gold oracle: a `lax.scan` over sub-blocks sharing
    `_block_forward` with the Pallas kernel — identical arithmetic and
    early-out semantics, differentiable end-to-end via autodiff. The
    correctness reference for values and gradients (BASELINE.md config 1)
    and the CPU fallback backend."""
    state0 = jax.vmap(
        lambda t: _init_state(t, tiles_x, width, height))(
            jnp.arange(tiles, dtype=jnp.int32))
    payload_sub = payload.reshape(-1, SUB, NFEAT)    # (S_cap, SUB, NFEAT)

    def step(state, inp):
        feat, st, sv = inp                           # feat: (SUB, NFEAT)
        tile_state = state[st]                       # (NOUT, NPIX)
        px, py = _pixel_coords(st, tiles_x)
        t_in = tile_state[O_T:O_T + 1, :]
        done = tile_state[O_DONE:O_DONE + 1, :]
        acc, t_new, done_new, w = _block_forward(feat, px, py, t_in, done)
        new_tile = tile_state.at[O_R:O_ACC + 1, :].add(acc)
        new_tile = new_tile.at[O_T:O_T + 1, :].set(t_new)
        new_tile = new_tile.at[O_DONE:O_DONE + 1, :].set(done_new)
        live = (sv == 1).astype(jnp.float32)
        new_tile = tile_state + live * (new_tile - tile_state)
        state = state.at[st].set(new_tile)
        return state, None

    state, _ = jax.lax.scan(
        step, state0, (payload_sub, sub_tile, sub_valid))
    return state
