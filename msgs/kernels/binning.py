"""Tile binning: duplicate visible Gaussians into (tile, depth)-sorted,
block-aligned entry streams for the Pallas compositor.

This replaces the reference rasterizer's prefix-sum + 64-bit-key radix sort
binning stage (SURVEY.md §2.3 step 2) with an XLA-native design:

  1. per-Gaussian touched-tile counts → exclusive cumsum offsets,
  2. static-capacity duplication via `jnp.repeat(..., total_repeat_length)`,
  3. one stable `lax.sort` on (tile_id, depth) keys,
  4. per-tile segments re-packed so every tile's entry list is padded to a
     multiple of BLOCK (=128) entries — each 128-entry block then belongs to
     exactly one tile, so the compositor streams *contiguous* blocks with a
     flat 1-D grid and per-entry outputs are written race-free.

All shapes are static (given `entry_cap`); overflow beyond capacity is
reported via `overflow` so the host can grow capacity and re-jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from msgs.kernels.preprocess import TILE, PreprocessOut

BLOCK = 128  # entries per compositor block (TPU lane width)


class Binned(NamedTuple):
    gauss_id: jnp.ndarray      # (E_cap,) int32 — Gaussian per entry, -1 = pad
    block_tile: jnp.ndarray    # (B_cap,) int32 — owning tile per block
    block_valid: jnp.ndarray   # (B_cap,) int32 — 1 if block holds real entries
    tile_nonempty: jnp.ndarray # (T,) bool — tile has ≥1 entry
    num_entries: jnp.ndarray   # () int32 — duplicated entries (pre-padding)
    overflow: jnp.ndarray      # () int32 — entries dropped due to capacity
    by_gid_perm: jnp.ndarray   # (E_cap,) int32 — packed→gid-sorted permutation
    gid_starts: jnp.ndarray    # (N+1,) int32 — segment starts in that order


def _two_level_cumsum(x):
    """Inclusive prefix sum of a (E,) f32 vector via triangular MXU matmuls
    (E multiple of 128; exact for values < 2^24)."""
    CH = 128
    E = x.shape[0]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
           ).astype(jnp.float32)
    # Marker values reach the Gaussian count (dead rows stack their
    # zero-count offsets), beyond single-bf16 exact range — Precision.HIGH
    # (bf16_3x: inputs split exactly into three bf16 terms) keeps the sums
    # f32-exact at half the cost of the 6-pass HIGHEST default.
    v = x.reshape(-1, CH)
    intra = jnp.einsum("jk,cj->ck", tri, v,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGH)
    tot = intra[:, -1]
    C = tot.shape[0]
    pad = (-C) % CH
    t2 = jnp.pad(tot, (0, pad)).reshape(-1, CH)
    t_intra = jnp.einsum("jk,cj->ck", tri, t2,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGH)
    t_tot = t_intra[:, -1]
    t_base = jnp.cumsum(t_tot) - t_tot
    chunk_incl = (t_intra + t_base[:, None]).reshape(-1)[:C]
    chunk_excl = chunk_incl - tot
    return (intra + chunk_excl[:, None]).reshape(E)


def entry_capacity(entry_cap: int, tiles: int) -> int:
    """Total packed-entry capacity: duplicates + worst-case per-tile padding,
    rounded to 128 blocks (the compositor's per-entry contrib output is
    column-major (BLOCK, B_cap) with (128, 128) VMEM blocks — Mosaic needs a
    128-divisible trailing block dim)."""
    cap = entry_cap + BLOCK * tiles + BLOCK
    group = 128 * BLOCK
    return ((cap + group - 1) // group) * group


def block_capacity(entry_cap: int, tiles: int) -> int:
    return entry_capacity(entry_cap, tiles) // BLOCK


def bin_gaussians(pre: PreprocessOut, width: int, height: int,
                  entry_cap: int) -> Binned:
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    T = tiles_x * tiles_y
    N = pre.depths.shape[0]
    E_cap = entry_capacity(entry_cap, T)
    B_cap = E_cap // BLOCK

    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 0)
    rect_h = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 0)
    counts = jnp.where(pre.visible, rect_w * rect_h, 0).astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - entry_cap, 0)

    # Duplicate: entry e belongs to Gaussian gid[e]; a sentinel id N absorbs
    # the unused capacity tail. Computed as a marker scatter + two-level MXU
    # cumsum — jnp.repeat's internal searchsorted pays ~20 ms of per-round
    # scalar gathers at millions of entries.
    markers = jnp.zeros((entry_cap + 1,), jnp.float32).at[offsets].add(
        1.0, mode="drop")[:entry_cap]
    gid_f = _two_level_cumsum(markers) - 1.0
    gid = gid_f.astype(jnp.int32)
    valid = jnp.arange(entry_cap, dtype=jnp.int32) < total
    gid = jnp.where(valid, gid, N)
    gid_c = jnp.clip(gid, 0, N - 1)

    # One packed row-gather instead of four scalar gathers — XLA lowers 1-D
    # element gathers on TPU ~100× slower than row gathers of small matrices.
    # Values all fit exactly in f32 (indices < 2^24).
    binfo = jnp.stack([
        offsets.astype(jnp.float32),
        pre.rect_min[:, 0].astype(jnp.float32),
        pre.rect_min[:, 1].astype(jnp.float32),
        jnp.maximum(rect_w, 1).astype(jnp.float32),
        pre.depths,
        jnp.zeros_like(pre.depths), jnp.zeros_like(pre.depths),
        jnp.zeros_like(pre.depths)], axis=1)            # (N, 8)
    rows = binfo[gid_c]                                  # (E, 8)
    off_e = rows[:, 0].astype(jnp.int32)
    rmin_x = rows[:, 1].astype(jnp.int32)
    rmin_y = rows[:, 2].astype(jnp.int32)
    w = rows[:, 3].astype(jnp.int32)
    depth_e = rows[:, 4]

    slot = jnp.arange(entry_cap, dtype=jnp.int32) - off_e
    tx = rmin_x + slot % w
    ty = rmin_y + slot // w
    tile = ty * tiles_x + tx
    tile_key = jnp.where(valid, tile, T).astype(jnp.int32)
    depth_key = jnp.where(valid, depth_e, jnp.inf)

    tile_s, _, gid_s = jax.lax.sort(
        (tile_key, depth_key, gid.astype(jnp.int32)),
        num_keys=2, is_stable=True)

    # Per-tile segment boundaries from the *sorted* tile keys — searchsorted
    # instead of segment_sum: TPU scatters serialize, binary search doesn't.
    bounds = jnp.searchsorted(tile_s, jnp.arange(T + 1, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    tile_start = bounds[:T]
    tile_counts = bounds[1:] - bounds[:T]
    padded_counts = ((tile_counts + BLOCK - 1) // BLOCK) * BLOCK
    padded_start = jnp.cumsum(padded_counts) - padded_counts    # (T,)
    total_padded = padded_start[-1] + padded_counts[-1]

    # Block → tile ownership: padded ranges tile [0, total_padded)
    # contiguously, so each block's owner is a binary search over starts.
    # Unused-capacity blocks alias the last nonempty tile (harmless rewrite
    # target for the compositor's output pipeline).
    block_idx = jnp.arange(B_cap, dtype=jnp.int32)
    block_tile = (jnp.searchsorted(padded_start, block_idx * BLOCK,
                                   side="right") - 1).astype(jnp.int32)
    block_tile = jnp.clip(block_tile, 0, T - 1)
    total_blocks = total_padded // BLOCK
    block_valid = (block_idx < total_blocks).astype(jnp.int32)
    last_tile = block_tile[jnp.maximum(total_blocks - 1, 0)]
    block_tile = jnp.where(block_valid == 1, block_tile, last_tile)

    # Packed entry layout via the *inverse* map (gather, not scatter): block
    # b of the packed layout covers sorted entries
    # [tile_start[t] + (b·BLOCK − padded_start[t]), +BLOCK) of its tile t —
    # a *contiguous run*, so the whole permutation is one vmapped
    # dynamic_slice per block (a 128-wide slice-gather; per-element gathers
    # on TPU are two orders of magnitude slower).
    tinfo = jnp.stack([tile_start, padded_start, tile_counts],
                      axis=1)                                  # (T, 3)
    brows = tinfo[block_tile]                                  # (B_cap, 3)
    run_start = brows[:, 0] + (jnp.arange(B_cap, dtype=jnp.int32) * BLOCK
                               - brows[:, 1])
    gid_s_pad = jnp.concatenate(
        [gid_s, jnp.full((BLOCK,), N, jnp.int32)])   # tail-safe slices
    gid_runs = jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            gid_s_pad, (jnp.clip(s, 0, entry_cap),), (BLOCK,)))(
                run_start)                                     # (B_cap, BLOCK)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B_cap, BLOCK), 1)
    in_count = lane + (jnp.arange(B_cap, dtype=jnp.int32) * BLOCK
                       - brows[:, 1])[:, None]
    run_valid = ((in_count >= 0) & (in_count < brows[:, 2][:, None])
                 & (block_valid[:, None] == 1))
    gauss_id = jnp.where(run_valid, gid_runs, -1).reshape(E_cap)

    # Gid-sorted view of the packed entries, for scatter-free per-Gaussian
    # reductions downstream (gradient accumulation, contribution flags).
    # Segment boundaries come in closed form from the emission counts
    # (searchsorted's internal per-round scalar gathers cost ~100ms at this
    # scale): every emitted entry survives packing, truncated only by the
    # capacity overflow at the emission tail.
    gid_key = jnp.where(gauss_id >= 0, gauss_id, N).astype(jnp.int32)
    _, by_gid_perm = jax.lax.sort(
        (gid_key, jnp.arange(E_cap, dtype=jnp.int32)),
        num_keys=1, is_stable=True)
    counts_eff = jnp.clip(entry_cap - offsets, 0, counts)
    gid_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts_eff).astype(jnp.int32)])

    return Binned(
        gauss_id=gauss_id,
        block_tile=block_tile,
        block_valid=block_valid,
        tile_nonempty=tile_counts > 0,
        num_entries=total,
        overflow=overflow,
        by_gid_perm=by_gid_perm,
        gid_starts=gid_starts,
    )
