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
    gid_sorted: jnp.ndarray    # (E_cap,) int32 — gauss ids in that order (N=pad)


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
    # the unused capacity tail.
    counts_ext = jnp.concatenate(
        [counts, jnp.maximum(entry_cap - total, 0)[None]])
    ids_ext = jnp.arange(N + 1, dtype=jnp.int32)
    gid = jnp.repeat(ids_ext, counts_ext, total_repeat_length=entry_cap)
    valid = gid < N
    gid_c = jnp.minimum(gid, N - 1)

    slot = jnp.arange(entry_cap, dtype=jnp.int32) - offsets[gid_c]
    w = jnp.maximum(rect_w[gid_c], 1)
    tx = pre.rect_min[gid_c, 0] + slot % w
    ty = pre.rect_min[gid_c, 1] + slot // w
    tile = ty * tiles_x + tx
    tile_key = jnp.where(valid, tile, T).astype(jnp.int32)
    depth_key = jnp.where(valid, pre.depths[gid_c], jnp.inf)

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

    # Packed entry layout via the *inverse* map (gather, not scatter): output
    # slot o lives in tile t = block_tile[o // BLOCK] at in-tile offset
    # r = o - padded_start[t]; its source is sorted entry tile_start[t] + r.
    out_t = block_tile[jnp.arange(E_cap, dtype=jnp.int32) // BLOCK]
    r = jnp.arange(E_cap, dtype=jnp.int32) - padded_start[out_t]
    src = tile_start[out_t] + r
    slot_valid = ((r >= 0) & (r < tile_counts[out_t])
                  & (jnp.arange(E_cap) < total_padded))
    gauss_id = jnp.where(slot_valid,
                         gid_s[jnp.clip(src, 0, entry_cap - 1)], -1)

    # Gid-sorted view of the packed entries, for scatter-free per-Gaussian
    # reductions downstream (gradient accumulation, contribution flags).
    gid_key = jnp.where(gauss_id >= 0, gauss_id, N).astype(jnp.int32)
    gid_sorted, by_gid_perm = jax.lax.sort(
        (gid_key, jnp.arange(E_cap, dtype=jnp.int32)),
        num_keys=1, is_stable=True)

    return Binned(
        gauss_id=gauss_id,
        block_tile=block_tile,
        block_valid=block_valid,
        tile_nonempty=tile_counts > 0,
        num_entries=total,
        overflow=overflow,
        by_gid_perm=by_gid_perm,
        gid_sorted=gid_sorted,
    )
