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


def entry_capacity(entry_cap: int, tiles: int) -> int:
    """Total packed-entry capacity: duplicates + worst-case per-tile padding,
    rounded to 8 blocks (Mosaic requires ≥(8,128) output block shapes, so the
    compositor's per-entry outputs are grouped 8 blocks per VMEM block)."""
    cap = entry_cap + BLOCK * tiles + BLOCK
    return ((cap + 8 * BLOCK - 1) // (8 * BLOCK)) * (8 * BLOCK)


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

    # Per-tile segment sizes and block-aligned packing positions.
    ones = jnp.ones((entry_cap,), jnp.int32)
    tile_counts = jax.ops.segment_sum(
        jnp.where(tile_s < T, ones, 0), tile_s, num_segments=T + 1)[:T]
    tile_start = jnp.cumsum(tile_counts) - tile_counts          # (T,)
    padded_counts = ((tile_counts + BLOCK - 1) // BLOCK) * BLOCK
    padded_start = jnp.cumsum(padded_counts) - padded_counts    # (T,)

    tile_s_c = jnp.minimum(tile_s, T - 1)
    rank = jnp.arange(entry_cap, dtype=jnp.int32) - tile_start[tile_s_c]
    pos = padded_start[tile_s_c] + rank
    pos = jnp.where(tile_s < T, pos, E_cap)  # drop invalid entries

    gauss_id = jnp.full((E_cap,), -1, jnp.int32).at[pos].set(
        gid_s, mode="drop")

    # Block → tile ownership map. Unused-capacity blocks alias the last real
    # tile (harmless rewrite target for the compositor's output pipeline).
    n_blocks = padded_counts // BLOCK                            # (T,)
    total_blocks = jnp.sum(n_blocks)
    block_start = padded_start // BLOCK
    block_tile = jnp.zeros((B_cap,), jnp.int32)
    # scatter-add pattern: mark tile starts, then inclusive max-scan.
    first_marks = jnp.full((B_cap,), -1, jnp.int32).at[block_start].max(
        jnp.arange(T, dtype=jnp.int32),
        mode="drop")
    # Tiles with zero blocks share a block_start with the next tile; the .max
    # keeps the *last* such tile id, but empty tiles own no entries so any
    # consistent owner works — forward-fill assigns each block the most recent
    # tile whose segment started at or before it.
    block_tile = jax.lax.associative_scan(jnp.maximum, first_marks)
    block_tile = jnp.maximum(block_tile, 0)
    block_idx = jnp.arange(B_cap, dtype=jnp.int32)
    block_valid = (block_idx < total_blocks).astype(jnp.int32)
    last_tile = block_tile[jnp.maximum(total_blocks - 1, 0)]
    block_tile = jnp.where(block_valid == 1, block_tile, last_tile)

    return Binned(
        gauss_id=gauss_id,
        block_tile=block_tile,
        block_valid=block_valid,
        tile_nonempty=tile_counts > 0,
        num_entries=total,
        overflow=overflow,
    )
