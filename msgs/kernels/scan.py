"""Single-pass multi-row prefix sum on TPU (Pallas) in a permuted layout.

XLA lowers a long `jnp.cumsum` to a logarithmic cascade of passes over the
array (~log2(E) reads/writes of the whole stream); this kernel does ONE
HBM pass with a sequential-grid carry.

The scan order is **sublane-major**: logical element i of a row lives at
array position [i % 8, i // 8] of an (8, E/8) array. In that layout a
whole (8, 128) lane-tile holds 1024 consecutive elements and scans with
Mosaic-proven ops only:

  1. a 3-step sublane Hillis-Steele over the 8 sublanes (concat-shift),
  2. per-lane offsets = exclusive prefix of the per-lane totals along the
     128 lanes, via one (8, 128) @ (128, 128) strictly-lower-triangular
     NN matmul on the MXU (f32-exact: the triangle operand is 0/1),
  3. an all-vector carry chain: (1, 1) full-tile totals accumulate across
     the K lane-tiles of a grid step and persist across steps in a tiny
     VMEM scratch — no scalar extraction from vectors anywhere.

Producers/consumers stay in the permuted layout end-to-end (binning's
delta-scatter writes at permuted positions and all downstream math is
elementwise), so no transpose is ever materialized: `perm_iota` gives each
position its logical index.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8
TILE_E = SUBL * LANES          # 1024 logical elements per (8, 128) tile
KTILES = 32                    # lane-tiles per grid step (32k elements/row)


def perm_shape(E: int):
    assert E % TILE_E == 0, f"scan length {E} must be a multiple of {TILE_E}"
    return (SUBL, E // SUBL)


def perm_positions(idx):
    """Logical element index -> (sublane, lane) position, elementwise."""
    return idx % SUBL, idx // SUBL


def perm_iota(E: int):
    """(8, E/8) array whose entry at [s, l] is its logical index l*8+s."""
    s = jax.lax.broadcasted_iota(jnp.int32, perm_shape(E), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, perm_shape(E), 1)
    return l * SUBL + s


def _scan_kernel(x_ref, out_ref, carry_ref, *, rows: int, ktiles: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[...] = jnp.zeros((rows, 1, 1), jnp.float32)

    tri = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
           < jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
           ).astype(jnp.float32)
    for r in range(rows):
        carry = carry_ref[r]                           # (1, 1)
        for t in range(ktiles):
            x = x_ref[r, :, t * LANES:(t + 1) * LANES]     # (8, 128)
            y = x
            k = 1
            while k < SUBL:                            # sublane incl. scan
                pad = jnp.zeros((k, LANES), jnp.float32)
                y = y + jnp.concatenate([pad, y[:-k]], axis=0)
                k *= 2
            tot = y[SUBL - 1:SUBL, :]                  # (1, 128) lane totals
            off = jnp.dot(jnp.broadcast_to(tot, (SUBL, LANES)), tri,
                          preferred_element_type=jnp.float32)
            y = y + off + carry
            out_ref[r, :, t * LANES:(t + 1) * LANES] = y
            carry = carry + jnp.sum(x, keepdims=True)[:1, :1]
        carry_ref[r] = carry


def _scan_kernel_i32(x_ref, out_ref, carry_ref, *, rows: int, ktiles: int):
    """int32 variant: the f32 kernel's triangular MXU matmul (24-bit exact)
    can't carry 31-bit packed planes, so the per-lane offsets come from a
    log2(LANES)-step Hillis-Steele along the lanes instead — exact to 2^31
    and still one HBM pass. Used by binning's bit-packed delta planes."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[...] = jnp.zeros((rows, 1, 1), jnp.int32)

    for r in range(rows):
        carry = carry_ref[r]                           # (1, 1)
        for t in range(ktiles):
            x = x_ref[r, :, t * LANES:(t + 1) * LANES]     # (8, 128)
            y = x
            k = 1
            while k < SUBL:                            # sublane incl. scan
                pad = jnp.zeros((k, LANES), jnp.int32)
                y = y + jnp.concatenate([pad, y[:-k]], axis=0)
                k *= 2
            tot = y[SUBL - 1:SUBL, :]                  # (1, 128) lane totals
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            pre = tot
            k = 1
            while k < LANES:                           # lane incl. scan
                # Mosaic rejects lane-dim concat-shifts (offset mismatch);
                # rotate + mask is the supported idiom.
                rolled = pltpu.roll(pre, k, 1)
                pre = pre + jnp.where(lane >= k, rolled, 0)
                k *= 2
            y = y + jnp.broadcast_to(pre - tot, (SUBL, LANES)) + carry
            out_ref[r, :, t * LANES:(t + 1) * LANES] = y
            carry = carry + pre[:, LANES - 1:LANES]
        carry_ref[r] = carry


def cumsum_perm(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of (R, 8, E/8) f32 or int32 in the permuted
    layout, along the logical element order. One HBM pass. f32 is exact to
    2^24 (the MXU triangle operand is 0/1); int32 exact to 2^31."""
    R, s, w = x.shape
    assert s == SUBL
    assert x.dtype in (jnp.float32, jnp.int32), x.dtype
    is_int = x.dtype == jnp.int32
    ktiles = KTILES
    while w % (ktiles * LANES) != 0:
        ktiles //= 2
    assert ktiles >= 1 and w % (ktiles * LANES) == 0
    grid = w // (ktiles * LANES)
    out = pl.pallas_call(
        functools.partial(_scan_kernel_i32 if is_int else _scan_kernel,
                          rows=R, ktiles=ktiles),
        grid=(grid,),
        in_specs=[pl.BlockSpec((R, SUBL, ktiles * LANES),
                               lambda g: (0, 0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, SUBL, ktiles * LANES),
                               lambda g: (0, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, SUBL, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, 1, 1), x.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(x)
    return out
