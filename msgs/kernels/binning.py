"""Tile binning: duplicate visible Gaussians into (tile, depth)-sorted,
block-aligned entry streams for the Pallas compositor.

This replaces the reference rasterizer's prefix-sum + 64-bit-key radix sort
binning stage (SURVEY.md §2.3 step 2) with an XLA-native design built around
ONE fused-key sort:

  1. per-Gaussian touched-tile counts → exclusive cumsum offsets; Gaussians
     whose emission range crosses `entry_cap` are dropped whole (clean
     truncation — never a partially-binned Gaussian),
  2. per-tile entry counts via a corner-scatter 2-D difference histogram over
     the tile grid (4 scatter-adds of N rect corners + 2-D prefix sums — no
     sort, no per-entry pass),
  3. *pre-sort dummy injection*: each tile t gets (−count_t mod 128) dummy
     entries keyed to sort at the end of t's segment, so every tile's sorted
     segment is already a whole number of 128-entry blocks,
  4. one stable single-key sort over [entries ; dummies] with the 31-bit
     fused key `tile << depth_bits | quantized_depth` carrying the Gaussian
     id — the output IS the packed, tile-aligned, depth-ordered entry
     stream. No post-sort permutation, no per-tile re-packing.

Depth is quantized to (31 − ceil_log2(T+1)) bits for the key (18 bits at
1080p); ties keep emission order via the stable sort. Both compositor
backends consume the same stream, so kernel-vs-oracle parity is unaffected.

All shapes are static (given `entry_cap`); overflow beyond capacity is
reported via `overflow` so the host can grow capacity and re-jit.

Performance note (measured on TPU v5e, 2M entries): XLA's sort is a fast
radix sort (~3 ms/payload-carrying sort) and row gathers from *small*
(N-row) tables are ~5 ms, while row gathers/scatters with entry-sized
(E-row) source tables cost 45-65 ms — the design avoids every E-row-table
gather. `vmap(lax.dynamic_slice)` must never be used: one execution
permanently degrades all subsequent device ops ~100× on this stack.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from msgs.kernels import scan as pscan
from msgs.kernels.preprocess import ALPHA_MIN, TILE, PreprocessOut

BLOCK = 128  # entries per compositor payload block (TPU lane width)
SUB = 32     # tile-alignment granularity: entries per compositor sub-block

# The (5, E) delta-scatter prefix sums run in the one-pass Pallas scan
# kernel (msgs/kernels/scan.py) — measured faster than the XLA cumsum
# cascade (bench A/B r3: 75.3 vs 76.1 ms; the losing branch is deleted).

# Emission-path default: "bands" emits per-Gaussian 3-band x-spans (the
# rect split into top/middle/bottom row bands, each with the exact ellipse
# x-extent over its band — ~13% fewer entries than full rects at bench
# shapes for 3 extra integer delta-scan planes). True = the legacy per-row
# row-tight path (maximal entry savings but R-row scatters bury it on TPU
# — PERF_NOTES "Measured dead ends"); False = plain rects. All three are
# margin-guarded supersets of the α ≥ 1/255 pixel set, so rendered images
# match; `bin_gaussians(..., row_tight=...)` dispatches per call.
ROW_TIGHT_DEFAULT = "bands"


def _pad_ecap(entry_cap: int) -> int:
    """Entry capacity aligned to the scan kernel's 1024-element tiles
    (a no-op for the usual power-of-two caps)."""
    return -(-entry_cap // pscan.TILE_E) * pscan.TILE_E


class Binned(NamedTuple):
    gauss_id: jnp.ndarray      # (E_cap,) int32 — Gaussian per packed entry,
                               #   N = sentinel (dummy / null / truncated)
    sub_tile: jnp.ndarray      # (S_cap,) int32 — owning tile per sub-block
    sub_valid: jnp.ndarray     # (S_cap,) int32 — 1 if sub-block holds entries
    tile_nonempty: jnp.ndarray # (T,) bool — tile has ≥1 entry
    tile_last_sub: jnp.ndarray # (T,) int32 — index of the tile's last sub-block
    num_entries: jnp.ndarray   # () int32 — duplicated entries (pre-truncation)
    overflow: jnp.ndarray      # () int32 — entries dropped due to capacity
    gid_starts: jnp.ndarray    # (N+1,) int32 — per-Gaussian segment starts in
                               #   gid-sorted order (for the VJP reduction)


def entry_capacity(entry_cap: int, tiles: int) -> int:
    """Total packed-entry capacity: duplicates + worst-case per-tile padding
    (≤ SUB−1 dummies per tile), rounded up so the sub-block count divides
    both the compositor's grid grouping (SPG subs per grid step) and the
    128-sub alignment its call wrapper asserts; the 128·BLOCK rounding also
    keeps the dummy region (E_cap − entry_cap) a multiple of the Pallas
    scan tile, which the dummy-stream delta scan requires."""
    cap = _pad_ecap(entry_cap) + SUB * tiles + BLOCK
    group = 128 * BLOCK
    return ((cap + group - 1) // group) * group


def block_capacity(entry_cap: int, tiles: int) -> int:
    return entry_capacity(entry_cap, tiles) // BLOCK


def _depth_bits(tiles: int) -> int:
    """Fused-key split: key = tile << db | depth_q, with the null sentinel
    INT32_MAX reserved. db = 31 − bits(tiles)."""
    tb = max(int(tiles + 1).bit_length(), 1)
    db = 31 - tb
    assert db >= 8, f"too many tiles ({tiles}) for a 31-bit fused sort key"
    return db


def _marker_cumsum(offsets, counts, length: int):
    """gid per slot: slot s ∈ [offsets[g], offsets[g]+counts[g]) ↦ g, via a
    marker scatter + cumsum (values < 2^24, exact in f32). Gaussians with
    count 0 scatter their marker onto the next live Gaussian's start slot —
    the cumsum then skips them in one step."""
    markers = jnp.zeros((length + 1,), jnp.float32).at[offsets].add(
        1.0, mode="drop")[:length]
    return (jnp.cumsum(markers) - 1.0).astype(jnp.int32)


def _delta_scan(fields, positions, entry_cap: int):
    """Per-slot constants from per-segment deltas: scatter Δfields at the
    (monotone) segment start `positions`, then ONE batched inclusive prefix
    sum. Segments with empty slot ranges share their successor's position —
    their deltas telescope. Returns (cums (K, …), iota_f) in the scan's
    layout (permuted sublane-major for the Pallas scan); downstream decode
    is elementwise, so callers just `.reshape(entry_cap)` at the end."""
    K = fields.shape[0]
    dt = fields.dtype                             # f32 (2^24) or int32 (2^31)
    deltas = jnp.diff(fields, axis=1, prepend=jnp.zeros((K, 1), dt))
    s_idx, l_raw = pscan.perm_positions(positions)
    l_idx = jnp.where(positions < entry_cap, l_raw,
                      entry_cap // pscan.SUBL)    # OOB → dropped
    # Per-plane scatters: XLA lowers the batched (K, N) scatter with a
    # leading batch dim ~1 ms slower than K independent 2-D scatters
    # (measured r3 at K=5, N=100k, E=1.6M).
    starts = jnp.stack([
        jnp.zeros(pscan.perm_shape(entry_cap), dt)
           .at[s_idx, l_idx].add(deltas[i], mode="drop")
        for i in range(K)])
    cums = pscan.cumsum_perm(starts)              # (K, 8, E/8)
    iota = pscan.perm_iota(entry_cap)
    return cums, iota.astype(dt)


def _pack_planes(bit_widths):
    """Static first-fit-decreasing packing of bit fields into ≤31-bit
    int32 delta-scan planes, splitting fields across planes' spare
    capacity when no whole slot fits (cross-plane chunks are fine: the
    scan only needs cumsum-of-deltas == packed value, which holds for any
    per-Gaussian int; linearity in the *fields* is not required).

    Returns (n_planes, chunks): chunks[i] is a list of
    (plane, shift_in_plane, field_lo_bit, nbits) for field i. Every plane
    stays < 2^31 so the int32 Pallas scan (scan.py) is exact. Each plane
    costs ~1 ms of scatter+scan at the 1080p bench (measured,
    tools/exp_binning_stages.py) — this packing is why the banded path
    runs 4 planes instead of the 8 the f32 (2^24-exact) layout needed."""
    order = sorted(range(len(bit_widths)), key=lambda i: -bit_widths[i])
    planes = []
    chunks = [[] for _ in bit_widths]
    for i in order:
        b = bit_widths[i]
        placed = False
        for p, used in enumerate(planes):
            if used + b <= 31:
                chunks[i].append((p, used, 0, b))
                planes[p] = used + b
                placed = True
                break
        if placed:
            continue
        lo = 0
        for p in range(len(planes)):
            spare = 31 - planes[p]
            if spare <= 0 or lo >= b:
                continue
            take = min(spare, b - lo)
            chunks[i].append((p, planes[p], lo, take))
            planes[p] += take
            lo += take
        while lo < b:
            take = min(31, b - lo)
            chunks[i].append((len(planes), 0, lo, take))
            planes.append(take)
            lo += take
    return len(planes), chunks


def _pack_fields(fields_i32, bit_widths, chunks, n_planes):
    """(n_fields, N) int32 fields → (n_planes, N) packed planes."""
    N = fields_i32[0].shape[0]
    planes = [jnp.zeros((N,), jnp.int32) for _ in range(n_planes)]
    for f, cks in zip(fields_i32, chunks):
        for (p, shift, lo, nb) in cks:
            part = (f >> lo) & jnp.int32((1 << nb) - 1)
            planes[p] = planes[p] | (part << shift)
    return jnp.stack(planes)


def _unpack_field(cums, chunks_i):
    """Reassemble field i from the scanned planes (elementwise int ops)."""
    out = None
    for (p, shift, lo, nb) in chunks_i:
        part = (cums[p] >> shift) & jnp.int32((1 << nb) - 1)
        v = part << lo
        out = v if out is None else out | v
    return out


_HIST_CHUNK = 1 << 18   # rows per indicator-matmul chunk (bounds transients)


def _onehot_diff_histogram(ylo, yhi, xlo, xhi, ny: int, nx: int):
    """Σ_n outer(1[y=ylo_n] − 1[y=yhi_n], 1[x=xlo_n] − 1[x=xhi_n]) as f32
    indicator matmuls — the separable 2-D difference-histogram identity.
    Exact (products 0/±1, sums < 2^24) and ~10× an equivalent colliding
    scatter-add. Chunked over rows so the materialized indicator operands
    stay ≤ _HIST_CHUNK·(ny+nx)·4 B regardless of Gaussian capacity (at
    N=4M and a 1080p tile grid the unchunked form would transiently
    allocate ~3 GB)."""
    n = ylo.shape[0]
    diff = jnp.zeros((ny, nx), jnp.float32)
    for s in range(0, n, _HIST_CHUNK):
        e = min(s + _HIST_CHUNK, n)
        yi = jax.lax.broadcasted_iota(jnp.int32, (e - s, ny), 1)
        xi = jax.lax.broadcasted_iota(jnp.int32, (e - s, nx), 1)
        ey = ((yi == ylo[s:e, None]).astype(jnp.float32)
              - (yi == yhi[s:e, None]).astype(jnp.float32))
        ex = ((xi == xlo[s:e, None]).astype(jnp.float32)
              - (xi == xhi[s:e, None]).astype(jnp.float32))
        diff = diff + jnp.einsum("ny,nx->yx", ey, ex,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    return diff


def bin_gaussians(pre: PreprocessOut, width: int, height: int,
                  entry_cap: int, row_tight=None) -> Binned:
    if row_tight is None:
        row_tight = ROW_TIGHT_DEFAULT
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    if row_tight == "bands":
        # The packed band descriptors budget 8 bits per count; beyond a
        # 255-tile axis (> 4080 px) fall back to plain rects.
        if tiles_x <= 255 and tiles_y <= 255:
            return _bin_gaussians_banded(pre, width, height, entry_cap)
        return _bin_gaussians_rect(pre, width, height, entry_cap)
    if row_tight:
        return _bin_gaussians_rowtight(pre, width, height, entry_cap)
    return _bin_gaussians_rect(pre, width, height, entry_cap)


def _bin_gaussians_rect(pre: PreprocessOut, width: int, height: int,
                        entry_cap: int) -> Binned:
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    T = tiles_x * tiles_y
    N = pre.depths.shape[0]
    E_cap = entry_capacity(entry_cap, T)
    entry_cap = _pad_ecap(entry_cap)
    B_cap = E_cap // BLOCK
    pad_cap = E_cap - entry_cap
    db = _depth_bits(T)
    NULL_KEY = jnp.int32(2**31 - 1)

    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 0)
    rect_h = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 0)
    counts = jnp.where(pre.visible, rect_w * rect_h, 0).astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - entry_cap, 0)
    # Clean truncation: a Gaussian whose emission range crosses entry_cap is
    # dropped whole, so tile counts / padding / segment boundaries all stay
    # consistent under overflow (the step is discarded and retried anyway).
    kept = counts * (offsets + counts <= entry_cap)

    # --- per-tile entry counts: 2-D difference histogram on the MXU ---
    # The separable identity diff = Σ_g outer(ey0_g − ey1_g, ex0_g − ex1_g)
    # turns the 4 corner scatter-adds (heavily colliding 100k-row scatters,
    # ~2.5 ms measured) into ONE f32 matmul over one-hot row/col indicator
    # differences (~0.2 ms). Products are 0/±1 (exact in every precision);
    # sums stay < 2^24, so the result is exact integer-valued f32. Dead
    # rows get ey ≡ 0 (y0 = y1 out of range), killing their contribution
    # regardless of x columns.
    live = kept > 0
    y0 = jnp.where(live, pre.rect_min[:, 1], tiles_y + 1)
    y1 = jnp.where(live, pre.rect_max[:, 1], tiles_y + 1)
    x0 = pre.rect_min[:, 0]
    x1 = pre.rect_max[:, 0]
    diff = _onehot_diff_histogram(y0, y1, x0, x1, tiles_y + 2, tiles_x + 2)
    cover = jnp.cumsum(jnp.cumsum(diff, axis=0), axis=1)[:tiles_y, :tiles_x]
    tcounts = cover.reshape(T)                       # (T,) f32, exact ints

    # --- emission stream: gid, tile, quantized depth, fused key ---
    # Every per-entry field is integer-valued and constant over a Gaussian's
    # slot range, so instead of a per-entry row gather (whose (E, k)
    # intermediate the TPU lane-pads 16×, making every later pass read
    # padded memory) the fields are DELTA-SCATTERED at segment starts and
    # recovered with one batched prefix sum over compact (rows, E) f32 —
    # exact because all values stay < 2^24. Dead (count-0) Gaussians drop
    # their delta onto the next live Gaussian's start slot where the deltas
    # telescope; truncated Gaussians own their slot range but mark every
    # slot invalid via `end`.
    #
    # Field packing (per Gaussian, all exact in f32):
    #   gidp1 = g+1 (Δ = 1 per start)      → prefix − 1 = gid
    #   off   = emission offset            (≤ entry_cap < 2^24)
    #   end   = off + kept                 (invalid slots: iota ≥ end)
    #   rm    = rmin_y·2^xb + rmin_x       (xb = bits(tiles_x))
    #   wdq   = w·2^dqb + dq               (w ≥ 1 rect width, dq depth)
    xb = max(int(tiles_x).bit_length(), 1)
    yb = max(int(tiles_y).bit_length(), 1)
    dqb = min(db, 24 - (xb + 1))         # wdq = w·2^dqb + dq must stay <2^24
    assert xb + yb <= 24 and dqb >= 8

    dmin = jnp.min(jnp.where(pre.visible, pre.depths, jnp.inf))
    dmax = jnp.max(jnp.where(pre.visible, pre.depths, -jnp.inf))
    dspan = jnp.maximum(dmax - dmin, 1e-9)
    # Real entries quantize into [0, 2^dqb−2]; the top key quantum dq_max is
    # reserved for the tile's dummy padding so real-vs-dummy order never
    # relies on sort stability (an unstable sort is ~3× faster on TPU).
    # Real-vs-real ties within a depth quantum land in arbitrary order —
    # compositing order among equal-depth splats is unspecified in the
    # reference contract too, and both backends consume the same stream, so
    # parity is unaffected.
    dq_g = jnp.floor(jnp.clip((pre.depths - dmin) / dspan * (2.0**dqb - 2.0),
                              0.0, 2.0**dqb - 2.0))
    fields = jnp.stack([
        jax.lax.iota(jnp.float32, N) + 1.0,          # v_g = g+1 ⇒ Δ = 1
        offsets.astype(jnp.float32),
        (offsets + kept).astype(jnp.float32),
        (pre.rect_min[:, 1] * (1 << xb) + pre.rect_min[:, 0]
         ).astype(jnp.float32),
        jnp.maximum(rect_w, 1).astype(jnp.float32) * (2.0**dqb) + dq_g,
    ], axis=0)                                       # (5, N)
    cums, iota_f = _delta_scan(fields, offsets, entry_cap)
    gid = (cums[0] - 1.0).astype(jnp.int32)
    off_f, end_f, rm_f, wdq_f = cums[1], cums[2], cums[3], cums[4]
    valid = iota_f < end_f

    # Unpack rect fields (exact f32 divisions by powers of two).
    w_f = jnp.floor(wdq_f * (0.5**dqb))
    dq_e = wdq_f - w_f * (2.0**dqb)
    rmin_y_f = jnp.floor(rm_f * (0.5**xb))
    rmin_x_f = rm_f - rmin_y_f * (1 << xb)

    # slot → (row, col) of the rect in f32: the VPU has no integer divide
    # (int div/mod by a variable divisor costs ~10 ms at 2M entries), and
    # valid slots (< kept ≤ rect area ≤ ~2^13) divide exactly in f32 after
    # the two standard floor corrections.
    slot_f = iota_f - off_f
    q = jnp.floor(slot_f / w_f)
    r = slot_f - q * w_f
    q = (q - (r < 0.0).astype(jnp.float32)
         + (r >= w_f).astype(jnp.float32))
    r = slot_f - q * w_f
    tx_f = rmin_x_f + r
    ty_f = rmin_y_f + q
    tile_e = (ty_f * tiles_x + tx_f).astype(jnp.int32)

    key_e = jnp.where(
        valid,
        tile_e * (1 << db) + (dq_e.astype(jnp.int32) << (db - dqb)),
        NULL_KEY).reshape(entry_cap)
    gid_e = jnp.where(valid, gid, N).reshape(entry_cap)

    gid_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(kept).astype(jnp.int32)])
    return _finalize(key_e, gid_e, tcounts, total, overflow, gid_starts,
                     T, E_cap, pad_cap, db, N)


def _inflated_k2(opacities):
    """α ≥ 1/255 level set, inflated to cover the compositor's own f32
    error in evaluating `power` plus the span formula's cancellation (same
    budget as the row-tight path — see _bin_gaussians_rowtight)."""
    op = jnp.maximum(opacities, 1e-12)
    return 2.0 * jnp.log(op / ALPHA_MIN) * (1.0 + 1e-4) + 1e-3


def _band_span(a, b, c, det_s, k2p, dy_lo, dy_hi, ymax):
    """Exact x-extent (pixels, relative to the mean) of the ellipse
    dᵀΣ⁻¹d ≤ k² over the row band dy ∈ [dy_lo, dy_hi], with the magnitude-
    scaled roundoff margin. The + branch of dx(dy) is concave (− convex),
    so each extreme sits at the clipped critical point dy* = ∓b·√(k²/(det·c)).
    Returns (dxlo, dxhi, nonempty)."""
    a_s = jnp.maximum(a, 1e-12)
    lo_b = jnp.maximum(dy_lo, -ymax)
    hi_b = jnp.minimum(dy_hi, ymax)
    dystar = -b * jnp.sqrt(k2p / (det_s * jnp.maximum(c, 1e-12)))

    def _ext(dyc):
        s2 = jnp.maximum(a * k2p - det_s * dyc * dyc, 0.0)
        return -b * dyc / a_s, jnp.sqrt(s2) / a_s

    lin_hi, rad_hi = _ext(jnp.clip(dystar, lo_b, hi_b))
    lin_lo, rad_lo = _ext(jnp.clip(-dystar, lo_b, hi_b))
    m_hi = 1e-2 + 4e-6 * (jnp.abs(lin_hi) + rad_hi)
    m_lo = 1e-2 + 4e-6 * (jnp.abs(lin_lo) + rad_lo)
    return lin_lo - rad_lo - m_lo, lin_hi + rad_hi + m_hi, hi_b >= lo_b


def _bin_gaussians_banded(pre: PreprocessOut, width: int, height: int,
                          entry_cap: int) -> Binned:
    """Banded emission: each Gaussian's tile rect splits into ≤3 row bands
    (top quarter / middle half / bottom quarter of its rows), each emitted
    at the exact ellipse x-extent over that band — a superset of every
    α-surviving pixel (same margin discipline as the row-tight path), at
    rect-path cost: the band geometry is three integer fields packed into
    3 extra delta-scan planes (N-row scatters, no R-row segment stream),
    and the per-entry decode is division-free band selection + the rect
    path's exact-f32 row/col division. ~13% fewer entries than rects at
    bench shapes (row-tight's per-row spans would give ~19%, but its
    segment materialization costs ~40 ms in XLA scatters — PERF_NOTES).

    Reference contract unchanged (SURVEY §2.3 step 2: duplicate per
    touched tile, depth-sorted within tile)."""
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    T = tiles_x * tiles_y
    N = pre.depths.shape[0]
    E_cap = entry_capacity(entry_cap, T)
    entry_cap = _pad_ecap(entry_cap)
    B_cap = E_cap // BLOCK
    pad_cap = E_cap - entry_cap
    db = _depth_bits(T)
    NULL_KEY = jnp.int32(2**31 - 1)

    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 0)
    rect_h = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 0)
    live0 = pre.visible & (rect_w > 0) & (rect_h > 0)

    # --- band geometry (per Gaussian, exact ints + f32 span math) ---
    q1 = rect_h // 4                       # band rows: [0,q1) [q1,q2) [q2,h)
    q2 = rect_h - q1
    mx, my = pre.means2d[:, 0], pre.means2d[:, 1]
    a, b, c = pre.conics[:, 0], pre.conics[:, 1], pre.conics[:, 2]
    # Culled rows may carry non-finite projections; they emit nothing, but
    # NaN reaching any delta-scan field poisons the telescoping prefix.
    mx = jnp.where(live0, mx, 0.0)
    my = jnp.where(live0, my, 0.0)
    a = jnp.where(live0, a, 1.0)
    b = jnp.where(live0, b, 0.0)
    c = jnp.where(live0, c, 1.0)
    k2p = jnp.maximum(jnp.where(live0, _inflated_k2(pre.opacities), 1.0), 0.0)
    det = a * c - b * b
    degen = det <= 1e-12
    det_s = jnp.maximum(det, 1e-12)
    ymax = jnp.sqrt(k2p * jnp.maximum(a, 0.0) / det_s)

    rminx_f = pre.rect_min[:, 0].astype(jnp.float32)
    rmaxx_f = pre.rect_max[:, 0].astype(jnp.float32)
    rminy_f = pre.rect_min[:, 1].astype(jnp.float32)

    def band_cols(qa, qb):
        """(txlo, txhi, w) for rows [qa, qb) — full rect width on any
        degenerate / empty-band fallback (a safe superset)."""
        dy_lo = (rminy_f + qa.astype(jnp.float32)) * TILE - my
        dy_hi = (rminy_f + qb.astype(jnp.float32)) * TILE - 1.0 - my
        dxlo, dxhi, nonempty = _band_span(a, b, c, det_s, k2p,
                                          dy_lo, dy_hi, ymax)
        ok = nonempty & ~degen
        txlo = jnp.clip(jnp.floor((mx + dxlo) / TILE), rminx_f, rmaxx_f - 1.0)
        txhi = jnp.clip(jnp.floor((mx + dxhi) / TILE), rminx_f, rmaxx_f - 1.0)
        txlo = jnp.where(ok, txlo, rminx_f)
        txhi = jnp.where(ok, txhi, rmaxx_f - 1.0)
        w = jnp.maximum(txhi - txlo + 1.0, 0.0)
        empty = qb <= qa
        return (jnp.where(empty, rminx_f, txlo),
                jnp.where(empty, 0.0, w))

    zero = jnp.zeros_like(rect_h)
    txlo1, w1 = band_cols(zero, q1)
    txlo2, w2 = band_cols(q1, q2)
    txlo3, w3 = band_cols(q2, rect_h)
    h1 = q1
    h2 = q2 - q1
    h3 = rect_h - q2

    counts = jnp.where(
        live0,
        (h1.astype(jnp.float32) * w1 + h2.astype(jnp.float32) * w2
         + h3.astype(jnp.float32) * w3),
        0.0).astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - entry_cap, 0)
    kept = counts * (offsets + counts <= entry_cap)
    live = kept > 0

    # --- per-tile entry counts: one band = one y×x interval product, so
    # the rect path's separable one-hot difference histogram applies per
    # band; the three diffs accumulate before the single 2-D prefix ---
    def band_hist(qa, qb, txlo, w):
        y0 = jnp.where(live & (w > 0),
                       pre.rect_min[:, 1] + qa, tiles_y + 1)
        y1 = jnp.where(live & (w > 0),
                       pre.rect_min[:, 1] + qb, tiles_y + 1)
        x0 = txlo.astype(jnp.int32)
        x1 = (txlo + w).astype(jnp.int32)
        return _onehot_diff_histogram(y0, y1, x0, x1,
                                      tiles_y + 2, tiles_x + 2)

    diff = (band_hist(zero, q1, txlo1, w1)
            + band_hist(q1, q2, txlo2, w2)
            + band_hist(q2, rect_h, txlo3, w3))
    cover = jnp.cumsum(jnp.cumsum(diff, axis=0), axis=1)[:tiles_y, :tiles_x]
    tcounts = cover.reshape(T)

    # --- entry stream: bit-packed int32 delta-scan planes (4 at 1080p
    # vs the 8 an f32 layout needs — each plane costs ~1 ms of
    # scatter+scan, measured tools/exp_binning_stages.py), then
    # division-free band select + exact-f32 row/col division within the
    # band. The `end` plane of the old layout is gone entirely: kept
    # segments form a prefix of the slot range (offsets are a cumsum of
    # counts, so the first overflowing Gaussian drops every successor),
    # hence validity is a single scalar compare against sum(kept). ---
    dqb = min(db, 23)

    dmin = jnp.min(jnp.where(pre.visible, pre.depths, jnp.inf))
    dmax = jnp.max(jnp.where(pre.visible, pre.depths, -jnp.inf))
    dspan = jnp.maximum(dmax - dmin, 1e-9)
    dq_g = jnp.floor(jnp.clip((pre.depths - dmin) / dspan * (2.0**dqb - 2.0),
                              0.0, 2.0**dqb - 2.0))
    dq_g = jnp.where(live0, dq_g, 0.0).astype(jnp.int32)

    gb = max(int(N).bit_length(), 1)             # iota+1 ∈ [1, N]
    ob = max(int(entry_cap - 1).bit_length(), 1)  # kept offsets < cap
    hb = max(int(tiles_y).bit_length(), 1)       # h1, h2 ≤ rect_h ≤ tiles_y
    wb = max(int(tiles_x).bit_length(), 1)       # band widths ≤ tiles_x
    xb = max(int(tiles_x - 1).bit_length(), 1)   # absolute tile-x lows
    yb = max(int(tiles_y - 1).bit_length(), 1)
    widths = [gb, ob, yb, dqb, hb, hb, wb, wb, wb, xb, xb, xb]
    n_planes, chunks = _pack_planes(widths)
    fields = _pack_fields([
        jax.lax.iota(jnp.int32, N) + 1,
        offsets,
        pre.rect_min[:, 1],
        dq_g,
        h1, h2,
        w1.astype(jnp.int32), w2.astype(jnp.int32), w3.astype(jnp.int32),
        txlo1.astype(jnp.int32), txlo2.astype(jnp.int32),
        txlo3.astype(jnp.int32),
    ], widths, chunks, n_planes)                 # (n_planes, N) < 2^31
    cums, iota_i = _delta_scan(fields, offsets, entry_cap)
    gid = _unpack_field(cums, chunks[0]) - 1
    off_i = _unpack_field(cums, chunks[1])
    rminy_e = _unpack_field(cums, chunks[2]).astype(jnp.float32)
    dq_e = _unpack_field(cums, chunks[3])
    h1f = _unpack_field(cums, chunks[4]).astype(jnp.float32)
    h2f = _unpack_field(cums, chunks[5]).astype(jnp.float32)
    w1f = _unpack_field(cums, chunks[6]).astype(jnp.float32)
    w2f = _unpack_field(cums, chunks[7]).astype(jnp.float32)
    w3f = _unpack_field(cums, chunks[8]).astype(jnp.float32)
    x1f = _unpack_field(cums, chunks[9]).astype(jnp.float32)
    x2f = _unpack_field(cums, chunks[10]).astype(jnp.float32)
    x3f = _unpack_field(cums, chunks[11]).astype(jnp.float32)
    valid = iota_i < jnp.sum(kept)

    slot = (iota_i - off_i).astype(jnp.float32)
    A1 = h1f * w1f
    A2 = h2f * w2f
    in2 = (slot >= A1).astype(jnp.float32)
    in3 = (slot >= A1 + A2).astype(jnp.float32)
    u = slot - in2 * A1 - in3 * A2
    wk = jnp.maximum(w1f + in2 * (w2f - w1f) + in3 * (w3f - w2f), 1.0)
    xk = x1f + in2 * (x2f - x1f) + in3 * (x3f - x2f)
    qb0 = in2 * h1f + in3 * h2f
    q = jnp.floor(u / wk)
    r = u - q * wk
    q = (q - (r < 0.0).astype(jnp.float32) + (r >= wk).astype(jnp.float32))
    r = u - q * wk
    ty = rminy_e + qb0 + q
    tx = xk + r
    tile_e = (ty * tiles_x + tx).astype(jnp.int32)

    key_e = jnp.where(
        valid,
        tile_e * (1 << db) + (dq_e << (db - dqb)),
        NULL_KEY).reshape(entry_cap)
    gid_e = jnp.where(valid, gid, N).reshape(entry_cap)

    gid_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(kept).astype(jnp.int32)])
    return _finalize(key_e, gid_e, tcounts, total, overflow, gid_starts,
                     T, E_cap, pad_cap, db, N)


def seg_capacity(entry_cap: int) -> int:
    """Static row-segment capacity for the row-tight path. Segments are one
    per (Gaussian, touched tile-row); every nonempty row emits ≥1 entry, so
    segments ≤ entries, but entry truncation happens per whole Gaussian —
    half the entry budget of headroom covers every realistic rect shape."""
    return max(_pad_ecap(entry_cap) // 2, 16384)


def _bin_gaussians_rowtight(pre: PreprocessOut, width: int, height: int,
                            entry_cap: int) -> Binned:
    """Row-tight emission: per (Gaussian, tile-row) ellipse x-spans.

    The full-rect binner covers the ellipse's bbox; its corners are pure
    padding (the α ≥ 1/255 mask kills them in the compositor at full pair
    cost). Here every Gaussian is first expanded into ROW SEGMENTS — one per
    touched 16-px tile row — and each segment computes the exact x-extent of
    the ellipse dᵀΣ⁻¹d ≤ k² over its row band:

        dx(dy) = (−b·dy ± √(a·k² − det·dy²)) / a,  det = ac − b²,

    whose + branch is concave in dy (− branch convex), so the extreme over
    the band is the closed-form critical point dy* = ∓b·√(k²/(det·c))
    clamped into band ∩ [−ymax, ymax] (ymax = √(k²·a/det), the ellipse's
    y-extent). Coverage is a *margin-guarded superset* of the surviving
    pixel set: the level set is inflated to k²·(1+1e-4)+1e-3 (covering the
    compositor's own f32 error in evaluating `power`, ~eps·κ(conic)·k²,
    and the radicand's cancellation near tangent rows, ~8·eps·a·k² — both
    orders of magnitude below the inflation), plus a magnitude-scaled
    pixel-space margin for the division/center roundoff. Rendered images
    therefore match the rect path (extra entries fail the α test and
    compose as exact no-ops); only dead (entry × pixel) pairs disappear
    (~π/4 of the entries for isotropic splats, far less for elongated
    diagonals). Verified by tests/test_binning_rowtight.py: randomized
    rect-vs-row-tight image parity + brute-force coverage superset.

    Structure: segments are materialized by a marker cumsum + ONE row gather
    from the small per-Gaussian table (N-table row gathers are fast; the
    stream stays gid-major so per-Gaussian entry ranges remain contiguous
    for the VJP's gid_starts), then entries reuse the same 5-field
    delta-scatter + batched-prefix machinery as the rect path — with a
    simpler decode: no division at all (col = slot − seg_off; tile =
    txbase + col). Reference contract unchanged (SURVEY §2.3 step 2)."""
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    T = tiles_x * tiles_y
    N = pre.depths.shape[0]
    E_cap = entry_capacity(entry_cap, T)
    entry_cap = _pad_ecap(entry_cap)
    pad_cap = E_cap - entry_cap
    db = _depth_bits(T)
    NULL_KEY = jnp.int32(2**31 - 1)
    R = seg_capacity(entry_cap)

    # --- level A: one segment per (Gaussian, touched tile row) ---
    rect_h = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 0)
    n_rows_raw = jnp.where(pre.visible, rect_h, 0).astype(jnp.int32)
    s_off = jnp.cumsum(n_rows_raw) - n_rows_raw
    total_rows = s_off[-1] + n_rows_raw[-1]
    seg_overflow = jnp.maximum(total_rows - R, 0)
    kept_seg_g = s_off + n_rows_raw <= R            # prefix-closed
    n_rows = n_rows_raw * kept_seg_g
    total_kept_rows = jnp.sum(n_rows)

    gid_seg = _marker_cumsum(s_off, n_rows, R)      # (R,) slot → Gaussian
    valid_seg = jnp.arange(R, dtype=jnp.int32) < total_kept_rows

    # Per-Gaussian constants, ONE row gather into the segment stream.
    # Inflated level set: covers the compositor's f32 `power` evaluation
    # error AND this path's radicand cancellation (ADVICE r2: a fixed 1e-2px
    # margin alone is not sound near tangent rows for large faint splats).
    k2 = _inflated_k2(pre.opacities)
    dqb = min(db, 23)
    dmin = jnp.min(jnp.where(pre.visible, pre.depths, jnp.inf))
    dmax = jnp.max(jnp.where(pre.visible, pre.depths, -jnp.inf))
    dspan = jnp.maximum(dmax - dmin, 1e-9)
    dq_g = jnp.floor(jnp.clip((pre.depths - dmin) / dspan * (2.0**dqb - 2.0),
                              0.0, 2.0**dqb - 2.0))
    gtab = jnp.stack([
        pre.means2d[:, 0], pre.means2d[:, 1],
        pre.conics[:, 0], pre.conics[:, 1], pre.conics[:, 2],
        k2,
        pre.rect_min[:, 0].astype(jnp.float32),
        pre.rect_max[:, 0].astype(jnp.float32),
        pre.rect_min[:, 1].astype(jnp.float32),
        dq_g,
        s_off.astype(jnp.float32),
        jnp.zeros((N,), jnp.float32)], axis=1)      # (N, 12)
    # Culled rows may carry non-finite projection values; they own no
    # segments, but a NaN reaching any delta-scatter field would poison the
    # whole telescoping prefix — zero them structurally.
    gtab = jnp.where(pre.visible[:, None], gtab, 0.0)
    gtab = gtab.at[:, 10].set(s_off.astype(jnp.float32))
    sg = gtab[jnp.clip(gid_seg, 0, N - 1)]          # (R, 12) row gather
    mx, my = sg[:, 0], sg[:, 1]
    a, b, c = sg[:, 2], sg[:, 3], sg[:, 4]
    k2s = sg[:, 5]
    rminx, rmaxx, rminy = sg[:, 6], sg[:, 7], sg[:, 8]
    dq_s, s_off_s = sg[:, 9], sg[:, 10]

    q = jnp.arange(R, dtype=jnp.float32) - s_off_s  # row index in the rect
    ty = rminy + q                                  # tile row
    dy0 = ty * TILE - my                            # band [dy0, dy1]
    dy1 = dy0 + (TILE - 1)

    det = a * c - b * b
    degen = det <= 1e-12
    det_s = jnp.maximum(det, 1e-12)
    k2p = jnp.maximum(k2s, 0.0)
    ymax = jnp.sqrt(k2p * jnp.maximum(a, 0.0) / det_s)   # ellipse y-extent
    lo_b = jnp.maximum(dy0, -ymax)
    hi_b = jnp.minimum(dy1, ymax)
    dystar = -b * jnp.sqrt(k2p / (det_s * jnp.maximum(c, 1e-12)))
    a_s = jnp.maximum(a, 1e-12)

    def _span(dyc):
        s2 = jnp.maximum(a * k2p - det_s * dyc * dyc, 0.0)
        return -b * dyc / a_s, jnp.sqrt(s2) / a_s

    lin_hi, rad_hi = _span(jnp.clip(dystar, lo_b, hi_b))
    lin_lo, rad_lo = _span(jnp.clip(-dystar, lo_b, hi_b))
    # Pixel-space roundoff guard, scaled with the span magnitude (the
    # division by a and the mx re-centering each cost ~eps·|dx|).
    m_hi = 1e-2 + 4e-6 * (jnp.abs(lin_hi) + rad_hi)
    m_lo = 1e-2 + 4e-6 * (jnp.abs(lin_lo) + rad_lo)
    dxhi = lin_hi + rad_hi + m_hi
    dxlo = lin_lo - rad_lo - m_lo

    row_live = valid_seg & (hi_b >= lo_b) & ~degen
    txlo = jnp.clip(jnp.floor((mx + dxlo) / TILE), rminx, rmaxx - 1.0)
    txhi = jnp.clip(jnp.floor((mx + dxhi) / TILE), rminx, rmaxx - 1.0)
    # Degenerate conics (never produced by preprocess's dilated covariance,
    # but guarded) fall back to the full rect row.
    txlo = jnp.where(degen & valid_seg, rminx, txlo)
    txhi = jnp.where(degen & valid_seg, rmaxx - 1.0, txhi)
    use_row = valid_seg & (row_live | (degen & valid_seg))
    w_seg = jnp.where(use_row, txhi - txlo + 1.0, 0.0)
    w_seg = jnp.maximum(w_seg, 0.0)

    # --- entry offsets (gid-major, contiguous per Gaussian) ---
    # Exact int32 cumsum (f32 cumsum goes inexact past 2^24 raw entries —
    # ADVICE r2); f32 views of the offsets are used only where the consumed
    # values are ≤ entry_cap (< 2^24, exact) or in order-preserving
    # comparisons against entry_cap (rounding of large ints can't cross it).
    w_i = w_seg.astype(jnp.int32)
    c_incl_i = jnp.cumsum(w_i)                      # (R,) int32, exact
    e_off_i = c_incl_i - w_i
    c_incl = c_incl_i.astype(jnp.float32)
    e_off = e_off_i.astype(jnp.float32)
    total_e = c_incl_i[-1]
    # Overflow in ENTRY units: dropped tile-rows are estimated at 2 entries
    # each (they mix units otherwise — rows vs entries; overestimating only
    # makes the host's capacity growth converge faster).
    overflow = jnp.maximum(jnp.maximum(total_e - entry_cap, 0),
                           2 * seg_overflow)

    # Whole-Gaussian truncation at the entry level (prefix-closed, like the
    # rect path): per-Gaussian entry ranges from the segment prefix.
    g_first = jnp.clip(s_off, 0, R - 1)
    g_last = jnp.clip(s_off + n_rows_raw - 1, 0, R - 1)
    base_g = e_off[g_first]
    tot_g = jnp.where(n_rows > 0, c_incl[g_last] - base_g, 0.0)
    kept_g = kept_seg_g & (base_g + tot_g <= float(entry_cap)) & (n_rows > 0)
    tot_kept_g = jnp.where(kept_g, tot_g, 0.0)
    w_eff = w_seg * kept_g[jnp.clip(gid_seg, 0, N - 1)]
    end_seg = e_off + w_eff

    # --- per-tile entry counts: per-segment x-interval difference sums ---
    # Same MXU one-hot trick as the rect histogram: diffx[y, x] =
    # Σ_seg 1[ty=y]·(1[x=txlo] − 1[x=txhi+1]) is one f32 matmul over
    # indicator matrices (the R-row colliding scatter-add measured ~10 ms
    # at R=786k; the matmul ~2 ms). Exact: products 0/±1, sums < 2^24.
    ty_i = jnp.where(w_eff > 0, ty, float(tiles_y + 0.0)).astype(jnp.int32)
    txlo_i = txlo.astype(jnp.int32)
    txhi_i = txhi.astype(jnp.int32)
    # Single y indicator per segment: yhi = tiles_y+1 is outside the iota
    # range, so its one-hot is identically zero and only +1[y=ty] remains.
    diffx = _onehot_diff_histogram(
        ty_i, jnp.full_like(ty_i, tiles_y + 1), txlo_i, txhi_i + 1,
        tiles_y + 1, tiles_x + 1)
    tcounts = jnp.cumsum(diffx, axis=1)[:tiles_y, :tiles_x].reshape(T)

    # --- entry stream: same 5-field delta-scatter, division-free decode ---
    txbase = ty * tiles_x + txlo                    # tile id of col 0 (< T)
    fields = jnp.stack([
        (gid_seg + 1).astype(jnp.float32),
        e_off,
        end_seg,
        txbase,
        dq_s], axis=0)                              # (5, R)
    positions = jnp.minimum(e_off_i, entry_cap)
    cums, iota_f = _delta_scan(fields, positions, entry_cap)
    gid = (cums[0] - 1.0).astype(jnp.int32)
    off_f, end_f, txb_f, dq_e = cums[1], cums[2], cums[3], cums[4]
    valid = iota_f < end_f
    tile_e = (txb_f + (iota_f - off_f)).astype(jnp.int32)
    key_e = jnp.where(
        valid,
        tile_e * (1 << db) + (dq_e.astype(jnp.int32) << (db - dqb)),
        NULL_KEY).reshape(entry_cap)
    gid_e = jnp.where(valid, gid, N).reshape(entry_cap)

    gid_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(tot_kept_g).astype(jnp.int32)])
    return _finalize(key_e, gid_e, tcounts, total_e, overflow, gid_starts,
                     T, E_cap, pad_cap, db, N)


def _finalize(key_e, gid_e, tcounts, total, overflow, gid_starts,
              T: int, E_cap: int, pad_cap: int, db: int, N: int) -> Binned:
    """Shared binning tail: pre-sort per-tile dummy padding, the one fused-
    key sort, and the sub-block structure read off the sorted keys."""
    NULL_KEY = jnp.int32(2**31 - 1)
    dq_max = jnp.int32((1 << db) - 1)
    padded = jnp.ceil(tcounts / SUB) * SUB
    n_dummy = (padded - tcounts).astype(jnp.int32)   # (T,) in [0, SUB)
    padded_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    total_padded = (padded_start[-1] + padded[-1].astype(jnp.int32))

    # --- dummy stream: n_dummy[t] entries keyed to the end of tile t ---
    # Slot → tile via the same Pallas delta scan as the entry stream (a 1-D
    # jnp.cumsum over the ~0.5M-slot pad region measured ~2.8 ms; the
    # permuted one-pass scan is ~0.2 ms). The permuted slot order is
    # harmless: dummy keys are per-tile constants and the fused-key sort
    # re-orders everything anyway.
    d_off = (jnp.cumsum(n_dummy) - n_dummy).astype(jnp.int32)
    total_d = d_off[-1] + n_dummy[-1]
    fields_d = (jax.lax.iota(jnp.float32, T) + 1.0)[None, :]     # (1, T)
    cums_d, iota_d = _delta_scan(fields_d, jnp.minimum(d_off, pad_cap),
                                 pad_cap)
    tile_d = (cums_d[0] - 1.0).astype(jnp.int32)
    dvalid = iota_d < total_d.astype(jnp.float32)
    # Dummies own the reserved dq_max quantum, strictly after every real
    # entry of their tile — no tie, so the fast unstable sort is safe.
    key_d = jnp.where(dvalid,
                      jnp.clip(tile_d, 0, T - 1) * (1 << db) + dq_max,
                      NULL_KEY).reshape(pad_cap)

    keys = jnp.concatenate([key_e, key_d])
    gids = jnp.concatenate([gid_e, jnp.full((pad_cap,), N, jnp.int32)])
    keys_s, gauss_id = jax.lax.sort((keys, gids), num_keys=1, is_stable=False)

    # --- sub-block structure straight from the sorted keys ---
    S_cap = E_cap // SUB
    first_key = keys_s[jnp.arange(S_cap, dtype=jnp.int32) * SUB]
    raw_tile = first_key // (1 << db)
    sub_valid = (first_key != NULL_KEY).astype(jnp.int32)
    n_subs = total_padded // SUB
    last_idx = jnp.maximum(n_subs - 1, 0)
    last_tile = jnp.clip(raw_tile[last_idx], 0, T - 1)
    sub_tile = jnp.where(sub_valid == 1, jnp.clip(raw_tile, 0, T - 1),
                         last_tile).astype(jnp.int32)

    # The tile's final compositing state lives in its last sub-block's slot
    # of the kernel's state dump (empty tiles are masked downstream).
    tile_last_sub = jnp.maximum(
        (padded_start + padded.astype(jnp.int32)) // SUB - 1, 0)

    return Binned(
        gauss_id=gauss_id,
        sub_tile=sub_tile,
        sub_valid=sub_valid,
        tile_nonempty=tcounts > 0,
        tile_last_sub=tile_last_sub,
        num_entries=total,
        overflow=overflow,
        gid_starts=gid_starts,
    )
