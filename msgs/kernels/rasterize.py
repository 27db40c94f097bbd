"""Top-level differentiable rasterizer: preprocess → bin → composite → unpack.

The public contract mirrors the reference `GaussianRasterizer.__call__`
(gaussian_renderer/__init__.py:37-108 — SURVEY.md §2.3): same inputs
(means3D, SHs or precomputed colors, opacities, scales/rotations or
cov3D_precomp, MS pixel-size stats, occ_multiplier, dc_delta, base_mask) and
same outputs (rendered image, acc_pixel_size, depth, radii, pixel_sizes),
plus a transmittance map. Differences by design: images are channels-last
(H, W, 3); screen-space densification gradients surface through an explicit
`means2d_probe` argument instead of a retain_grad dummy tensor; the render
level is passed explicitly for the per-level appearance buckets.

Differentiability: preprocess is plain jnp (XLA autodiff); binning produces
integer structure under stop_gradient; the per-entry payload is a row gather
from the small per-Gaussian feature table with a custom VJP (sort the
gradient rows by Gaussian id — a fast radix sort — then a scatter-free
MXU segmented reduction); the compositor is a Pallas custom_vjp pair.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from msgs.kernels import composite as comp
from msgs.kernels.binning import BLOCK, bin_gaussians
from msgs.kernels.preprocess import TILE, preprocess


class RasterSettings(NamedTuple):
    """Static rasterizer configuration (hashable; safe as a jit static arg)."""
    filter_small: bool = False
    filter_large: bool = False
    entry_cap: int = 1 << 20
    backend: str = "auto"          # "pallas" | "reference" | "auto"
    # Only the rendered image carries gradients (the reference's training
    # contract — SURVEY §2.3: "output gradient enters through rendered_image
    # only"): depth / acc_pixel_size / transmittance outputs are
    # stop-gradiented and the backward pass skips their cotangent transport
    # (2 fewer sort operands, fewer kernel passes). Leave False to
    # differentiate every output.
    image_grads_only: bool = False
    # Emission path: None → binning.ROW_TIGHT_DEFAULT ("bands" — 3-band
    # x-spans per rect); False → plain rects; True → legacy per-row
    # row-tight (maximal entry savings, XLA-scatter-bound — PERF_NOTES).
    row_tight: object = None
    # Pack pairs of gradient columns into uint32 (two bf16 halves) for the
    # gather-VJP's gid sort — ~half the sort operands for ~2^-8-relative
    # noise on per-entry gradient contributions (summed in f32). Training-
    # benign (stochastic-gradient scale) but outside the strict parity
    # budget: off by default, enabled by the bench and by `--fast_grads`.
    grad_pack_bf16: bool = False
    # Run the backward compositor's moment reductions and wφ prefix as bf16
    # MXU contractions (mean-centred form bounds the rounding amplification;
    # forward image values stay exact f32). ~2^-8-relative noise on
    # parameter gradients — training-benign, outside the strict parity
    # budget. Measured SLOWER than the exact VPU path at 1080p bench shapes
    # (72.2 vs 60.1 ms, r5 — the step-batched MXU dots don't beat the lane
    # reductions they replace, PERF_NOTES): opt-in A/B only, via --bwd_bf16
    # or MSGS_BENCH_BWD_BF16=1.
    bwd_bf16: bool = False
    # filter_small semantics probe (BASELINE.md "filter_small semantics"):
    # when True, the sub-pixel fade keys on the CURRENT footprint alone,
    # ignoring the recorded max_pixel_sizes gate — the alternative reading
    # of the unrecoverable CUDA test (gaussian_renderer/__init__.py:50-52).
    # Default False = the recorded-max reconstruction.
    fade_ungated: bool = False


class RenderOutput(NamedTuple):
    image: jnp.ndarray          # (H, W, 3)
    depth: jnp.ndarray          # (H, W) alpha-weighted depth
    acc_pixel_size: jnp.ndarray # (H, W) alpha-weighted splat footprint
    transmittance: jnp.ndarray  # (H, W) final T (1 - alpha coverage)
    radii: jnp.ndarray          # (N,) int32 screen radius, 0 if culled
    pixel_sizes: jnp.ndarray    # (N,) current footprint; >0 iff contributing
    visible: jnp.ndarray        # (N,) bool = radii > 0
    num_entries: jnp.ndarray    # () int32 duplicated entries
    overflow: jnp.ndarray       # () int32 entries dropped (grow entry_cap!)


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas"


def _tri_cumsum(x):
    """Inclusive prefix sum along axis 1 of (C, 128, F) via an MXU matmul
    (XLA's cumsum lowering walks the axis; a triangular matmul doesn't)."""
    tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
           ).astype(jnp.float32)
    return jnp.einsum("jk,cjf->ckf", tri, x,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGH)


def _segmented_sums(values, gid_starts, n_gaussians: int):
    """Per-Gaussian sums of gid-sorted per-entry values — scatter-free.

    TPU scatter-add over millions of colliding rows is ~10× slower than a
    radix sort, so gradients arrive here already sorted by Gaussian id and
    segment sums come from a two-level MXU prefix (triangular-matmul cumsums
    over 128-entry chunks + a chunk-total prefix) differenced at the segment
    boundaries `gid_starts`, which binning computes in closed form from the
    emission counts.

    values: (E, F) sorted so equal gids are contiguous; gid_starts: (N+1,)
    segment boundaries into that order. Returns (N, F).
    """
    E, F = values.shape
    CH = 128
    assert E % CH == 0, "entry capacity is block-aligned"
    v3 = values.reshape(E // CH, CH, F)
    intra = _tri_cumsum(v3)                        # (C, CH, F)
    chunk_tot = intra[:, -1, :]                    # (C, F)
    C = chunk_tot.shape[0]
    # Chunk-level prefix, itself two-level when C is large.
    pad_c = (-C) % CH
    ct = jnp.pad(chunk_tot, ((0, pad_c), (0, 0))).reshape(-1, CH, F)
    ct_intra = _tri_cumsum(ct)                     # (C2, CH, F)
    ct_tot = ct_intra[:, -1, :]
    ct_base = jnp.cumsum(ct_tot, axis=0) - ct_tot  # (C2, F) — small
    chunk_incl = (ct_intra + ct_base[:, None, :]).reshape(-1, F)[:C]
    chunk_excl = chunk_incl - chunk_tot
    total = chunk_incl[-1]

    def prefix_at(pos):
        """P(pos) = sum of the first `pos` entries; pos: (N,) in [0, E]."""
        c = jnp.clip(pos // CH, 0, E // CH - 1)
        r = pos % CH
        base = chunk_excl[c]
        intra_part = jnp.where((r > 0)[:, None],
                               intra[c, jnp.clip(r - 1, 0, CH - 1)], 0.0)
        return jnp.where((pos >= E)[:, None], total[None, :],
                         base + intra_part)

    return prefix_at(gid_starts[1:]) - prefix_at(gid_starts[:-1])


def _sort_by_gid(gid, values):
    """Radix-sort (E, F) rows by their Gaussian id. Carrying the columns as
    sort payloads (~0.3 ms/column) beats any E-row-table gather or
    scatter-add by an order of magnitude on TPU."""
    F = values.shape[1]
    # Unstable: segment sums are order-invariant within a gid segment, and
    # the unstable sort is ~3× faster than the stable one on TPU.
    ops = jax.lax.sort(
        (gid,) + tuple(values[:, i] for i in range(F)),
        num_keys=1, is_stable=False)
    return jnp.stack(ops[1:], axis=1)


def _pack_bf16_pairs(cols):
    """k f32 columns → ceil(k/2) uint32 columns of two bf16 halves."""
    outs = []
    for i in range(0, len(cols), 2):
        a = jax.lax.bitcast_convert_type(
            cols[i].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        if i + 1 < len(cols):
            b = jax.lax.bitcast_convert_type(
                cols[i + 1].astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
        else:
            b = jnp.zeros_like(a)
        outs.append((a << 16) | b)
    return outs


def _unpack_bf16_pairs(packed, k):
    cols = []
    for v in packed:
        cols.append(jax.lax.bitcast_convert_type(
            (v >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32))
        cols.append(jax.lax.bitcast_convert_type(
            (v & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32))
    return cols[:k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gather_payload(table, gid, gid_starts, image_only: bool = False,
                    pack_bf16: bool = False):
    """Differentiable per-entry row gather from the small (N+1, F) feature
    table (last row zeros = dummy/null sentinel). Its VJP sorts the entry
    gradients by Gaussian id and segment-reduces them — never an E-row-table
    gather or a colliding scatter.

    Contract: only the payload columns [0, F_PSIZE] are differentiable —
    the pad columns must carry zero cotangents (the compositor's bwd kernel
    never writes them), and their table gradient is returned as zero.
    With pack_bf16, gradient columns ride the sort as bf16 pairs (see
    RasterSettings.grad_pack_bf16)."""
    return table[gid]


def _gather_payload_fwd(table, gid, gid_starts, image_only: bool = False,
                        pack_bf16: bool = False):
    return table[gid], (table.shape[0], gid, gid_starts)


def _gather_payload_bwd(image_only, pack_bf16, res, g):
    n1, gid, gid_starts = res
    # Only the differentiable payload columns ride the sort — one contiguous
    # slice now that the VALID flag is gone (pad columns, and depth/psize
    # under image-only grads, carry structurally-zero cotangents) — each
    # sort operand costs ~1 ms at bench entry counts.
    last = comp.F_B if image_only else comp.F_PSIZE
    if pack_bf16:
        k = last + 1
        packed = _pack_bf16_pairs([g[:, i] for i in range(k)])
        ops = jax.lax.sort((gid,) + tuple(packed), num_keys=1,
                           is_stable=False)
        g_sorted = jnp.stack(_unpack_bf16_pairs(ops[1:], k), axis=1)
    else:
        g_sorted = _sort_by_gid(gid, g[:, :last + 1])
    d_live = _segmented_sums(g_sorted, gid_starts, n1 - 1)
    n = n1 - 1
    d = jnp.concatenate([
        d_live, jnp.zeros((n, g.shape[1] - last - 1), g.dtype)], axis=1)
    d_table = jnp.concatenate([d, jnp.zeros((1, g.shape[1]), g.dtype)], 0)

    def _f0(shape):
        import numpy as _np
        return _np.zeros(shape, dtype=jax.dtypes.float0)

    return (d_table, _f0(gid.shape), _f0(gid_starts.shape))


_gather_payload.defvjp(_gather_payload_fwd, _gather_payload_bwd)


class CompositeResult(NamedTuple):
    image: jnp.ndarray          # (H, W, 3) without bg
    depth: jnp.ndarray
    acc_pixel_size: jnp.ndarray
    transmittance: jnp.ndarray
    contributed: jnp.ndarray    # (N,) bool
    num_entries: jnp.ndarray
    overflow: jnp.ndarray


def composite_pipeline(pre, width: int, height: int,
                       settings: RasterSettings) -> CompositeResult:
    """Everything after preprocess: bin → gather payload → composite →
    unpack. Factored out so the sharded renderer (dist/shard.py) can run it
    per tile-stripe on stripe-shifted preprocess outputs."""
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    tiles = tiles_x * tiles_y
    N = pre.depths.shape[0]

    binned = bin_gaussians(
        jax.tree_util.tree_map(jax.lax.stop_gradient, pre),
        width, height, settings.entry_cap, row_tight=settings.row_tight)

    # One stack + pad row (not a chain of column scatters). Column order is
    # the comp.F_* layout; no VALID column — the sentinel row's opacity 0
    # fails the α ≥ 1/255 selection test, which nulls dummy/truncated
    # entries identically.
    cols = jnp.stack([
        pre.means2d[:, 0], pre.means2d[:, 1],
        pre.conics[:, 0], pre.conics[:, 1], pre.conics[:, 2],
        pre.opacities,
        pre.colors[:, 0], pre.colors[:, 1], pre.colors[:, 2],
        pre.depths, pre.pixel_sizes,
    ] + [jnp.zeros((N,), jnp.float32)] * (comp.NFEAT - comp.F_PSIZE - 1),
        axis=1)
    feats = jnp.concatenate(
        [cols, jnp.zeros((1, comp.NFEAT), jnp.float32)], axis=0)

    entry_feat = _gather_payload(feats, binned.gauss_id, binned.gid_starts,
                                 settings.image_grads_only,
                                 settings.grad_pack_bf16)
    payload = entry_feat.reshape(-1, BLOCK, comp.NFEAT)

    backend = _resolve_backend(settings.backend)
    fn = comp.composite if backend == "pallas" else comp.composite_reference
    tiles_out = fn(payload, binned.sub_tile, binned.sub_valid,
                   binned.tile_last_sub, tiles, tiles_x, width,
                   height, settings.image_grads_only, settings.bwd_bf16)

    # tiles_out: (T, NOUT, 256) channel-major → (H, W, NOUT).
    empty_init = jnp.zeros((comp.NOUT,), jnp.float32).at[comp.O_T].set(1.0)
    tiles_out = jnp.where(
        binned.tile_nonempty[:, None, None], tiles_out, empty_init[:, None])
    full = tiles_out.reshape(tiles_y, tiles_x, comp.NOUT, TILE, TILE)
    full = full.transpose(0, 3, 1, 4, 2).reshape(
        tiles_y * TILE, tiles_x * TILE, comp.NOUT)[:height, :width]

    # Contribution flags at the reference's preprocess-level semantics: the
    # CUDA fork reports pixel_sizes per Gaussian from its preprocess stage
    # (train.py:206,245 masks only by radii > 0), so "contributing" =
    # survived culling/filters and emitted ≥1 packed entry — NOT the
    # post-composite w > 0 test (an occluded splat still reports its
    # footprint in the reference). Closed form from the binning segment
    # boundaries; replaces a per-forward 2-operand sort + segmented
    # reduction (~3 ms at 1080p).
    contributed = jnp.diff(binned.gid_starts) > 0

    return CompositeResult(
        image=full[..., comp.O_R:comp.O_B + 1],
        depth=full[..., comp.O_DEPTH],
        acc_pixel_size=full[..., comp.O_ACC],
        transmittance=full[..., comp.O_T],
        contributed=contributed,
        num_entries=binned.num_entries,
        overflow=binned.overflow,
    )


def rasterize(
    camera,
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
    bg: Optional[jnp.ndarray] = None,
    live_mask: Optional[jnp.ndarray] = None,
    means2d_probe: Optional[jnp.ndarray] = None,
    fade_size: float = 0.0,
    max_pixel_sizes: Optional[jnp.ndarray] = None,
    min_pixel_sizes: Optional[jnp.ndarray] = None,
    base_mask: Optional[jnp.ndarray] = None,
    occ_multiplier: Optional[jnp.ndarray] = None,
    dc_delta: Optional[jnp.ndarray] = None,
    reso_lvl: int = 0,
    settings: RasterSettings = RasterSettings(),
) -> RenderOutput:
    H, W = camera.height, camera.width

    pre = preprocess(
        camera, means3d, opacities,
        shs=shs, colors_precomp=colors_precomp,
        scales=scales, quats=quats, cov3d_precomp=cov3d_precomp,
        active_sh_degree=active_sh_degree, scale_modifier=scale_modifier,
        live_mask=live_mask, means2d_probe=means2d_probe,
        filter_small=settings.filter_small, filter_large=settings.filter_large,
        fade_ungated=settings.fade_ungated,
        fade_size=fade_size, max_pixel_sizes=max_pixel_sizes,
        min_pixel_sizes=min_pixel_sizes, base_mask=base_mask,
        occ_multiplier=occ_multiplier, dc_delta=dc_delta, reso_lvl=reso_lvl)

    res = composite_pipeline(pre, W, H, settings)

    if settings.image_grads_only:
        # Match the backward kernel's structural assumption (and the
        # reference's training contract): only the image differentiates.
        # Transmittance stays differentiable — its cotangent from the
        # `T·bg` background term below rides the cheap per-tile constant
        # row; depth/acc would cost two extra sort operands per step.
        res = res._replace(
            depth=jax.lax.stop_gradient(res.depth),
            acc_pixel_size=jax.lax.stop_gradient(res.acc_pixel_size))

    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    image = res.image + res.transmittance[..., None] * bg
    pixel_sizes = jnp.where(res.contributed, pre.pixel_sizes, 0.0)

    return RenderOutput(
        image=image,
        depth=res.depth,
        acc_pixel_size=res.acc_pixel_size,
        transmittance=res.transmittance,
        radii=pre.radii,
        pixel_sizes=pixel_sizes,
        visible=pre.radii > 0,
        num_entries=res.num_entries,
        overflow=res.overflow,
    )
