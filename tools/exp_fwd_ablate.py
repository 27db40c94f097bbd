"""Ablate the real compositor kernels piece by piece at bench shapes.

The round-4 micro-bench (tools/exp_mxu.py) killed the MXU-alpha plan:
Mosaic f32 matmuls are HIGHEST-only (6 passes) and cost more than the VPU
ops they would replace, and the whole per-pair VPU math measures only
~4.1 ms of the 14.6 ms forward. This tool finds where the other ~10 ms
(and the backward's ~23 ms) actually go, by running the REAL kernels with
single pieces disabled.

Usage: python tools/exp_fwd_ablate.py [fwd|bwd|all]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from msgs.core.camera import make_camera
    from msgs.kernels import composite as comp
    from msgs.kernels import rasterize as rz
    from msgs.kernels.binning import BLOCK, bin_gaussians
    from msgs.kernels.preprocess import preprocess

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    W, H, N, ENTRY_CAP = 1920, 1080, 100_000, 1_572_864
    rng = np.random.default_rng(0)
    means = np.concatenate([
        rng.uniform(-3, 3, (N, 2)), rng.uniform(2, 12, (N, 1))],
        1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -2.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.8, W, H)
    args = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, cols))

    pre = jax.jit(lambda m, s, q, o, c: preprocess(
        cam, m, o, colors_precomp=c, scales=s, quats=q))(*args)
    binned = jax.jit(lambda p: bin_gaussians(p, W, H, ENTRY_CAP))(pre)

    Nn = pre.depths.shape[0]
    cols_t = jnp.stack([
        pre.means2d[:, 0], pre.means2d[:, 1],
        pre.conics[:, 0], pre.conics[:, 1], pre.conics[:, 2],
        pre.opacities,
        pre.colors[:, 0], pre.colors[:, 1], pre.colors[:, 2],
        pre.depths, pre.pixel_sizes,
    ] + [jnp.zeros((Nn,), jnp.float32)] * (comp.NFEAT - comp.F_PSIZE - 1),
        axis=1)
    feats = jnp.concatenate(
        [cols_t, jnp.zeros((1, comp.NFEAT), jnp.float32)], axis=0)
    payload = jax.jit(lambda f, g: f[g].reshape(-1, BLOCK, comp.NFEAT))(
        feats, binned.gauss_id)
    payload = jax.block_until_ready(payload)

    tiles_x = (W + 15) // 16
    tiles = tiles_x * ((H + 15) // 16)

    GROUP, NSUB, SPG = comp.GROUP, comp.NSUB, comp.SPG
    NPIX, NOUT, NFEAT = comp.NPIX, comp.NOUT, comp.NFEAT

    def timeit(name, jf, *a, n=15):
        try:
            r = jf(*a)
            float(np.asarray(jnp.sum(r) if hasattr(r, "shape") else r))
        except Exception as e:
            print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None
        t0 = time.perf_counter()
        for _ in range(n):
            r = jf(*a)
        float(np.asarray(jnp.sum(r) if hasattr(r, "shape") else r))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = jf(*a)
        float(np.asarray(jnp.sum(r) if hasattr(r, "shape") else r))
        t_1 = time.perf_counter() - t0
        ms = (t_n - t_1) / (n - 1) * 1000
        print(f"{name:28s}: {ms:7.2f} ms", flush=True)
        return ms

    # ---------------- forward variants ----------------
    def fwd_kernel_var(st_ref, sv_ref, payload_ref, out_ref, state_ref, *,
                       variant):
        s = pl.program_id(0)
        for g in range(GROUP):
            b = s * GROUP + g
            sb0 = b * NSUB
            tids = [st_ref[sb0 + k] for k in range(NSUB)]
            prev = st_ref[jnp.maximum(sb0 - 1, 0)]
            nf = sb0 > 0
            compute = sv_ref[sb0] == 1

            same_tile = nf
            for k in range(NSUB):
                same_tile = jnp.logical_and(same_tile, tids[k] == prev)
            saturated = (jnp.sum(state_ref[comp.O_DONE:comp.O_DONE + 1, :])
                         >= float(NPIX))
            skip = jnp.logical_and(same_tile, saturated)

            if variant == "dump_small":
                @pl.when(jnp.logical_and(compute, skip))
                def _():
                    out_ref[0] = state_ref[:]
            elif variant != "no_dump":
                @pl.when(jnp.logical_and(compute, skip))
                def _():
                    for k in range(NSUB):
                        out_ref[g * NSUB + k] = state_ref[:]

            @pl.when(jnp.logical_and(compute, jnp.logical_not(skip)))
            def _():
                feat = payload_ref[g]
                if variant.startswith("pairs"):
                    # alpha eval (+ scans + w + acc), no tile bookkeeping;
                    # pairs_noscan / pairs_noaccs / pairs_alpha drop pieces
                    # to split the pair-math pipeline cost.
                    px = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, NPIX), 1) % 16).astype(jnp.float32)
                    py = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, NPIX), 1) // 16).astype(jnp.float32)
                    alpha, _, _, _, _, _ = comp._alpha_terms(feat, px, py)
                    if variant == "pairs_alpha":
                        state_ref[0:1, :] += jnp.max(alpha, axis=0,
                                                     keepdims=True)
                        out_ref[g * NSUB] = state_ref[:]
                        return
                    if variant == "pairs_noscan":
                        w = alpha
                    else:
                        f = 1.0 - alpha
                        cum = comp._sub_cumprod_static(f)
                        row = comp._sub_row_iota(BLOCK)
                        excl = jnp.where(row >= 1, jnp.concatenate(
                            [jnp.ones((1, NPIX), jnp.float32), cum[:-1]], 0),
                            1.0)
                        alive = (cum >= comp.T_EPS).astype(jnp.float32)
                        w = alpha * excl * alive
                    if variant == "pairs_noaccs":
                        state_ref[0:1, :] += jnp.max(w, axis=0, keepdims=True)
                        out_ref[g * NSUB] = state_ref[:]
                        return
                    acc = jnp.stack([
                        jnp.sum(feat[:, comp.F_R + i:comp.F_R + i + 1] * w,
                                axis=0) for i in range(5)], axis=0)
                    state_ref[0:5, :] += acc
                    out_ref[g * NSUB] = state_ref[:]
                    return
                ctx = comp._BlockCtx(feat, tids, prev, nf,
                                     state_ref[comp.O_T:comp.O_T + 1, :],
                                     state_ref[comp.O_DONE:comp.O_DONE + 1, :],
                                     tiles_x, W, H)
                accs = comp._sub_accs(ctx, feat, ctx.w)
                if variant == "no_states":
                    # Skip the per-sub select chain: accumulate raw.
                    st = state_ref[:]
                    tot = accs[0]
                    for k in range(1, NSUB):
                        tot = tot + accs[k]
                    state_ref[0:5, :] = st[0:5, :] + tot
                    out_ref[g * NSUB] = state_ref[:]
                    return
                states = comp._sub_states(ctx, accs, state_ref)
                if variant == "no_dump":
                    state_ref[:] = states[NSUB - 1]
                    return
                if variant == "dump_last":
                    out_ref[g * NSUB] = states[NSUB - 1]
                    state_ref[:] = states[NSUB - 1]
                    return
                if variant == "dump_small":
                    out_ref[0] = states[NSUB - 1]
                    state_ref[:] = states[NSUB - 1]
                    return
                for k in range(NSUB):
                    out_ref[g * NSUB + k] = states[k]
                state_ref[:] = states[NSUB - 1]

    def make_fwd(variant):
        # small_out: same full compute, but the output array is ONE state
        # slot per grid step (32× less HBM out traffic) — Pallas flushes
        # out blocks whether or not the kernel stores to them, so only a
        # smaller out SHAPE can reveal what the (S_cap, 8, 256) dump stream
        # actually costs; this bounds the win of any dump-reduction scheme.
        small_out = variant == "small_out"
        kvariant = "dump_small" if small_out else variant
        b_cap = payload.shape[0]
        out_block = (1, NOUT, NPIX) if small_out else (SPG, NOUT, NPIX)
        out_shape = ((b_cap // GROUP, NOUT, NPIX) if small_out
                     else (b_cap * NSUB, NOUT, NPIX))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b_cap // GROUP,),
            in_specs=[pl.BlockSpec((GROUP, BLOCK, NFEAT),
                                   lambda s, st, sv: (s, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(out_block,
                                    lambda s, st, sv: (s, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((NOUT, NPIX), jnp.float32)],
        )
        f = pl.pallas_call(
            functools.partial(fwd_kernel_var, variant=kvariant),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(out_shape, jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )
        step = 2 if small_out else 64
        return jax.jit(lambda st, sv, p: jnp.sum(f(st, sv, p)[0][::step]))

    if which in ("fwd", "all"):
        print("=== forward ablations (real fwd: ~14.6) ===", flush=True)
        for v in ("full", "dump_last", "no_dump", "no_states",
                  "pairs_only", "pairs_noaccs", "pairs_noscan",
                  "pairs_alpha", "small_out"):
            timeit(f"fwd/{v}", make_fwd(v),
                   binned.sub_tile, binned.sub_valid, payload)

    # ---------------- backward variants ----------------
    res = jax.jit(lambda p, st, sv, tl: comp.composite(
        p, st, sv, tl, tiles, tiles_x, W, H))(
        payload, binned.sub_tile, binned.sub_valid, binned.tile_last_sub)
    cot = jnp.ones((tiles, NOUT, NPIX), jnp.float32) * 0.1

    # Shims for helpers that no longer live in composite.py (the r3 MXU
    # moment contraction was removed from the kernel; these keep the
    # ablation variants runnable — relative deltas are what matters).
    if not hasattr(comp, "_local_basis_t"):
        def _local_basis_t():
            p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 8), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 8), 1)
            x = (p % 16).astype(jnp.float32)
            y = (p // 16).astype(jnp.float32)
            cols = [x * x, x * y, y * y, x, y, jnp.ones_like(x)]
            out = jnp.zeros((NPIX, 8), jnp.float32)
            for i, v in enumerate(cols):
                out = jnp.where(c == i, v, out)
            return out
        comp._local_basis_t = _local_basis_t
        comp._dot = comp._bf16_dot

    def make_bwd(variant):
        image_only = True
        g_c = cot[:, comp.O_R:comp.O_B + 1, :]
        total_phi = jnp.sum(res[:, comp.O_R:comp.O_B + 1, :] * g_c, axis=1,
                            keepdims=True)
        tf_gt = res[:, comp.O_T:comp.O_T + 1, :] * cot[:, comp.O_T:comp.O_T + 1, :]
        cst_t = jnp.concatenate(
            [g_c, cot[:, 3:4, :], cot[:, 4:5, :], total_phi, tf_gt,
             jnp.zeros_like(tf_gt)], axis=1)

        b_cap = payload.shape[0]

        def bwd_var(st_ref, sv_ref, payload_ref, *rest):
            if variant == "no_cst":
                dpay_ref, state_ref = rest[0], rest[1]
                cst_refs = None
            else:
                cst_refs = rest[:SPG]
                dpay_ref, state_ref = rest[SPG], rest[SPG + 1]
            s = pl.program_id(0)
            nf_phi = 3
            basis = comp._local_basis_t()
            if variant != "no_dpay_zero":
                dpay_ref[...] = jnp.zeros((GROUP, BLOCK, NFEAT), jnp.float32)
            for g in range(GROUP):
                b = s * GROUP + g
                sb0 = b * NSUB
                tids = [st_ref[sb0 + k] for k in range(NSUB)]
                prev = st_ref[jnp.maximum(sb0 - 1, 0)]
                nf = sb0 > 0
                compute = sv_ref[sb0] == 1
                same_tile = nf
                for k in range(NSUB):
                    same_tile = jnp.logical_and(same_tile, tids[k] == prev)
                saturated = jnp.sum(state_ref[1:2, :]) >= float(NPIX)
                live = jnp.logical_and(
                    compute,
                    jnp.logical_not(jnp.logical_and(same_tile, saturated)))

                @pl.when(live)
                def _():
                    feat = payload_ref[g]
                    ctx = comp._BlockCtx(feat, tids, prev, nf,
                                         state_ref[0:1, :], state_ref[1:2, :],
                                         tiles_x, W, H)
                    if variant == "no_cst":
                        csts = [jnp.ones((8, NPIX), jnp.float32) * 0.1
                                for _ in range(NSUB)]
                    else:
                        csts = [cst_refs[g * NSUB + k][0]
                                for k in range(NSUB)]
                    t_i = ctx.t_in * ctx.cum_excl
                    w = ctx.w
                    if variant == "recompute_only":
                        dpay_ref[g, :, 0] = jnp.sum(w, axis=1)
                        return
                    g_rows = [comp._sub_rows(
                        [csts[k][comp.C_GR + c:comp.C_GR + c + 1, :]
                         for k in range(NSUB)]) for c in range(nf_phi)]
                    phi = g_rows[0] * feat[:, comp.F_R:comp.F_R + 1]
                    for c in range(1, nf_phi):
                        phi = phi + g_rows[c] * feat[:,
                                                     comp.F_R + c:comp.F_R + c + 1]
                    dfeat_cols = [jnp.sum(w * g_rows[c], axis=1,
                                          keepdims=True)
                                  for c in range(nf_phi)]
                    if variant == "no_prefix":
                        prefix = w * phi
                    else:
                        p_rows = jnp.where(ctx.carried, state_ref[2:3, :], 0.0)
                        loc = comp._sub_cumsum_static(w * phi)
                        carries = comp._chain_carries(loc, ctx.fresh, "add")
                        prefix = p_rows + jnp.concatenate(
                            [loc[k * comp.SUB:(k + 1) * comp.SUB] + carries[k]
                             for k in range(NSUB)], axis=0)
                    sfx_c = comp._sub_rows([
                        c[comp.C_TPHI:comp.C_TPHI + 1, :]
                        + c[comp.C_TFGT:comp.C_TFGT + 1, :] for c in csts])
                    suffix = sfx_c - prefix
                    d_alpha = (t_i * phi - suffix / ctx.f) * ctx.alive * \
                        ctx.mask.astype(jnp.float32)
                    unclamped = (ctx.alpha_raw < comp.ALPHA_MAX
                                 ).astype(jnp.float32)
                    d_power = d_alpha * ctx.alpha * unclamped
                    if variant == "no_geom":
                        dpay_ref[g, :, 0] = jnp.sum(d_power, axis=1)
                        for i in range(nf_phi):
                            dpay_ref[g, :, comp.F_R + i] = \
                                dfeat_cols[i][:, 0]
                        return
                    dcoef = comp._dot(d_power, basis)
                    d_q20, d_q11, d_q02 = (dcoef[:, 0:1], dcoef[:, 1:2],
                                           dcoef[:, 2:3])
                    d_q10, d_q01, d_q00 = (dcoef[:, 3:4], dcoef[:, 4:5],
                                           dcoef[:, 5:6])
                    mxl, myl = ctx.mxl, ctx.myl
                    cxx, cxy, cyy = ctx.cxx, ctx.cxy, ctx.cyy
                    d_cxx = -0.5 * (d_q20 - 2.0 * mxl * d_q10
                                    + mxl * mxl * d_q00)
                    d_cyy = -0.5 * (d_q02 - 2.0 * myl * d_q01
                                    + myl * myl * d_q00)
                    d_cxy = -(d_q11 - myl * d_q10 - mxl * d_q01
                              + mxl * myl * d_q00)
                    d_mx = cxx * (d_q10 - mxl * d_q00) + \
                        cxy * (d_q01 - myl * d_q00)
                    d_my = cyy * (d_q01 - myl * d_q00) + \
                        cxy * (d_q10 - mxl * d_q00)
                    d_op = jnp.where(ctx.op > 0.0,
                                     d_q00 / jnp.maximum(ctx.op, 1e-30), 0.0)
                    if variant == "geom_nostore":
                        # Full geometry math, single-column store: isolates
                        # the cost of the 9 per-column strided dpay stores.
                        dpay_ref[g, :, 0] = (
                            d_mx + d_my + d_cxx + d_cxy + d_cyy + d_op
                            + sum(dfeat_cols))[:, 0]
                        return
                    if variant == "geom_concat":
                        # One aligned (BLOCK, NFEAT) store from a lane-concat
                        # instead of 9 strided column stores.
                        cols = [d_mx, d_my, d_cxx, d_cxy, d_cyy, d_op]
                        cols += dfeat_cols[:nf_phi]
                        cols += [jnp.zeros((BLOCK, 1), jnp.float32)] * (
                            NFEAT - len(cols))
                        dpay_ref[g] = jnp.concatenate(cols, axis=1)
                        return
                    dpay_ref[g, :, comp.F_MX] = d_mx[:, 0]
                    dpay_ref[g, :, comp.F_MY] = d_my[:, 0]
                    dpay_ref[g, :, comp.F_CXX] = d_cxx[:, 0]
                    dpay_ref[g, :, comp.F_CXY] = d_cxy[:, 0]
                    dpay_ref[g, :, comp.F_CYY] = d_cyy[:, 0]
                    dpay_ref[g, :, comp.F_OP] = d_op[:, 0]
                    for i in range(nf_phi):
                        dpay_ref[g, :, comp.F_R + i] = dfeat_cols[i][:, 0]

                    t_st = state_ref[0:1, :]
                    done_st = state_ref[1:2, :]
                    for k in range(NSUB):
                        fr = ctx.fresh[k] if k > 0 else \
                            jnp.logical_not(ctx.carried0)
                        rows = slice(k * comp.SUB, (k + 1) * comp.SUB)
                        tmin = jnp.min(jnp.where(ctx.alive[rows] > 0.0,
                                                 ctx.t_after[rows], 2.0),
                                       axis=0, keepdims=True)
                        lastt = ctx.t_after[(k + 1) * comp.SUB - 1:
                                            (k + 1) * comp.SUB, :]
                        outside_k = ctx.outside[k * comp.SUB:k * comp.SUB + 1, :]
                        t_st = jnp.minimum(jnp.where(fr, 1.0, t_st), tmin)
                        done_st = jnp.maximum(
                            jnp.where(fr, outside_k, done_st),
                            (lastt < comp.T_EPS).astype(jnp.float32))
                    state_ref[0:1, :] = t_st
                    state_ref[1:2, :] = done_st
                    state_ref[2:3, :] = prefix[BLOCK - 1:BLOCK, :]

        def cst_spec(j):
            return pl.BlockSpec(
                (1, 8, NPIX), lambda s, st, sv, j=j: (st[s * SPG + j], 0, 0),
                memory_space=pltpu.VMEM)

        n_cst = 0 if variant == "no_cst" else SPG
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b_cap // GROUP,),
            in_specs=[pl.BlockSpec((GROUP, BLOCK, NFEAT),
                                   lambda s, st, sv: (s, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [cst_spec(j) for j in range(n_cst)],
            out_specs=[pl.BlockSpec((GROUP, BLOCK, NFEAT),
                                    lambda s, st, sv: (s, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((4, NPIX), jnp.float32)],
        )
        f = pl.pallas_call(
            functools.partial(bwd_var),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(payload.shape, jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )
        if variant == "no_cst":
            return jax.jit(lambda st, sv, p: jnp.sum(f(st, sv, p)[0][::64]))
        return jax.jit(
            lambda st, sv, p: jnp.sum(f(st, sv, p, *([cst_t] * SPG))[0][::64]))

    if which in ("bwd", "all"):
        print("=== backward ablations (real bwd: ~27 incl. residual prep) ===",
              flush=True)
        for v in ("full", "geom_nostore", "geom_concat", "no_geom",
                  "no_prefix", "recompute_only"):
            timeit(f"bwd/{v}", make_bwd(v),
                   binned.sub_tile, binned.sub_valid, payload)


if __name__ == "__main__":
    main()
