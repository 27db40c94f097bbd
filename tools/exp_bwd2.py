"""Round-4 follow-up A/Bs for the compositor rework.

Variants measured at bench shapes (payload/binning from the real pipeline):

  fwd/horner     : power via per-entry Horner coefficients (6 FMA-shaped
                   (BLOCK,NPIX) ops) instead of dx/dy quadratic (11 ops)
  bwd/geom_vpu   : dcoef via 6 VPU multiply + lane-reductions instead of
                   the (128,256)@(256,8) HIGHEST 6-pass MXU matmul
  bwd/cst_dense  : per-sub backward constants pre-materialized as a dense
                   (S_cap, 8, NPIX) sequential stream instead of SPG
                   dynamic-index 8KB fetches
  bwd/g16        : GROUP=16 for the backward only

Usage: python tools/exp_bwd2.py
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
    from msgs.kernels.binning import BLOCK, bin_gaussians
    from msgs.kernels.preprocess import preprocess

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
    payload = jax.block_until_ready(jax.jit(
        lambda f, g: f[g].reshape(-1, BLOCK, comp.NFEAT))(
        feats, binned.gauss_id))
    tiles_x = (W + 15) // 16
    tiles = tiles_x * ((H + 15) // 16)
    NPIX, NOUT, NFEAT, SUB, NSUB_ = (comp.NPIX, comp.NOUT, comp.NFEAT,
                                     comp.SUB, comp.NSUB)

    def timeit(name, jf, *a, n=15):
        try:
            r = jf(*a)
            float(np.asarray(r))
        except Exception as e:
            print(f"{name:24s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None
        t0 = time.perf_counter()
        for _ in range(n):
            r = jf(*a)
        float(np.asarray(r))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(jf(*a)))
        t_1 = time.perf_counter() - t0
        print(f"{name:24s}: {(t_n - t_1)/(n-1)*1000:7.2f} ms", flush=True)

    # ---------- forward: Horner power ----------
    def fwd_horner_kernel(st_ref, sv_ref, payload_ref, out_ref, state_ref):
        s = pl.program_id(0)
        px = (jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1) % 16
              ).astype(jnp.float32)
        py = (jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1) // 16
              ).astype(jnp.float32)
        for g in range(comp.GROUP):
            b = s * comp.GROUP + g
            sb0 = b * NSUB_
            compute = sv_ref[sb0] == 1

            @pl.when(compute)
            def _():
                feat = payload_ref[g]
                mx = feat[:, 0:1]
                my = feat[:, 1:2]
                cxx, cxy, cyy = feat[:, 2:3], feat[:, 3:4], feat[:, 4:5]
                op = feat[:, 5:6]
                # Horner coefficients (per-entry, tile-local origin assumed 0
                # here; the full kernel folds tile origins into mx/my).
                a = -0.5 * cxx
                bq = -cxy
                c = -0.5 * cyy
                d = cxx * mx + cxy * my
                e = cyy * my + cxy * mx
                f0 = -0.5 * (cxx * mx * mx + cyy * my * my) - cxy * mx * my
                u = a * px + d
                v = c * py + e
                power = (u + bq * py) * px + v * py + f0
                g_ = jnp.exp(power)
                alpha_raw = op * g_
                mask = (alpha_raw >= comp.ALPHA_MIN) & (power <= 0.0)
                alpha = jnp.where(mask, jnp.minimum(alpha_raw,
                                                    comp.ALPHA_MAX), 0.0)
                fr = 1.0 - alpha
                cum = comp._sub_cumprod_static(fr)
                row = comp._sub_row_iota(BLOCK)
                excl = jnp.where(row >= 1, jnp.concatenate(
                    [jnp.ones((1, NPIX), jnp.float32), cum[:-1]], 0), 1.0)
                alive = (cum >= comp.T_EPS).astype(jnp.float32)
                w = alpha * excl * alive
                acc = jnp.stack([
                    jnp.sum(feat[:, comp.F_R + i:comp.F_R + i + 1] * w,
                            axis=0) for i in range(5)], axis=0)
                state_ref[0:5, :] += acc
                out_ref[g * NSUB_] = state_ref[:]

    b_cap = payload.shape[0]

    def make_simple(kern, n_extra=0, extras=()):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b_cap // comp.GROUP,),
            in_specs=[pl.BlockSpec((comp.GROUP, BLOCK, NFEAT),
                                   lambda s, st, sv: (s, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((comp.SPG, NOUT, NPIX),
                                    lambda s, st, sv: (s, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((NOUT, NPIX), jnp.float32)],
        )
        f = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((b_cap * NSUB_, NOUT, NPIX),
                                            jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )
        return jax.jit(lambda st, sv, p: jnp.sum(f(st, sv, p)[0][::64]))

    print("=== forward power form (pairs_only was 10.28) ===", flush=True)
    timeit("fwd/horner", make_simple(fwd_horner_kernel),
           binned.sub_tile, binned.sub_valid, payload)

    # ---------- backward variants ----------
    res = jax.jit(lambda p, st, sv, tl: comp.composite(
        p, st, sv, tl, tiles, tiles_x, W, H))(
        payload, binned.sub_tile, binned.sub_valid, binned.tile_last_sub)
    cot = jnp.ones((tiles, NOUT, NPIX), jnp.float32) * 0.1
    g_c = cot[:, 0:3, :]
    total_phi = jnp.sum(res[:, 0:3, :] * g_c, axis=1, keepdims=True)
    tf_gt = res[:, 5:6, :] * cot[:, 5:6, :]
    cst_t = jnp.concatenate(
        [g_c, cot[:, 3:4, :], cot[:, 4:5, :], total_phi, tf_gt,
         jnp.zeros_like(tf_gt)], axis=1)

    def bwd_kernel_var(st_ref, sv_ref, payload_ref, *rest, group,
                       geom_vpu, cst_dense):
        if cst_dense:
            cst_ref, dpay_ref, state_ref = rest[0], rest[1], rest[2]
        else:
            cst_refs = rest[:group * NSUB_]
            dpay_ref, state_ref = rest[group * NSUB_], rest[group * NSUB_ + 1]
        s = pl.program_id(0)
        nf_phi = 3
        basis = comp._local_basis_t()
        dpay_ref[...] = jnp.zeros((group, BLOCK, NFEAT), jnp.float32)
        for g in range(group):
            b = s * group + g
            sb0 = b * NSUB_
            tids = [st_ref[sb0 + k] for k in range(NSUB_)]
            prev = st_ref[jnp.maximum(sb0 - 1, 0)]
            nf = sb0 > 0
            compute = sv_ref[sb0] == 1
            same_tile = nf
            for k in range(NSUB_):
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
                if cst_dense:
                    csts = [cst_ref[g * NSUB_ + k] for k in range(NSUB_)]
                else:
                    csts = [cst_refs[g * NSUB_ + k][0] for k in range(NSUB_)]
                t_i = ctx.t_in * ctx.cum_excl
                w = ctx.w
                g_rows = [comp._sub_rows(
                    [csts[k][c:c + 1, :] for k in range(NSUB_)])
                    for c in range(nf_phi)]
                phi = g_rows[0] * feat[:, comp.F_R:comp.F_R + 1]
                for c in range(1, nf_phi):
                    phi = phi + g_rows[c] * feat[:, comp.F_R + c:
                                                 comp.F_R + c + 1]
                dfeat_cols = [jnp.sum(w * g_rows[c], axis=1, keepdims=True)
                              for c in range(nf_phi)]
                p_rows = jnp.where(ctx.carried, state_ref[2:3, :], 0.0)
                loc = comp._sub_cumsum_static(w * phi)
                carries = comp._chain_carries(loc, ctx.fresh, "add")
                prefix = p_rows + jnp.concatenate(
                    [loc[k * SUB:(k + 1) * SUB] + carries[k]
                     for k in range(NSUB_)], axis=0)
                sfx_c = comp._sub_rows([
                    c[comp.C_TPHI:comp.C_TPHI + 1, :]
                    + c[comp.C_TFGT:comp.C_TFGT + 1, :] for c in csts])
                suffix = sfx_c - prefix
                d_alpha = (t_i * phi - suffix / ctx.f) * ctx.alive * \
                    ctx.mask.astype(jnp.float32)
                unclamped = (ctx.alpha_raw < comp.ALPHA_MAX
                             ).astype(jnp.float32)
                d_power = d_alpha * ctx.alpha * unclamped
                if geom_vpu:
                    pxr = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, NPIX), 1) % 16).astype(jnp.float32)
                    pyr = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, NPIX), 1) // 16).astype(jnp.float32)
                    dp_x = d_power * pxr
                    dp_y = d_power * pyr
                    d_q20 = jnp.sum(dp_x * pxr, axis=1, keepdims=True)
                    d_q11 = jnp.sum(dp_x * pyr, axis=1, keepdims=True)
                    d_q02 = jnp.sum(dp_y * pyr, axis=1, keepdims=True)
                    d_q10 = jnp.sum(dp_x, axis=1, keepdims=True)
                    d_q01 = jnp.sum(dp_y, axis=1, keepdims=True)
                    d_q00 = jnp.sum(d_power, axis=1, keepdims=True)
                else:
                    dcoef = comp._dot(d_power, basis)
                    d_q20, d_q11, d_q02 = (dcoef[:, 0:1], dcoef[:, 1:2],
                                           dcoef[:, 2:3])
                    d_q10, d_q01, d_q00 = (dcoef[:, 3:4], dcoef[:, 4:5],
                                           dcoef[:, 5:6])
                mxl, myl = ctx.mxl, ctx.myl
                cxx, cxy, cyy = ctx.cxx, ctx.cxy, ctx.cyy
                d_cxx = -0.5 * (d_q20 - 2.0 * mxl * d_q10 + mxl * mxl * d_q00)
                d_cyy = -0.5 * (d_q02 - 2.0 * myl * d_q01 + myl * myl * d_q00)
                d_cxy = -(d_q11 - myl * d_q10 - mxl * d_q01
                          + mxl * myl * d_q00)
                d_mx = cxx * (d_q10 - mxl * d_q00) + \
                    cxy * (d_q01 - myl * d_q00)
                d_my = cyy * (d_q01 - myl * d_q00) + \
                    cxy * (d_q10 - mxl * d_q00)
                d_op = jnp.where(ctx.op > 0.0,
                                 d_q00 / jnp.maximum(ctx.op, 1e-30), 0.0)
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
                for k in range(NSUB_):
                    frk = ctx.fresh[k] if k > 0 else \
                        jnp.logical_not(ctx.carried0)
                    rows = slice(k * SUB, (k + 1) * SUB)
                    tmin = jnp.min(jnp.where(ctx.alive[rows] > 0.0,
                                             ctx.t_after[rows], 2.0),
                                   axis=0, keepdims=True)
                    lastt = ctx.t_after[(k + 1) * SUB - 1:(k + 1) * SUB, :]
                    outside_k = ctx.outside[k * SUB:k * SUB + 1, :]
                    t_st = jnp.minimum(jnp.where(frk, 1.0, t_st), tmin)
                    done_st = jnp.maximum(
                        jnp.where(frk, outside_k, done_st),
                        (lastt < comp.T_EPS).astype(jnp.float32))
                state_ref[0:1, :] = t_st
                state_ref[1:2, :] = done_st
                state_ref[2:3, :] = prefix[BLOCK - 1:BLOCK, :]

    def make_bwd(group, geom_vpu, cst_dense):
        spg = group * NSUB_

        def cst_spec(j):
            return pl.BlockSpec(
                (1, 8, NPIX), lambda s, st, sv, j=j: (st[s * spg + j], 0, 0),
                memory_space=pltpu.VMEM)

        in_specs = [pl.BlockSpec((group, BLOCK, NFEAT),
                                 lambda s, st, sv: (s, 0, 0),
                                 memory_space=pltpu.VMEM)]
        if cst_dense:
            in_specs.append(pl.BlockSpec((spg, 8, NPIX),
                                         lambda s, st, sv: (s, 0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs += [cst_spec(j) for j in range(spg)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b_cap // group,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((group, BLOCK, NFEAT),
                                    lambda s, st, sv: (s, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((4, NPIX), jnp.float32)],
        )
        f = pl.pallas_call(
            functools.partial(bwd_kernel_var, group=group, geom_vpu=geom_vpu,
                              cst_dense=cst_dense),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(payload.shape, jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )
        if cst_dense:
            s_cap = b_cap * NSUB_

            def run(st, sv, p):
                dense = cst_t[jnp.clip(st, 0, tiles - 1)]   # (S_cap, 8, NPIX)
                return jnp.sum(f(st, sv, p, dense)[0][::64])
            return jax.jit(run)
        return jax.jit(
            lambda st, sv, p: jnp.sum(f(st, sv, p, *([cst_t] * spg))[0][::64]))

    print("=== backward variants (full was 26.49) ===", flush=True)
    timeit("bwd/geom_vpu", make_bwd(comp.GROUP, True, False),
           binned.sub_tile, binned.sub_valid, payload)
    timeit("bwd/cst_dense", make_bwd(comp.GROUP, False, True),
           binned.sub_tile, binned.sub_valid, payload)
    timeit("bwd/geom_vpu+cst_dense", make_bwd(comp.GROUP, True, True),
           binned.sub_tile, binned.sub_valid, payload)
    timeit("bwd/g16", make_bwd(16, False, False),
           binned.sub_tile, binned.sub_valid, payload)


if __name__ == "__main__":
    main()
