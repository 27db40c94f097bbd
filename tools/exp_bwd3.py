"""Round-4 bwd inefficiency hunt: the backward measures ~24 ms where op
counts predict ~14. Suspects: (a) 16 per-column (BLOCK,1) stores into the
(BLOCK,16) dpay block (each a lane-strided relayout), (b) materialized
(BLOCK,NPIX) g_rows/sfx broadcasts, (c) the double dpay write (pre-zero +
store). Variants measured against bwd/geom_vpu (24.11 ms):

  colstore   : geom_vpu as-is (control, re-measured)
  catstore   : all 9 grad columns concatenated once, single (BLOCK,16) store
  nozero     : dpay zeroing only in the dead branch (no double write)
  nogrows    : phi/dfeat/sfx via implicit (1,NPIX) broadcasts per sub
               (no materialized (BLOCK,NPIX) g_rows), full-width elsewhere
  all        : catstore + nozero + nogrows

Usage: python tools/exp_bwd3.py
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
    b_cap = payload.shape[0]

    def timeit(name, jf, *a, n=15):
        try:
            r = jf(*a)
            float(np.asarray(r))
        except Exception as e:
            print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:160]}",
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
        print(f"{name:12s}: {(t_n - t_1)/(n-1)*1000:7.2f} ms", flush=True)

    def bwd_kernel(st_ref, sv_ref, payload_ref, *rest, catstore, nozero,
                   nogrows):
        cst_refs = rest[:comp.SPG]
        dpay_ref, state_ref = rest[comp.SPG], rest[comp.SPG + 1]
        s = pl.program_id(0)
        nf_phi = 3
        if not nozero:
            dpay_ref[...] = jnp.zeros((comp.GROUP, BLOCK, NFEAT), jnp.float32)
        for g in range(comp.GROUP):
            b = s * comp.GROUP + g
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

            if nozero:
                @pl.when(jnp.logical_not(live))
                def _():
                    dpay_ref[g] = jnp.zeros((BLOCK, NFEAT), jnp.float32)

            @pl.when(live)
            def _():
                feat = payload_ref[g]
                ctx = comp._BlockCtx(feat, tids, prev, nf,
                                     state_ref[0:1, :], state_ref[1:2, :],
                                     tiles_x, W, H)
                csts = [cst_refs[g * NSUB_ + k][0] for k in range(NSUB_)]
                t_i = ctx.t_in * ctx.cum_excl
                w = ctx.w
                if nogrows:
                    phi_subs, df_subs, sfx_subs = [], [], []
                    for k in range(NSUB_):
                        rows = slice(k * SUB, (k + 1) * SUB)
                        pk = csts[k][0:1, :] * feat[rows, comp.F_R:comp.F_R + 1]
                        for c in range(1, nf_phi):
                            pk = pk + csts[k][c:c + 1, :] * \
                                feat[rows, comp.F_R + c:comp.F_R + c + 1]
                        phi_subs.append(pk)
                        df_subs.append(jnp.stack([
                            jnp.sum(w[rows] * csts[k][c:c + 1, :], axis=1)
                            for c in range(nf_phi)], axis=1))  # (SUB, nf)
                        sfx_subs.append(jnp.broadcast_to(
                            csts[k][comp.C_TPHI:comp.C_TPHI + 1, :]
                            + csts[k][comp.C_TFGT:comp.C_TFGT + 1, :],
                            (SUB, NPIX)))
                    phi = jnp.concatenate(phi_subs, axis=0)
                    dfeat = jnp.concatenate(df_subs, axis=0)  # (BLOCK, nf)
                    sfx_c = jnp.concatenate(sfx_subs, axis=0)
                else:
                    g_rows = [comp._sub_rows(
                        [csts[k][c:c + 1, :] for k in range(NSUB_)])
                        for c in range(nf_phi)]
                    phi = g_rows[0] * feat[:, comp.F_R:comp.F_R + 1]
                    for c in range(1, nf_phi):
                        phi = phi + g_rows[c] * feat[:, comp.F_R + c:
                                                     comp.F_R + c + 1]
                    dfeat = jnp.concatenate(
                        [jnp.sum(w * g_rows[c], axis=1, keepdims=True)
                         for c in range(nf_phi)], axis=1)
                    sfx_c = comp._sub_rows([
                        c[comp.C_TPHI:comp.C_TPHI + 1, :]
                        + c[comp.C_TFGT:comp.C_TFGT + 1, :] for c in csts])
                p_rows = jnp.where(ctx.carried, state_ref[2:3, :], 0.0)
                loc = comp._sub_cumsum_static(w * phi)
                carries = comp._chain_carries(loc, ctx.fresh, "add")
                prefix = p_rows + jnp.concatenate(
                    [loc[k * SUB:(k + 1) * SUB] + carries[k]
                     for k in range(NSUB_)], axis=0)
                suffix = sfx_c - prefix
                d_alpha = (t_i * phi - suffix / ctx.f) * ctx.alive * \
                    ctx.mask.astype(jnp.float32)
                unclamped = (ctx.alpha_raw < comp.ALPHA_MAX
                             ).astype(jnp.float32)
                d_power = d_alpha * ctx.alpha * unclamped
                pxl_r, pyl_r = comp._local_pix()
                dp_x = d_power * pxl_r
                dp_y = d_power * pyl_r
                d_q20 = jnp.sum(dp_x * pxl_r, axis=1, keepdims=True)
                d_q11 = jnp.sum(dp_x * pyl_r, axis=1, keepdims=True)
                d_q02 = jnp.sum(dp_y * pyl_r, axis=1, keepdims=True)
                d_q10 = jnp.sum(dp_x, axis=1, keepdims=True)
                d_q01 = jnp.sum(dp_y, axis=1, keepdims=True)
                d_q00 = jnp.sum(d_power, axis=1, keepdims=True)
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
                if catstore:
                    if nogrows:
                        dfc = dfeat
                    else:
                        dfc = dfeat
                    dpay_ref[g] = jnp.concatenate(
                        [d_mx, d_my, d_cxx, d_cxy, d_cyy, d_op, dfc,
                         jnp.zeros((BLOCK, NFEAT - 6 - nf_phi), jnp.float32)],
                        axis=1)
                else:
                    dpay_ref[g, :, comp.F_MX] = d_mx[:, 0]
                    dpay_ref[g, :, comp.F_MY] = d_my[:, 0]
                    dpay_ref[g, :, comp.F_CXX] = d_cxx[:, 0]
                    dpay_ref[g, :, comp.F_CXY] = d_cxy[:, 0]
                    dpay_ref[g, :, comp.F_CYY] = d_cyy[:, 0]
                    dpay_ref[g, :, comp.F_OP] = d_op[:, 0]
                    for i in range(nf_phi):
                        dpay_ref[g, :, comp.F_R + i] = dfeat[:, i:i + 1][:, 0]
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

    def make(catstore, nozero, nogrows):
        def cst_spec(j):
            return pl.BlockSpec(
                (1, 8, NPIX),
                lambda s, st, sv, j=j: (st[s * comp.SPG + j], 0, 0),
                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b_cap // comp.GROUP,),
            in_specs=[pl.BlockSpec((comp.GROUP, BLOCK, NFEAT),
                                   lambda s, st, sv: (s, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [cst_spec(j) for j in range(comp.SPG)],
            out_specs=[pl.BlockSpec((comp.GROUP, BLOCK, NFEAT),
                                    lambda s, st, sv: (s, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((4, NPIX), jnp.float32)],
        )
        f = pl.pallas_call(
            functools.partial(bwd_kernel, catstore=catstore, nozero=nozero,
                              nogrows=nogrows),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(payload.shape, jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )
        return jax.jit(lambda st, sv, p: jnp.sum(
            f(st, sv, p, *([cst_t] * comp.SPG))[0][::64]))

    print("=== bwd store/broadcast variants (geom_vpu control 24.11) ===",
          flush=True)
    timeit("colstore", make(False, False, False),
           binned.sub_tile, binned.sub_valid, payload)
    timeit("catstore", make(True, False, False),
           binned.sub_tile, binned.sub_valid, payload)
    timeit("nozero", make(False, True, False),
           binned.sub_tile, binned.sub_valid, payload)
    timeit("nogrows", make(False, False, True),
           binned.sub_tile, binned.sub_valid, payload)
    timeit("all", make(True, True, True),
           binned.sub_tile, binned.sub_valid, payload)


if __name__ == "__main__":
    main()
