"""Micro-benchmarks for the round-4 MXU compositor rework.

Measures, at the real kernel's shapes (grid of 128-entry x 256-pixel
blocks, 14.4k blocks like the 1080p bench), the marginal cost of each
candidate formulation so the rework is built on measured numbers:

  base      : current fwd pair math (VPU power + exp + alpha + static
              cumprod + w + VPU acc) - the reference point
  pow_mxu   : power as one (128,8)@(8,256) NN matmul (tile-origin
              polynomial), rest unchanged
  exp2      : exp(power) -> exp2(power * log2e)
  scan_mxu  : the 32-segmented cumprod via log1p + block-diag lower-tri
              (128,128)@(128,256) matmul + exp
  acc_tn    : per-sub feature accumulation as a TN dot_general
              (contract over entries) instead of 5 broadcast-reduces
  dfeat_nt  : per-entry feature grads as an NT dot_general
              (contract over pixels) instead of lane reductions

Also probes whether Mosaic accepts TN / NT dot_general at these shapes
at all (falls back with a printed error if not).

Usage: python tools/exp_mxu.py [n_blocks]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK, NPIX, NFEAT, SUB = 128, 256, 16, 32
NSUB = BLOCK // SUB


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 14336

    rng = np.random.default_rng(0)
    payload = rng.uniform(0.1, 1.0, (B, BLOCK, NFEAT)).astype(np.float32)
    payload[:, :, 5] *= 0.5  # opacity col
    pay = jax.device_put(jnp.asarray(payload))

    def _basis_rows():
        p = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
        x = (p % 16).astype(jnp.float32)
        y = (p // 16).astype(jnp.float32)
        return jnp.concatenate(
            [x * x, x * y, y * y, x, y, jnp.ones((1, NPIX), jnp.float32),
             jnp.zeros((2, NPIX), jnp.float32)], axis=0)      # (8, NPIX)

    def _pix():
        p = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
        return (p % 16).astype(jnp.float32), (p // 16).astype(jnp.float32)

    def _cumprod_static(x):
        row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0) % SUB
        y = x
        k = 1
        while k < SUB:
            pad = jnp.ones((k, NPIX), x.dtype)
            ysh = jnp.concatenate([pad, y[:-k]], axis=0)
            y = y * jnp.where(row >= k, ysh, 1.0)
            k *= 2
        return y

    def _alpha_from_power(feat, power):
        op = feat[:, 5:6]
        g = jnp.exp(power)
        alpha_raw = op * g
        mask = (alpha_raw >= 1.0 / 255.0) & (power <= 0.0)
        return jnp.where(mask, jnp.minimum(alpha_raw, 0.99), 0.0)

    def _alpha_from_power_exp2(feat, power):
        op = feat[:, 5:6]
        g = jnp.exp2(power * np.float32(1.4426950408889634))
        alpha_raw = op * g
        mask = (alpha_raw >= 1.0 / 255.0) & (power <= 0.0)
        return jnp.where(mask, jnp.minimum(alpha_raw, 0.99), 0.0)

    def _power_vpu(feat, px, py):
        mx, my = feat[:, 0:1], feat[:, 1:2]
        cxx, cxy, cyy = feat[:, 2:3], feat[:, 3:4], feat[:, 4:5]
        dx = px - mx
        dy = py - my
        return -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy

    def _power_mxu(feat, basis, precision):
        mx, my = feat[:, 0:1], feat[:, 1:2]
        cxx, cxy, cyy = feat[:, 2:3], feat[:, 3:4], feat[:, 4:5]
        c_xx = -0.5 * cxx
        c_xy = -cxy
        c_yy = -0.5 * cyy
        c_x = cxx * mx + cxy * my
        c_y = cyy * my + cxy * mx
        c_1 = -0.5 * (cxx * mx * mx + cyy * my * my) - cxy * mx * my
        coeffs = jnp.concatenate(
            [c_xx, c_xy, c_yy, c_x, c_y, c_1,
             jnp.zeros((BLOCK, 2), jnp.float32)], axis=1)     # (BLOCK, 8)
        return jax.lax.dot_general(
            coeffs, basis, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def _w_from_alpha(alpha):
        f = 1.0 - alpha
        cum = _cumprod_static(f)
        cum_excl = jnp.concatenate(
            [jnp.ones((1, NPIX), jnp.float32), cum[:-1]], axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0) % SUB
        cum_excl = jnp.where(row >= 1, cum_excl, 1.0)
        alive = (cum >= 1e-4).astype(jnp.float32)
        return alpha * cum_excl * alive

    def _w_from_alpha_mxu(alpha, tri, precision):
        lf = jnp.log1p(-alpha)
        cs = jax.lax.dot_general(
            tri, lf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        cum = jnp.exp(cs)
        cum_excl = cum / jnp.maximum(1.0 - alpha, 1e-6)
        alive = (cum >= 1e-4).astype(jnp.float32)
        return alpha * cum_excl * alive

    def _acc_vpu(feat, w):
        outs = []
        for k in range(NSUB):
            rows = slice(k * SUB, (k + 1) * SUB)
            outs.append(jnp.stack([
                jnp.sum(feat[rows, 6 + i:7 + i] * w[rows], axis=0)
                for i in range(5)], axis=0))
        return sum(outs)

    def _acc_tn(feat, w, precision):
        # (BLOCK, 8) block-diag-masked features, contracted over entries:
        # acc = feat_masked^T @ w via dot_general contracting dim 0 x dim 0.
        row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0) // SUB
        cols = []
        for k in range(NSUB):
            m = (row == k).astype(jnp.float32)
            cols.append(feat[:, 6:14] * m)
        fm = jnp.concatenate(cols, axis=1)                    # (BLOCK, 32)
        return jax.lax.dot_general(
            fm, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def _dfeat_nt(w, g_rows, precision):
        # per-entry feature grads: contract over pixels (dim 1 x dim 1).
        return jax.lax.dot_general(
            w, g_rows, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def make_kernel(variant, precision=None):
        def kern(pay_ref, out_ref, acc_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                acc_ref[...] = jnp.zeros((8, NPIX), jnp.float32)
            feat = pay_ref[0]
            px, py = _pix()
            basis = _basis_rows()
            tri = ((jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
                    <= jax.lax.broadcasted_iota(
                        jnp.int32, (BLOCK, BLOCK), 0)) &
                   (jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
                    // SUB ==
                    jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
                    // SUB)).astype(jnp.float32)
            if variant == "empty":
                acc_ref[0:1, :] += feat[0:1, 6:7] * px
                out_ref[...] = acc_ref[...]
                return
            if variant in ("pow_mxu", "pow_mxu_x",):
                power = _power_mxu(feat, basis, precision)
            else:
                power = _power_vpu(feat, px, py)
            if variant == "exp2":
                alpha = _alpha_from_power_exp2(feat, power)
            else:
                alpha = _alpha_from_power(feat, power)
            if variant == "scan_mxu":
                w = _w_from_alpha_mxu(alpha, tri, precision)
            else:
                w = _w_from_alpha(alpha)
            if variant == "acc_tn":
                acc = _acc_tn(feat, w, precision)[:8]
            elif variant == "dfeat_nt":
                g_rows = jnp.broadcast_to(acc_ref[0:8, :], (8, NPIX))
                df = _dfeat_nt(w, g_rows, precision)          # (BLOCK, 8)
                acc = jax.lax.dot_general(
                    df[:, :8], basis, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)[:8] * 1e-6
            else:
                acc = _acc_vpu(feat, w)
            acc_ref[0:5, :] += acc[:5]
            out_ref[...] = acc_ref[...]
        return kern

    def run(variant, precision=None, n=20):
        kern = make_kernel(variant, precision)
        try:
            f = pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[pl.BlockSpec((1, BLOCK, NFEAT), lambda s: (s, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, NPIX), lambda s: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, NPIX), jnp.float32),
                scratch_shapes=[pltpu.VMEM((8, NPIX), jnp.float32)],
            )
            jf = jax.jit(lambda p: jnp.sum(f(p)))
            r = jf(pay)
            float(np.asarray(r))
        except Exception as e:
            print(f"{variant:12s} ({precision}): FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
            return None
        t0 = time.perf_counter()
        for _ in range(n):
            r = jf(pay)
        float(np.asarray(r))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(jf(pay)))
        t_1 = time.perf_counter() - t0
        ms = (t_n - t_1) / (n - 1) * 1000
        print(f"{variant:12s} ({precision}): {ms:7.2f} ms", flush=True)
        return ms

    import jax.lax as lax
    P = lax.Precision
    run("empty")
    run("base")
    run("base")
    run("exp2")
    run("pow_mxu", P.HIGHEST)
    run("pow_mxu", P.HIGH)
    run("scan_mxu", P.HIGHEST)
    run("scan_mxu", P.HIGH)
    run("acc_tn", P.HIGHEST)
    run("acc_tn", P.HIGH)
    run("dfeat_nt", P.HIGHEST)
    run("dfeat_nt", P.HIGH)


if __name__ == "__main__":
    main()
