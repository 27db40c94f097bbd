"""Stage-by-stage TPU profiling of the rasterizer at bench shapes.

Usage: python tools/profile_stages.py [N] [W] [H] [entry_cap_pow]
"""
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

    from msgs.core.camera import make_camera
    from msgs.kernels import composite as comp
    import importlib
    rz = importlib.import_module('msgs.kernels.rasterize')
    from msgs.kernels.binning import BLOCK, bin_gaussians, entry_capacity
    from msgs.kernels.preprocess import preprocess

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    ENTRY_CAP = 1 << (int(sys.argv[4]) if len(sys.argv) > 4 else 21)

    rng = np.random.default_rng(0)
    means = np.concatenate([
        rng.uniform(-3, 3, (N, 2)), rng.uniform(2, 12, (N, 1))],
        1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -2.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.8, W, H)
    args = tuple(jnp.asarray(a)
                 for a in (means, scales, quats, opac, cols))

    def timeit(name, f, *a, n=10):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(*a))
        print(f"{name} first: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        jax.block_until_ready(r)
        print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms",
              flush=True)
        return r

    pre_f = jax.jit(lambda m, s, q, o, c: preprocess(
        cam, m, o, colors_precomp=c, scales=s, quats=q))
    pre = timeit("preprocess", pre_f, *args)
    bin_f = jax.jit(lambda p: bin_gaussians(p, W, H, ENTRY_CAP))
    binned = timeit("binning", bin_f, pre)

    def gather_f(pre, binned):
        Nn = pre.depths.shape[0]
        feats = jnp.zeros((Nn, comp.NFEAT), jnp.float32)
        feats = feats.at[:, comp.F_MX].set(pre.means2d[:, 0])
        feats = feats.at[:, comp.F_R:comp.F_B + 1].set(pre.colors)
        ids = binned.gauss_id
        valid = ids >= 0
        idc = jnp.maximum(ids, 0)
        ef = rz._take_entry_rows(feats, idc, valid, binned.by_gid_perm,
                                 binned.gid_starts)
        return ef.reshape(-1, BLOCK, comp.NFEAT)
    payload = timeit("gather+pack", jax.jit(gather_f), pre, binned)
    print("entries:", int(binned.num_entries), "payload:", payload.shape,
          flush=True)

    def gather_bwd(pre, binned):
        def f(feats):
            ids = binned.gauss_id
            valid = ids >= 0
            idc = jnp.maximum(ids, 0)
            ef = rz._take_entry_rows(feats, idc, valid, binned.by_gid_perm,
                                     binned.gid_starts)
            return jnp.sum(ef)
        Nn = pre.depths.shape[0]
        feats = jnp.zeros((Nn, comp.NFEAT), jnp.float32)
        return jax.grad(f)(feats)
    timeit("gather vjp", jax.jit(gather_bwd), pre, binned)

    tiles_x = (W + 15) // 16
    tiles = tiles_x * ((H + 15) // 16)
    fwd_f = jax.jit(lambda p, bt, bv: comp.composite(
        p, bt, bv, tiles, tiles_x, W, H))
    out = timeit("composite fwd", fwd_f, payload, binned.block_tile,
                 binned.block_valid)

    def bwd_f(p, bt, bv):
        def g(p):
            o, c = comp.composite(p, bt, bv, tiles, tiles_x, W, H)
            return jnp.sum(o[:, :5])
        return jax.grad(g)(p)
    timeit("composite fwd+bwd", jax.jit(bwd_f), payload, binned.block_tile,
           binned.block_valid)


if __name__ == "__main__":
    main()
