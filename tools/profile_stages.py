"""Stage-by-stage TPU profiling of the rasterizer at bench shapes.

Timing methodology (important on the axon tunnel backend):
`jax.block_until_ready` only flushes the command buffer over the tunnel — it
does NOT wait for device completion, so naive timings report ~0 for anything
that fits the in-flight buffer. True device time = wall clock over n queued
dispatches ending in a forced host fetch, minus one single-dispatch run
(which measures the ~50 ms round-trip latency).

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

    import importlib

    from msgs.core.camera import make_camera
    from msgs.kernels import composite as comp
    from msgs.kernels.binning import BLOCK, bin_gaussians
    from msgs.kernels.preprocess import preprocess
    rz = importlib.import_module("msgs.kernels.rasterize")

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    cap_arg = int(sys.argv[4]) if len(sys.argv) > 4 else 21
    ENTRY_CAP = cap_arg if cap_arg > 64 else (1 << cap_arg)

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
    # Match bench.py's production config (image-only grads + bf16 fast
    # modes); MSGS_BENCH_* env vars A/B them from the harness.
    img_only = os.environ.get("MSGS_BENCH_IMAGE_ONLY", "1") != "0"
    # Defaults track bench.py (r5): grad_pack ON, bwd_bf16 OFF (it measures
    # slower than the exact path at these shapes — PERF_NOTES r5).
    bwd_bf16 = os.environ.get("MSGS_BENCH_BWD_BF16", "0") == "1"
    grad_pack = os.environ.get("MSGS_BENCH_GRAD_PACK", "1") != "0"
    settings = rz.RasterSettings(backend="pallas", entry_cap=ENTRY_CAP,
                                 image_grads_only=img_only,
                                 bwd_bf16=bwd_bf16,
                                 grad_pack_bf16=grad_pack)

    def scalarize(x):
        return jnp.sum(jnp.asarray(
            [jnp.sum(l.astype(jnp.float32))
             for l in jax.tree_util.tree_leaves(x)]))

    def timeit(name, f, *a, n=10):
        jfn = jax.jit(lambda *a: scalarize(f(*a)))
        t0 = time.perf_counter()
        float(np.asarray(jfn(*a)))
        print(f"{name} first: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(n):
            r = jfn(*a)
        float(np.asarray(r))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(jfn(*a)))
        t_1 = time.perf_counter() - t0
        print(f"{name}: {(t_n - t_1)/(n-1)*1000:.2f} ms", flush=True)

    pre_f = jax.jit(lambda m, s, q, o, c: preprocess(
        cam, m, o, colors_precomp=c, scales=s, quats=q))
    timeit("preprocess fwd", lambda m, s, q, o, c: preprocess(
        cam, m, o, colors_precomp=c, scales=s, quats=q), *args)
    pre = pre_f(*args)
    timeit("binning", lambda p: bin_gaussians(p, W, H, ENTRY_CAP), pre)
    binned = jax.jit(lambda p: bin_gaussians(p, W, H, ENTRY_CAP))(pre)
    print("entries:", int(binned.num_entries), flush=True)

    def payload_f(pre, binned):
        Nn = pre.depths.shape[0]
        feats = jnp.zeros((Nn + 1, comp.NFEAT), jnp.float32)
        feats = feats.at[:Nn, comp.F_MX].set(pre.means2d[:, 0])
        feats = feats.at[:Nn, comp.F_R:comp.F_B + 1].set(pre.colors)
        ef = rz._gather_payload(feats, binned.gauss_id, binned.gid_starts)
        return ef.reshape(-1, BLOCK, comp.NFEAT)
    timeit("payload gather", payload_f, pre, binned)
    payload = jax.jit(payload_f)(pre, binned)

    def payload_vjp(pre, binned):
        def f(feats):
            ef = rz._gather_payload(feats, binned.gauss_id,
                                    binned.gid_starts, img_only, grad_pack)
            return jnp.sum(ef)
        Nn = pre.depths.shape[0]
        return jax.grad(f)(jnp.zeros((Nn + 1, comp.NFEAT), jnp.float32))
    timeit("payload vjp (sort-back+segsum)", payload_vjp, pre, binned)

    tiles_x = (W + 15) // 16
    tiles = tiles_x * ((H + 15) // 16)
    timeit("composite fwd", lambda p, bt, bv, tlb: comp.composite(
        p, bt, bv, tlb, tiles, tiles_x, W, H), payload, binned.sub_tile,
        binned.sub_valid, binned.tile_last_sub)

    def bwd_f(p, bt, bv, tlb):
        def g(p):
            o = comp.composite(p, bt, bv, tlb, tiles, tiles_x, W, H,
                               img_only, bwd_bf16)
            return jnp.sum(o[:, :5 if not img_only else 3])
        return jax.grad(g)(p)
    timeit("composite fwd+bwd", bwd_f, payload, binned.sub_tile,
           binned.sub_valid, binned.tile_last_sub)

    def full_fwd(m, s, q, o, c):
        return rz.rasterize(cam, m, o, colors_precomp=c, scales=s, quats=q,
                            settings=settings).image
    timeit("full rasterize fwd", full_fwd, *args)

    def full_fwd_bwd(m, s, q, o, c):
        def loss(m, s, q, o, c):
            out = rz.rasterize(cam, m, o, colors_precomp=c, scales=s,
                               quats=q, settings=settings)
            return jnp.mean(out.image ** 2)
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(m, s, q, o, c)
    timeit("full rasterize fwd+bwd", full_fwd_bwd, *args)


if __name__ == "__main__":
    main()
