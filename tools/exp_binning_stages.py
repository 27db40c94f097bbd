"""Micro-profile of the banded binning pipeline at bench shapes.

Times (device, queued-dispatch methodology as tools/profile_stages.py):
  - full bin_gaussians (banded default)
  - _delta_scan at R=8 / R=5 / R=4 planes (the entry-stream scan+scatter)
  - the dummy-stream _delta_scan (R=1 over pad region)
  - the fused-key sort alone (2 int32 operands at E_cap + pad)
  - the 3-band one-hot difference histogram

Run: python tools/exp_binning_stages.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, label, iters=10):
    """profile_stages.py methodology: scalarize outputs inside jit (a tiny
    readback, not a full-array tunnel transfer), time n queued dispatches
    ending in a host fetch, subtract one single-dispatch run (the tunnel
    round-trip)."""
    import jax
    import jax.numpy as jnp

    def scalarize(x):
        return jnp.sum(jnp.asarray(
            [jnp.sum(l.astype(jnp.float32))
             for l in jax.tree_util.tree_leaves(x)]))

    jfn = jax.jit(lambda *a: scalarize(fn(*a)))
    float(np.asarray(jfn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jfn(*args)
    float(np.asarray(r))
    t_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(jfn(*args)))
    t_1 = time.perf_counter() - t0
    dt = (t_n - t_1) / (iters - 1) * 1000
    print(f"{label}: {dt:.2f} ms")
    return dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from msgs.core.camera import make_camera
    from msgs.kernels import binning as bn
    from msgs.kernels.preprocess import preprocess

    N, W, H = 100_000, 1920, 1080
    ENTRY_CAP = 1_417_216
    rng = np.random.default_rng(0)
    means = np.concatenate([
        rng.uniform(-3, 3, (N, 2)), rng.uniform(2, 12, (N, 1))],
        1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -2.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.8, W, H)

    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    pre = jax.jit(lambda m, s, q, o, c: preprocess(
        cam, m, o, colors_precomp=c, scales=s, quats=q))(
            means, scales, quats, opac, cols)

    tiles_x = (W + bn.TILE - 1) // bn.TILE
    tiles_y = (H + bn.TILE - 1) // bn.TILE
    T = tiles_x * tiles_y
    E_cap = bn.entry_capacity(ENTRY_CAP, T)
    ec_pad = bn._pad_ecap(ENTRY_CAP)
    pad_cap = E_cap - ec_pad
    print(f"T={T} E_cap={E_cap} entry_cap_padded={ec_pad} pad_cap={pad_cap}")

    full = jax.jit(lambda p: bn.bin_gaussians(p, W, H, ENTRY_CAP))
    timeit(full, (pre,), "bin_gaussians (banded, full)")

    # delta scan at various plane counts
    offsets = np.sort(rng.integers(0, ec_pad, N)).astype(np.int32)
    offs = jnp.asarray(offsets)
    for R in (8, 5, 4, 1):
        fields = jnp.asarray(
            rng.uniform(0, 2**23, (R, N)).astype(np.float32))
        f = jax.jit(lambda fl, of, _ec=ec_pad: bn._delta_scan(fl, of, _ec))
        timeit(f, (fields, offs), f"_delta_scan R={R} over {ec_pad}")

    # dummy-stream scan (R=1 over pad region)
    d_off = jnp.asarray(
        np.sort(rng.integers(0, pad_cap, T)).astype(np.int32))
    fd = jax.jit(lambda of, _pc=pad_cap, _t=T: bn._delta_scan(
        (jax.lax.iota(jnp.float32, _t) + 1.0)[None, :], of, _pc))
    timeit(fd, (d_off,), f"dummy _delta_scan R=1 over {pad_cap}")

    # fused sort alone
    keys = jnp.asarray(rng.integers(0, 2**31 - 1,
                                    E_cap).astype(np.int32))
    gids = jnp.asarray(rng.integers(0, N, E_cap).astype(np.int32))
    fs = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1,
                                           is_stable=False))
    timeit(fs, (keys, gids), f"unstable sort 2 ops at {E_cap}")

    # one-hot histogram x3 bands
    y0 = jnp.asarray(rng.integers(0, tiles_y, N).astype(np.int32))
    y1 = jnp.minimum(y0 + jnp.asarray(
        rng.integers(1, 8, N).astype(np.int32)), tiles_y)
    x0 = jnp.asarray(rng.integers(0, tiles_x, N).astype(np.int32))
    x1 = jnp.minimum(x0 + jnp.asarray(
        rng.integers(1, 8, N).astype(np.int32)), tiles_x)
    fh = jax.jit(lambda a, b, c, d: sum(
        bn._onehot_diff_histogram(a, b, c, d, tiles_y + 2, tiles_x + 2)
        for _ in range(3)))
    timeit(fh, (y0, y1, x0, x1), "one-hot diff histogram x3")


if __name__ == "__main__":
    main()
