"""A/B the payload-gather VJP with bf16-packed gradient sort operands.

The gather VJP (sort grad rows by gid + segmented sums) measures ~14-19 ms
at bench shapes — the sort dominates and scales with operand count. This
measures packing the 9 (image-only) f32 gradient columns into 5 uint32
operands (two bf16 halves each) before the sort, unpacking to f32 for the
segmented sums. Gradient precision cost: ~2^-8 relative per entry
contribution (bf16 mantissa), summed in f32 — bounded noise on a
stochastic gradient, gated behind a setting and excluded from the strict
parity mode.

Usage: python tools/exp_vjp_pack.py
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

    E = 1_835_008      # bench-shape E_cap
    N = 100_000
    rng = np.random.default_rng(0)
    gid = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    # tile-sorted order: shuffle
    perm = rng.permutation(E)
    gid = gid[jnp.asarray(perm)]
    g9 = jnp.asarray(rng.normal(size=(E, 9)).astype(np.float32) *
                     np.logspace(-6, 0, 9, dtype=np.float32))
    gid_starts = jnp.asarray(
        np.concatenate([[0], np.cumsum(np.bincount(
            np.asarray(gid), minlength=N))]).astype(np.int32))

    from msgs.kernels.rasterize import _segmented_sums, _sort_by_gid

    def timeit(name, jf, *a, n=10):
        r = jf(*a)
        float(np.asarray(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r)))
        t0 = time.perf_counter()
        for _ in range(n):
            r = jf(*a)
        float(np.asarray(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r)))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = jf(*a)
        float(np.asarray(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r)))
        t_1 = time.perf_counter() - t0
        print(f"{name:32s}: {(t_n - t_1)/(n-1)*1000:7.2f} ms", flush=True)

    # --- control: current path (sort 9 f32 cols + segsum) ---
    def current(gid, g):
        s = _sort_by_gid(gid, g)
        return _segmented_sums(s, gid_starts, N)
    timeit("current sort9+segsum", jax.jit(current), gid, g9)

    # --- packed: 5 uint32 operands ---
    def pack2(a, b):
        ah = jax.lax.bitcast_convert_type(
            a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        bh = jax.lax.bitcast_convert_type(
            b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        return (ah << 16) | bh

    def unpack2(v):
        a = jax.lax.bitcast_convert_type(
            (v >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
        b = jax.lax.bitcast_convert_type(
            (v & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
        return a, b

    def packed(gid, g):
        cols = [pack2(g[:, 2 * i], g[:, 2 * i + 1]) for i in range(4)]
        cols.append(pack2(g[:, 8], jnp.zeros_like(g[:, 8])))
        ops = jax.lax.sort((gid,) + tuple(cols), num_keys=1, is_stable=False)
        outs = []
        for v in ops[1:]:
            a, b = unpack2(v)
            outs.extend([a, b])
        vals = jnp.stack(outs[:9], axis=1)
        return _segmented_sums(vals, gid_starts, N)
    timeit("packed sort5+segsum", jax.jit(packed), gid, g9)

    # --- scaling check: pure sorts ---
    def sort_k(k):
        def f(gid, g):
            ops = jax.lax.sort(
                (gid,) + tuple(g[:, i] for i in range(k)),
                num_keys=1, is_stable=False)
            return ops[1]
        return jax.jit(f)
    for k in (1, 3, 5, 9):
        timeit(f"sort key+{k}", sort_k(k), gid, g9)

    # --- precision report ---
    exact = jax.jit(current)(gid, g9)
    approx = jax.jit(packed)(gid, g9)
    rel = np.abs(np.asarray(approx - exact)) / (
        np.abs(np.asarray(exact)) + 1e-12)
    print(f"packed rel err: median {np.median(rel):.2e} "
          f"p99 {np.quantile(rel, 0.99):.2e} max {rel.max():.2e}")


if __name__ == "__main__":
    main()
