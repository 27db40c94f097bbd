"""TPU micro-experiment: payload row gather strategies.

The (N+1, NFEAT) feature table is only ~5 MB — it fits in VMEM whole. If
Mosaic supports a dynamic sublane gather (jnp.take along axis 0 of a VMEM
ref), a Pallas gather kernel should run at HBM write speed (~0.2 ms for
2.6M × 48 B) versus the ~5 ms XLA row gather the pipeline pays today.

Run on TPU: python tools/exp_gather.py [N] [E]
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 21
    F = 16   # padded table width (lane-friendly)
    BLK = 2048

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N + 1, F)).astype(np.float32))
    # VMEM wants a sublane-padded table: round N+1 up to 8.
    npad = (-(N + 1)) % 8
    table_p = jnp.pad(table, ((0, npad), (0, 0)))
    gid = jnp.asarray(rng.integers(0, N, E).astype(np.int32))

    def timeit(name, f, *a, n=20):
        jf = jax.jit(f)
        r = jf(*a)
        jax.block_until_ready(r)
        # tunnel-safe timing: n dispatches ending in a host fetch
        t0 = time.perf_counter()
        for _ in range(n):
            r = jf(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0])[:1]
        t1 = time.perf_counter()
        r1 = jf(*a)
        np.asarray(jax.tree_util.tree_leaves(r1)[0])[:1]
        t2 = time.perf_counter()
        ms = ((t1 - t0) - (t2 - t1)) / n * 1000 if n > 1 else 0
        print(f"{name}: {ms:.2f} ms")
        return r

    # 1) XLA row gather (the current pipeline).
    r_xla = timeit("xla_row_gather", lambda t, g: t[g], table, gid)

    # Indices ride as a normal VMEM input block, NOT scalar prefetch: at the
    # production entry count the full gid array is megabytes — way past SMEM.
    gid2d = gid.reshape(E // BLK, BLK)

    # 2) Pallas: whole table in VMEM, jnp.take along sublanes per block.
    #    (N, F) lane-pads F→128 in VMEM: ~51 MB at N=100k — near the VMEM
    #    ceiling, and OOM at training capacities; lane variants below scale.
    def gather_kernel(gid_ref, table_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], gid_ref[0], axis=0)

    TP = table_p.shape[0]

    @jax.jit
    def pallas_gather(table_p, gid2d):
        return pl.pallas_call(
            gather_kernel,
            grid=(E // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TP, F), lambda s: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, F), lambda s: (s, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(gid2d, table_p)

    try:
        r_pal = timeit("pallas_vmem_take_sublane", pallas_gather,
                       table_p, gid2d)
        ok = bool(jnp.all(r_pal[:4096] == r_xla[:4096]))
        print("match:", ok)
    except Exception as e:
        print("pallas sublane gather failed:", type(e).__name__, str(e)[:300])

    # 2b) transposed table (F, N): minor dim is N (no 128-lane padding),
    #     gather on lanes → (F, BLK) output.
    table_t = jnp.asarray(np.asarray(table).T.copy())   # (F, N+1)

    def gather_kernel_t(gid_ref, table_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], gid_ref[0], axis=1)

    @jax.jit
    def pallas_gather_t(table_t, gid2d):
        return pl.pallas_call(
            gather_kernel_t,
            grid=(E // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, N + 1), lambda s: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((F, BLK), lambda s: (0, s),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, E), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(gid2d, table_t)

    try:
        r_t = timeit("pallas_vmem_take_lane", pallas_gather_t, table_t, gid2d)
        ok = bool(jnp.all(r_t[:, :4096] == r_xla[:4096].T))
        print("match:", ok)
    except Exception as e:
        print("pallas lane gather failed:", type(e).__name__, str(e)[:300])

    # 2c) lane gather + in-kernel transpose → entry-major (BLK, F) blocks,
    #     the layout the compositor actually consumes.
    def gather_kernel_tt(gid_ref, table_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], gid_ref[0], axis=1).T

    @jax.jit
    def pallas_gather_tt(table_t, gid2d):
        return pl.pallas_call(
            gather_kernel_tt,
            grid=(E // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda s: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, N + 1), lambda s: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, F), lambda s: (s, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(gid2d, table_t)

    try:
        r_tt = timeit("pallas_vmem_take_lane_T", pallas_gather_tt,
                      table_t, gid2d)
        ok = bool(jnp.all(r_tt[:4096] == r_xla[:4096]))
        print("match:", ok)
    except Exception as e:
        print("pallas lane+T gather failed:", type(e).__name__, str(e)[:300])

    # 2d) lane gather + one XLA transpose outside.
    try:
        timeit("pallas_lane_plus_xla_T",
               lambda t, g: pallas_gather_t(t, g).T, table_t, gid2d)
    except Exception as e:
        print("lane+xlaT failed:", type(e).__name__, str(e)[:300])

    # 3) sort+payload carry reference point (what the VJP pays per operand).
    def sortop(k, v):
        return jax.lax.sort((k, v[:, 0], v[:, 1], v[:, 2]), num_keys=1,
                            is_stable=False)[1]
    timeit("sort_3payload", sortop, gid, r_xla[:, :3].astype(jnp.float32))


if __name__ == "__main__":
    main()
