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

    # 2) Pallas: whole table in VMEM, jnp.take along sublanes per block.
    def gather_kernel(gid_ref, table_ref, out_ref):
        idx = gid_ref[pl.program_id(0)]          # (BLK,) int32 from SMEM
        out_ref[...] = jnp.take(table_ref[...], idx, axis=0)

    TP = table_p.shape[0]

    @jax.jit
    def pallas_gather(table_p, gid):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E // BLK,),
            in_specs=[pl.BlockSpec((TP, F), lambda s, g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, F), lambda s, g: (s, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            gather_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(gid.reshape(E // BLK, BLK), table_p)

    try:
        r_pal = timeit("pallas_vmem_take_sublane", pallas_gather, table_p, gid)
        ok = bool(jnp.all(r_pal[:4096] == r_xla[:4096]))
        print("match:", ok)
    except Exception as e:
        print("pallas sublane gather failed:", type(e).__name__, str(e)[:300])

    # 2b) transposed table (F, N): minor dim is N (no 128-lane padding —
    # the (N, F) layout pads F→128 in VMEM, 10.7× waste), gather on lanes.
    table_t = jnp.asarray(np.asarray(table).T.copy())   # (F, N+1)

    def gather_kernel_t(gid_ref, table_ref, out_ref):
        idx = gid_ref[pl.program_id(0)]          # (BLK,)
        out_ref[...] = jnp.take(table_ref[...], idx, axis=1)

    @jax.jit
    def pallas_gather_t(table_t, gid):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E // BLK,),
            in_specs=[pl.BlockSpec((F, N + 1), lambda s, g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((F, BLK), lambda s, g: (0, s),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            gather_kernel_t,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((F, E), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(gid.reshape(E // BLK, BLK), table_t)

    try:
        r_t = timeit("pallas_vmem_take_lane", pallas_gather_t, table_t, gid)
        ok = bool(jnp.all(r_t[:, :4096] == r_xla[:4096].T))
        print("match:", ok)
    except Exception as e:
        print("pallas lane gather failed:", type(e).__name__, str(e)[:300])

    # 3) sort+payload carry reference point (what the VJP pays per operand).
    def sortop(k, v):
        return jax.lax.sort((k, v[:, 0], v[:, 1], v[:, 2]), num_keys=1,
                            is_stable=False)[1]
    timeit("sort_3payload", sortop, gid, r_xla[:, :3].astype(jnp.float32))


if __name__ == "__main__":
    main()
