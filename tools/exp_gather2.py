"""TPU micro-experiment r3: payload row gather strategies, fixed harness.

Round-2's exp_gather.py had two defects: (a) its rep barrier fetched the
ENTIRE (E, 16) output over the axon tunnel (~128 MB/rep — the reported
13 s was tunnel transfer, not gather time), (b) its index BlockSpecs used
(1, BLK) blocks whose sublane dim 1 Mosaic rejects. Here every variant is
timed as jit(sum(gather(...))) with a scalar fetch, and index blocks are
(1, 8, BLK//8) — the last two dims satisfy Mosaic's (8, 128)-divisible-or-
whole-array rule.

Variants:
  1. XLA row gather  table[gid]                      (the production path)
  2. Pallas sublane take: (Np, F) table VMEM-resident, out (8, B/8, F)
  3. Pallas lane take: (F, Np) table, out (F, 8, B/8)
Run on TPU: python tools/exp_gather2.py [N] [E]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 21
    F = 16
    BLK = 2048

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N + 1, F)).astype(np.float32))
    npad = (-(N + 1)) % 8
    table_p = jnp.pad(table, ((0, npad), (0, 0)))
    TP = table_p.shape[0]
    table_t = jnp.asarray(np.asarray(table_p).T.copy())   # (F, TP)
    gid = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    gid3 = gid.reshape(E // BLK, 8, BLK // 8)

    def timeit(name, f, *a, n=20):
        jf = jax.jit(lambda *a: jnp.sum(f(*a)))
        r = jf(*a)
        float(np.asarray(r))
        t0 = time.perf_counter()
        for _ in range(n):
            r = jf(*a)
        float(np.asarray(r))
        t1 = time.perf_counter()
        r1 = jf(*a)
        float(np.asarray(r1))
        t2 = time.perf_counter()
        ms = ((t1 - t0) - (t2 - t1)) / n * 1000
        print(f"{name}: {ms:.2f} ms", flush=True)

    def value(f, *a):
        return jax.jit(f)(*a)

    # 1) XLA row gather (production).
    timeit("xla_row_gather", lambda t, g: t[g], table_p, gid)
    r_ref = value(lambda t, g: t[g], table_p, gid)

    # 2) Pallas: sublane take from the full (TP, F) VMEM table.
    def k_sub(gid_ref, table_ref, out_ref):
        idx = gid_ref[0].reshape(-1)               # (BLK,) — 1-D indices
        g = jnp.take(table_ref[...], idx, axis=0)  # (BLK, F)
        out_ref[0] = g.reshape(8, BLK // 8, F)

    def pallas_sub(table_p, gid3):
        return pl.pallas_call(
            k_sub,
            grid=(E // BLK,),
            in_specs=[
                pl.BlockSpec((1, 8, BLK // 8), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TP, F), lambda s: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, BLK // 8, F), lambda s: (s, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E // BLK, 8, BLK // 8, F),
                                           jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(gid3, table_p)

    try:
        r = value(pallas_sub, table_p, gid3).reshape(E, F)
        print("sublane match:", bool(jnp.all(r[:4096] == r_ref[:4096])),
              flush=True)
        timeit("pallas_vmem_take_sublane", pallas_sub, table_p, gid3)
    except Exception as e:
        print("pallas sublane take failed:", type(e).__name__, str(e)[:400],
              flush=True)

    # 3) Pallas: lane take from the transposed (F, TP) VMEM table.
    def k_lane(gid_ref, table_ref, out_ref):
        idx = gid_ref[0].reshape(-1)               # (BLK,)
        g = jnp.take(table_ref[...], idx, axis=1)  # (F, BLK)
        out_ref[0] = g.reshape(F, 8, BLK // 8)

    def pallas_lane(table_t, gid3):
        return pl.pallas_call(
            k_lane,
            grid=(E // BLK,),
            in_specs=[
                pl.BlockSpec((1, 8, BLK // 8), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, TP), lambda s: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, F, 8, BLK // 8),
                                   lambda s: (s, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E // BLK, F, 8, BLK // 8),
                                           jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(gid3, table_t)

    try:
        r = value(pallas_lane, table_t, gid3)      # (E/B, F, 8, B/8)
        r = jnp.transpose(r, (0, 2, 3, 1)).reshape(E, F)
        print("lane match:", bool(jnp.all(r[:4096] == r_ref[:4096])),
              flush=True)
        timeit("pallas_vmem_take_lane", pallas_lane, table_t, gid3)
    except Exception as e:
        print("pallas lane take failed:", type(e).__name__, str(e)[:400],
              flush=True)

    # Reference points at the same scalarized timing discipline.
    timeit("sort_1payload", lambda k, v: jax.lax.sort(
        (k, v), num_keys=1, is_stable=False)[1], gid, r_ref[:, 0])


if __name__ == "__main__":
    main()
