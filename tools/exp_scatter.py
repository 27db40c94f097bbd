"""TPU micro-experiment: colliding scatter-add cost at histogram shapes.

Gate for the row-tight emission design (tools/PERF_NOTES.md): exact
per-tile entry counts from ~1M row-segments need `.at[cells].add(w)` into
a ~8k-cell grid. Round-1 lore says colliding scatter-adds are ~10× a radix
sort at 2.6M rows; this measures the actual cost at 0.1/0.4/1.2/2.4M rows,
against the 4-corner rect scatter the binner uses today (N=100k).

Run on TPU: python tools/exp_scatter.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    T_Y, T_X = 68, 120

    def timeit(name, f, *a, n=20):
        jf = jax.jit(f)
        r = jf(*a)
        np.asarray(r).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(n):
            r = jf(*a)
        np.asarray(r).ravel()[:1]
        t1 = time.perf_counter()
        r = jf(*a)
        np.asarray(r).ravel()[:1]
        t2 = time.perf_counter()
        print(f"{name}: {((t1 - t0) - (t2 - t1)) / n * 1000:.2f} ms")

    rng = np.random.default_rng(0)
    for R in (100_000, 400_000, 1_200_000, 2_400_000):
        ty = jnp.asarray(rng.integers(0, T_Y, R).astype(np.int32))
        x0 = jnp.asarray(rng.integers(0, T_X - 4, R).astype(np.int32))
        w = jnp.asarray(rng.integers(1, 5, R).astype(np.float32))

        def hist(ty, x0, w):
            d = jnp.zeros((T_Y, T_X + 8), jnp.float32)
            d = d.at[ty, x0].add(w, mode="drop")
            d = d.at[ty, x0 + 4].add(-w, mode="drop")
            return jnp.cumsum(d, axis=1)[:, :T_X]

        timeit(f"range_hist_scatter R={R}", hist, ty, x0, w)

        # reference point: 2-operand sort at the same R
        key = ty * T_X + x0
        timeit(f"sort2 R={R}",
               lambda k, v: jax.lax.sort((k, v), num_keys=1,
                                         is_stable=False)[0], key, w)


if __name__ == "__main__":
    main()
