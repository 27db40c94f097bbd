"""Microbenchmark the payload-gather VJP (sort-back + segmented sums)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from msgs.core.camera import make_camera
from msgs.kernels.preprocess import preprocess
from msgs.kernels.binning import bin_gaussians
import importlib
rz = importlib.import_module("msgs.kernels.rasterize")

W, H = 1920, 1080
N = 100_000
ENTRY_CAP = 1_572_864

rng = np.random.default_rng(0)
means = np.concatenate([
    rng.uniform(-3.0, 3.0, (N, 2)),
    rng.uniform(2.0, 12.0, (N, 1))], axis=1).astype(np.float32)
scales = np.exp(rng.uniform(-4.5, -2.5, (N, 3))).astype(np.float32)
quats = rng.normal(size=(N, 4)).astype(np.float32)
opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.8, W, H)

pre = jax.jit(lambda m, s, q, o, c: preprocess(
    cam, m, o, colors_precomp=c, scales=s, quats=q))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(cols))
binned = jax.jit(lambda p: bin_gaussians(p, W, H, ENTRY_CAP))(pre)
gid = jax.block_until_ready(binned.gauss_id)
gid_starts = jax.block_until_ready(binned.gid_starts)
E = gid.shape[0]
F = 9
g = jnp.asarray(rng.normal(size=(E, F)).astype(np.float32))
gcols = tuple(jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
              for _ in range(F))
print(f"E={E}", flush=True)


def timeit(name, jfn, *a, n=10):
    r = jfn(*a)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(r)[0])))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = jfn(*a)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(r)[0])))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = jfn(*a)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(r)[0])))
        t_1 = time.perf_counter() - t0
        best = min(best, (t_n - t_1) / (n - 1))
    print(f"{name}: {best*1000:.2f} ms", flush=True)


# Current full VJP
timeit("full bwd (current)",
       jax.jit(lambda g: rz._gather_payload_bwd(
           True, (N + 1, gid, gid_starts),
           jnp.concatenate([g, jnp.zeros((E, 7), jnp.float32)], 1))[0]), g)

# sort only, returning tuple (no stack)
def sort_tuple(g):
    ops = jax.lax.sort((gid,) + tuple(g[:, i] for i in range(F)),
                       num_keys=1, is_stable=False)
    return ops[1:]

timeit("sort 9 cols (tuple out)", jax.jit(sort_tuple), g)

def sort_tuple_cols(*cols):
    ops = jax.lax.sort((gid,) + cols, num_keys=1, is_stable=False)
    return ops[1:]

timeit("sort 9 1-D cols (tuple in/out)", jax.jit(sort_tuple_cols), *gcols)

# current segmented sums on sorted values
vs = jax.block_until_ready(jax.jit(
    lambda g: jnp.stack(sort_tuple(g), axis=1))(g))
timeit("segsum (current, (E,9))",
       jax.jit(lambda v: rz._segmented_sums(v, gid_starts, N)), vs)

# compact per-column two-level segsum
CH = 128
C = E // CH


def segsum_compact(cols, starts):
    pos1 = starts[1:]
    pos0 = starts[:-1]
    outs = []
    for v in cols:
        a = v.reshape(C, CH)
        intra = jnp.cumsum(a, axis=1)            # lane-axis scan, compact
        ctot = intra[:, -1]
        cexcl = jnp.cumsum(ctot) - ctot          # (C,)
        flat = intra.reshape(E)

        def prefix(pos):
            c = jnp.clip(pos // CH, 0, C - 1)
            base = cexcl[c]
            ip = jnp.where(pos % CH > 0,
                           flat[jnp.clip(pos - 1, 0, E - 1)], 0.0)
            return jnp.where(pos >= E, cexcl[-1] + ctot[-1], base + ip)

        outs.append(prefix(pos1) - prefix(pos0))
    return outs

timeit("segsum (compact per-col)",
       jax.jit(lambda *c: segsum_compact(c, gid_starts)), *tuple(vs[:, i] for i in range(F)))


def full_new(*cols):
    s = sort_tuple_cols(*cols)
    return segsum_compact(s, gid_starts)

timeit("full bwd (new: tuple sort + compact segsum)",
       jax.jit(full_new), *gcols)
