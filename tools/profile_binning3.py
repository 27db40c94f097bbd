"""Bisect the real bin_gaussians with source-patched early returns."""
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from msgs.core.camera import make_camera
from msgs.kernels.preprocess import preprocess

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

pre = jax.block_until_ready(jax.jit(lambda m, s, q, o, c: preprocess(
    cam, m, o, colors_precomp=c, scales=s, quats=q))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(cols)))

SRC_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "msgs", "kernels", "binning.py")
with open(SRC_PATH) as f:
    BASE_SRC = f.read()

CUTS = [
    ("counts+offsets", "    # --- per-tile entry counts",
     "    return counts, offsets, kept\n"),
    ("+tile histogram", "    # --- emission stream",
     "    return tcounts\n"),
    ("+delta scan", "    # Unpack rect fields", "    return cums\n"),
    ("+decode", "    key_e = ", "    return tile_e, gid\n"),
    ("+keys", "    gid_starts = ", "    return key_e, gid_e\n"),
    ("+dummies (pre-sort)", "    keys = jnp.concatenate",
     "    return key_e, key_d\n"),
    ("+sort", "    # --- sub-block structure",
     "    return keys_s, gauss_id\n"),
]


def load_cut(marker, ret):
    src = BASE_SRC
    if marker is not None:
        idx = src.index(marker)
        src = src[:idx] + ret
    name = f"binning_cut_{abs(hash(marker)) % 10000}"
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    exec(compile(src, name, "exec"), mod.__dict__)
    return mod


def timeit(name, jfn, *a, n=10):
    r = jfn(*a)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(
        jnp.float32))))
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            r = jfn(*a)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(
            jnp.float32))))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = jfn(*a)
        float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(
            jnp.float32))))
        t_1 = time.perf_counter() - t0
        best = min(best, (t_n - t_1) / (n - 1))
    print(f"{name}: {best*1000:.2f} ms", flush=True)


for tag, marker, ret in CUTS:
    m = load_cut(marker, ret)
    timeit(tag, jax.jit(lambda p, m=m: m.bin_gaussians(p, W, H, ENTRY_CAP)),
           pre)

m = load_cut(None, None)
timeit("full", jax.jit(lambda p: m.bin_gaussians(p, W, H, ENTRY_CAP)), pre)
