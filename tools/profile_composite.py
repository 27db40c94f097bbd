"""Measure compositor cost under kernel variants (ablation micro-harness).

Each variant recompiles msgs.kernels.composite with a tweak applied by
monkey-patching module constants / functions, then times the fwd and fwd+bwd
pallas calls on the bench workload's real binned stream.
"""
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
from msgs.kernels.preprocess import TILE, preprocess
from msgs.kernels.binning import BLOCK, bin_gaussians
from msgs.kernels import composite as comp
from msgs.kernels import rasterize as rz

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

tiles_x = (W + TILE - 1) // TILE
tiles_y = (H + TILE - 1) // TILE
T = tiles_x * tiles_y

pre = jax.jit(lambda m, s, q, o, c: preprocess(
    cam, m, o, colors_precomp=c, scales=s, quats=q))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(cols))
binned = jax.jit(lambda p: bin_gaussians(p, W, H, ENTRY_CAP))(pre)

feats = jnp.zeros((N + 1, comp.NFEAT), jnp.float32)
feats = feats.at[:N, comp.F_MX].set(pre.means2d[:, 0])
feats = feats.at[:N, comp.F_MY].set(pre.means2d[:, 1])
feats = feats.at[:N, comp.F_CXX].set(pre.conics[:, 0])
feats = feats.at[:N, comp.F_CXY].set(pre.conics[:, 1])
feats = feats.at[:N, comp.F_CYY].set(pre.conics[:, 2])
feats = feats.at[:N, comp.F_R:comp.F_B + 1].set(pre.colors)
feats = feats.at[:N, comp.F_OP].set(pre.opacities)
feats = feats.at[:N, comp.F_DEPTH].set(pre.depths)
feats = feats.at[:N, comp.F_PSIZE].set(pre.pixel_sizes)
payload = jax.block_until_ready(
    feats[binned.gauss_id].reshape(-1, BLOCK, comp.NFEAT))
sub_tile = binned.sub_tile
sub_valid = binned.sub_valid
tls = binned.tile_last_sub
print(f"B_cap={payload.shape[0]} live_subs={int(jnp.sum(sub_valid))} "
      f"S_cap={sub_tile.shape[0]}", flush=True)


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


def fwd(payload, st, sv, tls):
    return comp.composite(payload, st, sv, tls, T, tiles_x, W, H, True)


def fwdbwd(payload, st, sv, tls):
    def loss(p):
        tiles_out = comp.composite(p, st, sv, tls, T, tiles_x, W, H, True)
        return jnp.sum(tiles_out[:, :3, :] ** 2)
    l, g = jax.value_and_grad(loss)(payload)
    return l, g


timeit("composite fwd (base)", jax.jit(fwd), payload, sub_tile, sub_valid,
       tls)
timeit("composite fwd+bwd (base)", jax.jit(fwdbwd), payload, sub_tile,
       sub_valid, tls)


# ---- source-patched variants -------------------------------------------
import importlib.util
import types

SRC_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "msgs", "kernels", "composite.py")
with open(SRC_PATH) as f:
    BASE_SRC = f.read()

_variant_n = [0]


def load_variant(repls):
    src = BASE_SRC
    for old, new in repls:
        assert old in src, f"missing: {old[:60]!r}"
        src = src.replace(old, new)
    _variant_n[0] += 1
    name = f"composite_variant_{_variant_n[0]}"
    mod = types.ModuleType(name)
    mod.__dict__["__name__"] = name
    sys.modules[name] = mod
    exec(compile(src, name, "exec"), mod.__dict__)
    return mod


def run_variant(tag, repls, n=10):
    try:
        m = load_variant(repls)

        def vfwd(payload, st, sv, tls):
            return m.composite(payload, st, sv, tls, T, tiles_x, W, H,
                               True)

        def vfwdbwd(payload, st, sv, tls):
            def loss(p):
                to = m.composite(p, st, sv, tls, T, tiles_x, W, H, True)
                return jnp.sum(to[:, :3, :] ** 2)
            return jax.value_and_grad(loss)(payload)

        timeit(f"fwd   [{tag}]", jax.jit(vfwd), payload, sub_tile,
               sub_valid, tls, n=n)
        timeit(f"fw+bw [{tag}]", jax.jit(vfwdbwd), payload, sub_tile,
               sub_valid, tls, n=n)
    except Exception as e:
        print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if "--variants" in sys.argv:
    run_variant("GROUP=16", [("GROUP = 8", "GROUP = 16")])
    run_variant("GROUP=4", [("GROUP = 8", "GROUP = 4")])
    run_variant("no contrib write", [(
        "                contrib_ref[:, :] += wmax[rows] * oh",
        "                del oh"), ])
    run_variant("no state dump", [(
        "                out_ref[g * NSUB + k] = state_ref[:]",
        "                pass"), ])
    run_variant("2-split cumsum", [(
        "    x0 = x.astype(jnp.bfloat16).astype(jnp.float32)\n"
        "    r = x - x0\n"
        "    x1 = r.astype(jnp.bfloat16).astype(jnp.float32)\n"
        "    x2 = r - x1\n"
        "    return dot(x0) + dot(x1) + dot(x2)",
        "    x0 = x.astype(jnp.bfloat16).astype(jnp.float32)\n"
        "    r = x - x0\n"
        "    x1 = r.astype(jnp.bfloat16).astype(jnp.float32)\n"
        "    return dot(x0) + dot(x1)"), ])
    run_variant("no done-skip", [(
        "        done_all = (jnp.min(state_ref[O_DONE, :]) > 0.5) & uniform & nf\n"
        "        compute = (sv_ref[sb0] == 1) & jnp.logical_not(done_all)",
        "        compute = sv_ref[sb0] == 1"), ])
