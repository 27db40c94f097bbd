"""Weak/strong-scaling sweep of the sharded train step on a virtual mesh.

Runs the full sharded fwd+bwd+Adam step (msgs/dist/shard.py) over CPU
device meshes of increasing size and reports pixels/s and per-device
exchanged bytes. CPU timings are only indicative of *scaling shape*
(collectives are memcpys here, and Pallas runs in interpret mode), but the
sweep proves the communication volume contract: per-device exchanged
bytes = n_gauss · packet_cap · 64 B — constant per device as the mesh and
model grow together (weak scaling), versus the round-1 all-gather whose
per-device bytes grew linearly with total model size.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/bench_scaling.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np
import jax
# sitecustomize pins jax_platforms="axon,cpu" (TPU tunnel); the sweep needs
# the virtual CPU device pool, so re-pin before any backend initializes.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from msgs.core.camera import make_camera
from msgs.dist.mesh import GAUSS_AXIS, TILE_AXIS, make_mesh
from msgs.dist.shard import PKT, build_sharded_train_step, state_as_dicts
from msgs.kernels.rasterize import RasterSettings
from msgs.model.gaussians import GaussianConfig, create_from_points
from msgs.train.loop import TrainState
from msgs.train.optimizer import OptimParams, init_adam

H, W = 128, 64           # 8 tile rows: divisible for meshes up to 8 stripes
CAP_PER_SHARD = 512      # weak scaling: capacity grows with the gauss axis
# Shapes are dryrun-small: 8 virtual devices share the host's few cores, and
# XLA-CPU kills collectives whose slowest participant lags >40 s. The numbers
# that matter here are exchange_bytes_per_device (the comm-volume contract)
# and the scaling *shape*, not absolute rates.


def run(n_gauss: int, n_tile: int, iters: int = 3):
    mesh = make_mesh(n_gauss=n_gauss, n_tile=n_tile,
                     devices=jax.devices()[:n_gauss * n_tile])
    cap = CAP_PER_SHARD * n_gauss
    rng = np.random.default_rng(0)
    n = cap // 2
    means = np.concatenate([
        rng.uniform(-1.2, 1.2, (n, 2)),
        rng.uniform(2.5, 8.0, (n, 1))], axis=1).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = GaussianConfig(sh_degree=1, reso_lvls=2, capacity=cap)
    st = create_from_points(cfg, means, colors)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9 * H / W, W, H)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    op = OptimParams()
    settings = RasterSettings(backend="reference", entry_cap=1 << 12)
    # Per-pair capacity sized to the stripe working set (4x even spread)
    # -- constant under weak scaling where N grows with the mesh.
    packet_cap = max(512, 4 * CAP_PER_SHARD // (n_gauss * n_tile))
    step = build_sharded_train_step(mesh, cfg, op, settings, H, W,
                                    spatial_lr_scale=1.0,
                                    packet_cap=packet_cap)

    gauss_sh = NamedSharding(mesh, P(GAUSS_AXIS))
    repl = NamedSharding(mesh, P())
    stripe_sh = NamedSharding(mesh, P((GAUSS_AXIS, TILE_AXIS)))

    def put(state):
        params, side = state_as_dicts(state.gaussians)
        g = {k: jax.device_put(v, gauss_sh) for k, v in params.items()}
        s = {k: jax.device_put(v, repl if k == "active_sh_degree"
                               else gauss_sh) for k, v in side.items()}
        from msgs.model.gaussians import GaussianState
        adam = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, gauss_sh) if x.ndim else x,
            state.adam)
        return TrainState(gaussians=GaussianState(**g, **s), adam=adam,
                          iteration=state.iteration)

    state = put(TrainState(gaussians=st, adam=init_adam(st.params()),
                           iteration=jnp.zeros((), jnp.int32)))
    gt_sh = jax.device_put(gt, stripe_sh)

    state, m = step(state, cam, gt)          # compile
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, cam, gt)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters

    n_dev = n_gauss * n_tile
    return {
        "mesh": f"{n_gauss}x{n_tile}",
        "devices": n_dev,
        "capacity": cap,
        "ms_per_step": round(dt * 1000, 1),
        "pixels_per_s": round(H * W / dt, 0),
        "packet_cap": packet_cap,
        "exchange_bytes_per_device": n_gauss * packet_cap * PKT * 4,
        "overflow": int(m["overflow"]),
    }


def main():
    results = []
    for ng, nt in [(1, 1), (1, 2), (2, 2), (2, 4)]:
        if ng * nt > len(jax.devices()):
            continue
        r = run(ng, nt)
        results.append(r)
        print(json.dumps(r), flush=True)
    for r in results:
        r["scaling_efficiency"] = round(
            r["pixels_per_s"] / results[0]["pixels_per_s"], 3)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
