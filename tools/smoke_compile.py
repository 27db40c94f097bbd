"""TPU compile smoke test at driver bench shapes (compile-only, ~1-2 min).

Round-4 postmortem (VERDICT r4 #1): a backward-kernel rework landed with
CPU interpret-mode parity tests only, and interpret mode cannot see Mosaic
scoped-VMEM limits — the default bench config then failed to COMPILE at
1080p driver shapes and the round ended with a crashed headline bench.
This guard compiles (does not run) the full fwd+bwd graph at the exact
bench shapes for every bench-selectable kernel config. Run it before any
round-end commit and after any kernel change:

    python tools/smoke_compile.py            # needs the TPU tunnel

Exit 0 iff every config compiles.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from msgs.core.camera import make_camera
    from msgs.kernels.rasterize import RasterSettings, rasterize

    if jax.default_backend() != "tpu":
        print("smoke_compile: default backend is not TPU — Mosaic limits "
              "are only visible on real hardware; aborting (rc=2)")
        return 2

    W, H, N = 1920, 1080, 100_000
    ENTRY_CAP = 1_417_216  # bench.py's cap

    rng = np.random.default_rng(0)
    means = np.concatenate([
        rng.uniform(-3.0, 3.0, (N, 2)),
        rng.uniform(2.0, 12.0, (N, 1))], axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -2.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.8, W, H)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(cols))

    configs = {
        "default": dict(),                      # bench defaults
        "bwd_bf16": dict(bwd_bf16=True),        # the r4 breaker
        "exact": dict(grad_pack_bf16=False),    # quality-run path
        "rects": dict(row_tight=False),
    }
    failures = []
    for name, over in configs.items():
        kw = dict(grad_pack_bf16=True)
        kw.update(over)
        settings = RasterSettings(backend="pallas", entry_cap=ENTRY_CAP,
                                  image_grads_only=True, **kw)

        def loss(m, s, q, o, c):
            out = rasterize(cam, m, o, colors_precomp=c, scales=s, quats=q,
                            settings=settings)
            return jnp.mean(out.image ** 2)

        t0 = time.perf_counter()
        try:
            jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))
                    ).lower(*args).compile()
            print(f"smoke_compile: {name:10s} OK "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:
            failures.append(name)
            msg = str(e).split("\n")[0][:200]
            print(f"smoke_compile: {name:10s} FAILED — {msg}", flush=True)

    if failures:
        print(f"smoke_compile: FAILED configs: {failures}")
        return 1
    print("smoke_compile: all configs compile at driver shapes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
