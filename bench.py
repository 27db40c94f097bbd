"""Benchmark: rasterize fwd+bwd throughput at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is pixels/s through a full differentiable render step (forward +
backward through the Pallas compositor and preprocess) at 1920x1080 on a
synthetic scene sized like a mid-training Mip-NeRF-360 run (100k visible
Gaussians, ~1-2M splat entries). `vs_baseline` is measured against an A100
running the reference CUDA diff-gaussian-rasterization at the same workload,
estimated at ~15 ms fwd+bwd for 1080p (~138 M pixels/s) — the reference repo
publishes no numbers (BASELINE.md), so this is the documented stand-in until
a measured CUDA baseline lands.
"""
import json
import os
import time

import numpy as np

A100_BASELINE_PIX_S = 138e6   # ~15 ms fwd+bwd @ 1080p (documented estimate)

W, H = 1920, 1080
N = 100_000
# ~1.29M real entries at this workload under the banded emission default
# (1.44M under plain rects); cap = load + ~10% headroom so sort/composite
# time isn't paid for dead capacity (the trainer sizes its cap the same
# way: measured load + margin, grown on overflow).
ENTRY_CAP = 1_417_216


def _probe_device(timeout_s: int = 180) -> bool:
    """True iff the default JAX backend initializes within `timeout_s`.

    The axon TPU tunnel, when its relay is down, HANGS jax.devices()
    forever (no error) — probing in a subprocess is the only safe test.
    On a dead tunnel the bench falls back to CPU so the driver still gets
    a JSON line (clearly labeled via detail.backend) instead of a hang."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    global W, H, N, ENTRY_CAP
    cpu_fallback = (os.environ.get("PALLAS_AXON_POOL_IPS")
                    and not _probe_device())
    import jax
    if cpu_fallback:
        # sitecustomize pinned jax_platforms="axon,cpu" at interpreter
        # start; re-pin before any backend initializes. Interpret-mode
        # Pallas on CPU is ~1000× the chip, so shrink the workload to
        # keep the fallback line finite; detail.backend + detail.width
        # mark the number as NOT comparable to TPU rounds.
        print("bench: TPU tunnel unreachable — falling back to CPU",
              flush=True)
        jax.config.update("jax_platforms", "cpu")
        W, H, N, ENTRY_CAP = 512, 288, 20_000, 1 << 17
    try:
        cache_dir = os.path.join(os.path.dirname(
            os.path.abspath(__file__)), ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from msgs.core.camera import make_camera
    from msgs.kernels.rasterize import RasterSettings, rasterize

    rng = np.random.default_rng(0)
    # Scene tuned to a realistic splat load: ~10-20 entries/Gaussian.
    means = np.concatenate([
        rng.uniform(-3.0, 3.0, (N, 2)),
        rng.uniform(2.0, 12.0, (N, 1))], axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -2.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.8, W, H)
    # MSGS_BENCH_* env vars A/B kernel settings from the harness (the
    # kernels themselves read no env vars; this only picks the setting).
    # grad_pack_bf16 defaults ON (tolerance-tested, −1.9 ms, selectable at
    # train time via --fast_grads). bwd_bf16 defaults OFF: it measures
    # SLOWER than the exact path at these shapes (72.2 vs 60.1 ms, r5) —
    # kept as an A/B knob only.
    rt_env = os.environ.get("MSGS_BENCH_ROW_TIGHT")
    settings = RasterSettings(backend="pallas", entry_cap=ENTRY_CAP,
                              image_grads_only=True,
                              row_tight=None if rt_env is None
                              else rt_env == "1",
                              grad_pack_bf16=os.environ.get(
                                  "MSGS_BENCH_GRAD_PACK", "1") != "0",
                              bwd_bf16=os.environ.get(
                                  "MSGS_BENCH_BWD_BF16", "0") == "1")
    # Self-describing header: recorded numbers must say which gradient
    # path they measured (ADVICE r4).
    print(f"bench: grad_pack_bf16={settings.grad_pack_bf16} "
          f"bwd_bf16={settings.bwd_bf16} row_tight={settings.row_tight} "
          f"entry_cap={ENTRY_CAP}", flush=True)

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(cols))

    @jax.jit
    def fwd_bwd(m, s, q, o, c):
        def loss(m, s, q, o, c):
            out = rasterize(cam, m, o, colors_precomp=c, scales=s, quats=q,
                            settings=settings)
            return jnp.mean(out.image ** 2), out.num_entries
        (l, ne), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(m, s, q, o, c)
        return l, ne, grads

    # Warm up / compile.
    l, ne, g = jax.block_until_ready(fwd_bwd(*args))
    n_entries = int(ne)

    # Min over k repeats of a timed batch: the axon tunnel adds tens of ms
    # of jitter per dispatch round, which made single-shot runs disagree
    # with tuned local numbers by ~50% (VERDICT round 1, weak #1). The min
    # is the honest device throughput; per-rep times are reported too.
    iters, reps = (2, 2) if cpu_fallback else (10, 5)
    rep_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            l, ne, g = fwd_bwd(*args)
        # A real host fetch, not block_until_ready: over the axon tunnel
        # block_until_ready only flushes the command buffer (see
        # tools/profile_stages.py) — a device→host readback is the only
        # reliable completion barrier.
        float(np.asarray(l))
        rep_times.append((time.perf_counter() - t0) / iters)
    dt = min(rep_times)

    pix_s = W * H / dt
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_1080p",
        "value": round(pix_s, 1),
        "unit": "pixels/s/chip",
        "vs_baseline": round(pix_s / A100_BASELINE_PIX_S, 3),
        "detail": {
            "ms_per_iter": round(dt * 1000, 2),
            "ms_per_rep": [round(t * 1000, 1) for t in rep_times],
            "n_gaussians": N,
            "n_entries": n_entries,
            "width": W, "height": H,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
