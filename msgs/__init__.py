"""msgs — TPU-native multi-scale 3D Gaussian splatting framework.

A from-scratch JAX/Pallas re-design of the capabilities of JokerYan/MS-GS
("Multi-Scale 3D Gaussian Splatting for Anti-Aliased Rendering", CVPR 2024):
tile-based differentiable rasterization, multi-scale pixel-size tracking,
scale-aware splat filtering, large-Gaussian insertion, adaptive densification —
built TPU-first (static shapes, functional state, Pallas kernels, pjit/shard_map
over device meshes) rather than as a CUDA port.

Layout (see SURVEY.md §7.1):
  core/     pure camera / SH / transform math (pytrees, jnp)
  kernels/  rasterizer: preprocess, binning, Pallas tile compositor fwd/bwd,
            pure-jnp oracle, kNN init
  model/    fixed-capacity functional GaussianState + densification
  ms/       multi-scale schedule, pixel-size statistics, insert-large voxel pooling
  train/    optimizer / train step / checkpointing
  dist/     mesh construction + sharded render/train step
  data/     COLMAP / Blender loaders, camera pyramid, PLY I/O
  eval/     PSNR / SSIM / LPIPS metrics, reporting
  apps/     CLI drivers (train, render, viewer, trajectory, metrics)
"""

__version__ = "0.1.0"

# TPU XLA defaults matmuls/convolutions to bf16 input precision, which
# quantizes camera projections, covariance products, SH evaluation and the
# SSIM window convolution (variance estimates go negative, SSIM exceeds 1).
# Rendering and training need f32; ops where bf16 is exact (0/1 triangular
# prefix matmuls) opt back in locally with Precision.DEFAULT.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: training re-jits on every capacity-growth
# step (fixed-capacity functional state — model/gaussians.py), and over the
# axon tunnel each compile costs tens of seconds. The cache makes capacity
# regrowth, supervisor restarts (tools/supervisor.py) and sibling runs of
# the quality suite pay each distinct shape once per machine.
import os as _os

try:
    _cache = _os.environ.get(
        "MSGS_JAX_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover — cache is best-effort
    pass
