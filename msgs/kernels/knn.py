"""3-nearest-neighbor mean squared distance for scale initialization.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2`
(SURVEY.md §2.4; used once at init: scene/gaussian_model.py:199-200). Instead
of Morton-order spatial partitioning, we run a blocked exact O(N²) pass: the
pairwise-distance tiles are (B×B) matmul-shaped ops that map straight onto
the MXU, and a `lax.scan` over column tiles keeps memory at O(B²). Exact
(not approximate), deterministic, and fast enough for init-time N ≲ 1e6.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK = 1024


@functools.partial(jax.jit, static_argnames=("k",))
def knn_mean_sq_dist(points: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors.

    points: (N, 3) float32. Returns (N,) float32. Matches distCUDA2's contract
    (k=3, self excluded).
    """
    N = points.shape[0]
    pad = (-N) % _BLOCK
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    Np = pts.shape[0]
    n_blocks = Np // _BLOCK
    sq = jnp.sum(pts * pts, axis=1)
    real = jnp.arange(Np) < N

    rows = pts.reshape(n_blocks, _BLOCK, 3)
    rows_sq = sq.reshape(n_blocks, _BLOCK)
    cols = rows
    cols_sq = rows_sq
    cols_real = real.reshape(n_blocks, _BLOCK)

    def row_block(carry, rb):
        r_pts, r_sq, r_idx = rb

        def col_block(best, cb):
            c_pts, c_sq, c_real, c_idx = cb
            # d² = |a|² + |b|² − 2a·b ; the −2a·b term is an MXU matmul.
            d2 = (r_sq[:, None] + c_sq[None, :]
                  - 2.0 * jnp.dot(r_pts, c_pts.T,
                                  preferred_element_type=jnp.float32))
            # Exclude self-pairs and padding.
            same = (r_idx[:, None] == c_idx[None, :])
            d2 = jnp.where(same | ~c_real[None, :], jnp.inf, d2)
            d2 = jnp.maximum(d2, 0.0)
            # Merge with running top-k (ascending).
            merged = jnp.concatenate([best, d2], axis=1)
            best = jax.lax.top_k(-merged, k)[0] * -1.0
            return best, None

        init = jnp.full((_BLOCK, k), jnp.inf)
        col_idx = jnp.arange(n_blocks)
        best, _ = jax.lax.scan(
            col_block, init,
            (cols, cols_sq, cols_real,
             col_idx[:, None] * _BLOCK + jnp.arange(_BLOCK)[None, :]))
        return carry, jnp.mean(best, axis=1)

    row_idx = (jnp.arange(n_blocks)[:, None] * _BLOCK
               + jnp.arange(_BLOCK)[None, :])
    _, out = jax.lax.scan(row_block, None, (rows, rows_sq, row_idx))
    return out.reshape(Np)[:N]
