"""Permuted-layout single-pass prefix sum vs jnp.cumsum."""
import jax.numpy as jnp
import numpy as np

from msgs.kernels.scan import (LANES, SUBL, TILE_E, cumsum_perm, perm_iota,
                               perm_positions, perm_shape)


def test_cumsum_perm_matches_xla():
    rng = np.random.default_rng(5)
    E = 4 * TILE_E
    R = 5
    logical = rng.integers(0, 7, (R, E)).astype(np.float32)
    # Scatter logical rows into the permuted layout.
    x = np.zeros((R,) + perm_shape(E), np.float32)
    idx = np.arange(E)
    s, l = idx % SUBL, idx // SUBL
    x[:, s, l] = logical
    out = np.asarray(cumsum_perm(jnp.asarray(x)))
    want = np.cumsum(logical, axis=1)
    np.testing.assert_allclose(out[:, s, l], want, rtol=0, atol=1e-3)


def test_perm_iota():
    E = 2 * TILE_E
    it = np.asarray(perm_iota(E))
    idx = np.arange(E)
    s, l = perm_positions(jnp.asarray(idx))
    assert (it[np.asarray(s), np.asarray(l)] == idx).all()
