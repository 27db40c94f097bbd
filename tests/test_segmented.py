"""The scatter-free gather VJP (_take_entry_rows / _segmented_sums) must
match plain XLA gather autodiff exactly — this is the only test that checks
it against an independent implementation (both rasterizer backends share the
custom path)."""
import jax
import jax.numpy as jnp
import numpy as np

from msgs.kernels.rasterize import _segmented_sums, _take_entry_rows


def _mk(E=4096, N=300, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.integers(0, N, E)).astype(np.int32)
    # sprinkle invalid entries (id == N) at the end like real padding
    ids[-100:] = N
    perm = rng.permutation(E).astype(np.int32)
    ids_packed = np.empty(E, np.int32)
    ids_packed[perm] = ids        # packed order; perm sorts it back
    valid = ids_packed < N
    return ids_packed, valid, perm, ids


def _starts_of(ids_sorted, N):
    return np.searchsorted(ids_sorted, np.arange(N + 1)).astype(np.int32)


def test_segmented_sums_match_bincount():
    rng = np.random.default_rng(1)
    E, N, F = 4096, 300, 5
    ids = np.sort(rng.integers(0, N, E)).astype(np.int32)
    vals = rng.normal(size=(E, F)).astype(np.float32)
    out = np.asarray(_segmented_sums(
        jnp.asarray(vals), jnp.asarray(_starts_of(ids, N)), N))
    expect = np.zeros((N, F), np.float32)
    np.add.at(expect, ids, vals)
    np.testing.assert_allclose(out, expect, atol=2e-4)


def test_take_rows_vjp_matches_gather_autodiff():
    rng = np.random.default_rng(2)
    E, N, F = 4096, 300, 16
    ids_packed, valid, perm, ids_sorted = _mk(E, N)
    feats = rng.normal(size=(N, F)).astype(np.float32)
    cot = rng.normal(size=(E, F)).astype(np.float32)

    idc = jnp.asarray(np.minimum(ids_packed, N - 1))
    v = jnp.asarray(valid)
    gid_starts = jnp.asarray(_starts_of(ids_sorted, N))
    by_gid_perm = jnp.asarray(perm)

    def custom(f):
        out = _take_entry_rows(f, idc, v, by_gid_perm, gid_starts)
        return jnp.sum(out * jnp.asarray(cot))

    def plain(f):
        out = jnp.where(v[:, None], f[idc], 0.0)
        return jnp.sum(out * jnp.asarray(cot))

    g_c = jax.grad(custom)(jnp.asarray(feats))
    g_p = jax.grad(plain)(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_p), atol=3e-4)
    # values agree too
    np.testing.assert_allclose(
        np.asarray(_take_entry_rows(jnp.asarray(feats), idc, v, by_gid_perm,
                                    gid_starts)),
        np.asarray(jnp.where(v[:, None], jnp.asarray(feats)[idc], 0.0)))
