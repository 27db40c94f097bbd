"""The sort-based gather VJP (_gather_payload / _segmented_sums) must match
plain XLA gather autodiff exactly — this is the only test that checks it
against an independent implementation (both rasterizer backends share the
custom path)."""
import jax
import jax.numpy as jnp
import numpy as np

from msgs.kernels.rasterize import _gather_payload, _segmented_sums


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


def test_gather_payload_vjp_matches_gather_autodiff():
    rng = np.random.default_rng(2)
    E, N, F = 4096, 300, 16
    # Packed-order gids with sentinel N sprinkled in (dummy/null entries),
    # like a real binned stream.
    ids_sorted = np.sort(rng.integers(0, N, E - 100)).astype(np.int32)
    gid_packed = rng.permutation(
        np.concatenate([ids_sorted, np.full(100, N, np.int32)])).astype(
            np.int32)
    # Segment starts in gid-sorted order (emission counts, closed form).
    gid_starts = jnp.asarray(_starts_of(ids_sorted, N))

    table = np.zeros((N + 1, F), np.float32)
    table[:N] = rng.normal(size=(N, F)).astype(np.float32)
    cot = rng.normal(size=(E, F)).astype(np.float32)
    # The VJP's contract: the pad columns carry zero cotangents (the
    # compositor's bwd kernel never writes them).
    from msgs.kernels import composite as comp
    cot[:, comp.F_PSIZE + 1:] = 0.0
    gid = jnp.asarray(gid_packed)

    def custom(t):
        out = _gather_payload(t, gid, gid_starts)
        return jnp.sum(out * jnp.asarray(cot))

    def plain(t):
        return jnp.sum(t[gid] * jnp.asarray(cot))

    g_c = jax.grad(custom)(jnp.asarray(table))
    g_p = jax.grad(plain)(jnp.asarray(table))
    # Real rows match plain gather autodiff; the sentinel row is a structural
    # constant (zeros appended by the caller) so the custom path zeroes its
    # gradient where plain autodiff accumulates the dummy cotangents.
    np.testing.assert_allclose(np.asarray(g_c)[:N], np.asarray(g_p)[:N],
                               atol=3e-4)
    assert float(jnp.abs(g_c[N]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(_gather_payload(jnp.asarray(table), gid, gid_starts)),
        np.asarray(jnp.asarray(table)[gid]))
