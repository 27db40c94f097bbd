"""The compositor's static per-sub scans + scalar carry chain must equal the
legacy run-masked Hillis-Steele scans for any tile-run structure the binner
can emit (runs break only at SUB boundaries)."""
import jax.numpy as jnp
import numpy as np

from msgs.kernels import composite as comp
from msgs.kernels.binning import BLOCK, SUB


def _runs_to_tidcol(tids):
    return jnp.concatenate(
        [jnp.full((SUB, 1), float(t), jnp.float32) for t in tids], axis=0)


def _legacy_cumprod(x, tid_col):
    B = x.shape[0]
    y = x
    k = 1
    while k < B:
        pad_x = jnp.ones((k,) + x.shape[1:], x.dtype)
        pad_t = jnp.full((k, 1), -1.0, tid_col.dtype)
        ysh = jnp.concatenate([pad_x, y[:-k]], axis=0)
        tsh = jnp.concatenate([pad_t, tid_col[:-k]], axis=0)
        y = y * jnp.where(tid_col == tsh, ysh, 1.0)
        k *= 2
    return y


def _static_chain(x, tids, mode):
    loc = (comp._sub_cumprod_static(x) if mode == "mul"
           else comp._sub_cumsum_static(x))
    fresh = [None] + [tids[k] != tids[k - 1] for k in range(1, comp.NSUB)]
    carries = comp._chain_carries(loc, [jnp.asarray(f) if f is not None
                                        else None for f in fresh], mode)
    op = (lambda a, b: a * b) if mode == "mul" else (lambda a, b: a + b)
    return jnp.concatenate(
        [op(loc[k * SUB:(k + 1) * SUB], carries[k])
         for k in range(comp.NSUB)], axis=0)


def test_static_scans_match_legacy():
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        1.0 - 0.5 * rng.random((BLOCK, comp.NPIX)).astype(np.float32))
    for tids in ([5, 5, 5, 5], [1, 2, 3, 4], [7, 7, 9, 9], [2, 2, 2, 8]):
        tc = _runs_to_tidcol(tids)
        got = _static_chain(x, tids, "mul")
        want = _legacy_cumprod(x, tc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-6, err_msg=f"mul {tids}")
        got_s = _static_chain(x, tids, "add")
        want_s = comp._seg_cumsum_rows(x, tc)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=2e-5, atol=1e-5,
                                   err_msg=f"add {tids}")
