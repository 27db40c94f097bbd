"""The compositor's static per-sub scans must match a plain per-sub numpy
scan and the legacy run-masked Hillis-Steele scans on per-sub run labels.

(The round-2 cross-sub carry chain `_chain_carries` is gone: since the
per-sub compositor rework, cross-sub chaining rides the carried per-pixel
state in VMEM scratch — its correctness is covered end-to-end by the
kernel-vs-oracle parity tests in test_rasterize.py.)"""
import jax.numpy as jnp
import numpy as np

from msgs.kernels import composite as comp
from msgs.kernels.binning import BLOCK, SUB


def _runs_to_tidcol(tids):
    return jnp.concatenate(
        [jnp.full((SUB, 1), float(t), jnp.float32) for t in tids], axis=0)


def _legacy_scan(x, tid_col, mode):
    B = x.shape[0]
    y = x
    k = 1
    while k < B:
        if mode == "mul":
            pad_x = jnp.ones((k,) + x.shape[1:], x.dtype)
        else:
            pad_x = jnp.zeros((k,) + x.shape[1:], x.dtype)
        pad_t = jnp.full((k, 1), -1.0, tid_col.dtype)
        ysh = jnp.concatenate([pad_x, y[:-k]], axis=0)
        tsh = jnp.concatenate([pad_t, tid_col[:-k]], axis=0)
        if mode == "mul":
            y = y * jnp.where(tid_col == tsh, ysh, 1.0)
        else:
            y = y + jnp.where(tid_col == tsh, ysh, 0.0)
        k *= 2
    return y


def _numpy_per_sub(x, mode):
    out = np.empty_like(x)
    for k in range(x.shape[0] // SUB):
        seg = x[k * SUB:(k + 1) * SUB]
        out[k * SUB:(k + 1) * SUB] = (
            np.cumprod(seg, axis=0) if mode == "mul"
            else np.cumsum(seg, axis=0))
    return out


def test_static_per_sub_scans():
    rng = np.random.default_rng(3)
    x_np = 1.0 - 0.5 * rng.random((BLOCK, comp.NPIX)).astype(np.float32)
    x = jnp.asarray(x_np)

    got_mul = np.asarray(comp._sub_cumprod_static(x))
    np.testing.assert_allclose(got_mul, _numpy_per_sub(x_np, "mul"),
                               rtol=2e-6)
    got_add = np.asarray(comp._sub_cumsum_static(x))
    np.testing.assert_allclose(got_add, _numpy_per_sub(x_np, "add"),
                               rtol=2e-5, atol=1e-5)

    # With distinct per-sub run labels the legacy run-masked scans segment
    # at exactly the SUB boundaries — the static scans must agree.
    tc = _runs_to_tidcol(list(range(1, BLOCK // SUB + 1)))
    np.testing.assert_allclose(got_mul, np.asarray(_legacy_scan(x, tc, "mul")),
                               rtol=2e-6)
    np.testing.assert_allclose(got_add, np.asarray(_legacy_scan(x, tc, "add")),
                               rtol=2e-5, atol=1e-5)
