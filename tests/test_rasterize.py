"""Rasterizer correctness: production pipeline vs independent brute-force
oracle, and Pallas kernels vs the jnp reference compositor (values + grads).
This is BASELINE.md config 1 (CPU-runnable parity gate)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msgs.core.camera import make_camera
from msgs.kernels.preprocess import preprocess
from msgs.kernels.rasterize import RasterSettings, rasterize
from tests.helpers import brute_force_render, identity_camera, make_scene

W = H = 64
N = 200


@pytest.fixture(scope="module")
def scene():
    return make_scene(n=N, seed=1, sh_degree=0)


@pytest.fixture(scope="module")
def camera():
    return identity_camera(W, H)


def _render(camera, scene, backend, **kw):
    means, scales, quats, opac, shs = scene
    settings = RasterSettings(backend=backend, entry_cap=1 << 15,
                              **{k: kw.pop(k) for k in list(kw)
                                 if k in ("filter_small", "filter_large")})
    return rasterize(
        camera, jnp.asarray(means), jnp.asarray(opac),
        shs=jnp.asarray(shs), scales=jnp.asarray(scales),
        quats=jnp.asarray(quats), active_sh_degree=0,
        bg=jnp.array([0.2, 0.3, 0.4]), settings=settings, **kw)


def test_reference_vs_bruteforce(camera, scene):
    means, scales, quats, opac, shs = scene
    out = _render(camera, scene, "reference")
    assert int(out.overflow) == 0

    pre = preprocess(camera, jnp.asarray(means), jnp.asarray(opac),
                     shs=jnp.asarray(shs), scales=jnp.asarray(scales),
                     quats=jnp.asarray(quats), active_sh_degree=0)
    img, dep, T = brute_force_render(
        camera, np.asarray(pre.means2d), np.asarray(pre.conics),
        np.asarray(pre.colors), np.asarray(pre.opacities),
        np.asarray(pre.depths), np.asarray(pre.radii),
        np.asarray(pre.visible), [0.2, 0.3, 0.4], W, H)

    np.testing.assert_allclose(np.asarray(out.image), img, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), dep, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.transmittance), T, atol=2e-5)


def test_pallas_matches_reference(camera, scene):
    ref = _render(camera, scene, "reference")
    pal = _render(camera, scene, "pallas")
    np.testing.assert_allclose(np.asarray(pal.image), np.asarray(ref.image),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal.pixel_sizes),
                               np.asarray(ref.pixel_sizes), atol=1e-5)


@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_gradients_match(camera, scene, backend):
    """Gradients through the full rasterizer: pallas custom_vjp must match
    the autodiff of the jnp oracle."""
    means, scales, quats, opac, shs = scene
    target = jnp.zeros((H, W, 3))

    def loss_fn(means3d, scales_, quats_, opac_, shs_, probe):
        settings = RasterSettings(backend=backend, entry_cap=1 << 15)
        out = rasterize(
            camera, means3d, opac_, shs=shs_, scales=scales_, quats=quats_,
            active_sh_degree=0, bg=jnp.array([0.2, 0.3, 0.4]),
            means2d_probe=probe, settings=settings)
        return jnp.mean((out.image - target) ** 2)

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), jnp.zeros((N, 2)))
    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_image_grads_only_matches_full(camera, scene):
    """The trainer's image_grads_only fast path must produce identical
    parameter gradients for an image-only loss (incl. the T·bg background
    term) as the reference backend's full autodiff."""
    means, scales, quats, opac, shs = scene
    target = jnp.zeros((H, W, 3))

    def make_loss(backend, image_only):
        def loss_fn(means3d, scales_, quats_, opac_, shs_):
            settings = RasterSettings(backend=backend, entry_cap=1 << 15,
                                      image_grads_only=image_only)
            out = rasterize(
                camera, means3d, opac_, shs=shs_, scales=scales_,
                quats=quats_, active_sh_degree=0,
                bg=jnp.array([0.2, 0.3, 0.4]), settings=settings)
            return jnp.mean((out.image - target) ** 2)
        return loss_fn

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))
    g_ref = jax.grad(make_loss("reference", False),
                     argnums=tuple(range(5)))(*args)
    g_pal = jax.grad(make_loss("pallas", True),
                     argnums=tuple(range(5)))(*args)
    for name, a, b in zip(["means", "scales", "quats", "opac", "shs"],
                          g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=3e-5 * scale + 1e-6,
                                   err_msg=f"grad mismatch: {name}")
        assert np.abs(a).max() > 0, f"zero gradient for {name}"


def test_grads_cross_backend(camera, scene):
    means, scales, quats, opac, shs = scene
    target = jnp.zeros((H, W, 3))

    def make_loss(backend):
        def loss_fn(means3d, scales_, quats_, opac_, shs_, probe):
            settings = RasterSettings(backend=backend, entry_cap=1 << 15)
            out = rasterize(
                camera, means3d, opac_, shs=shs_, scales=scales_,
                quats=quats_, active_sh_degree=0,
                bg=jnp.array([0.2, 0.3, 0.4]), means2d_probe=probe,
                settings=settings)
            return (jnp.mean((out.image - target) ** 2)
                    + 0.1 * jnp.mean(out.depth) + 0.1 * jnp.mean(out.acc_pixel_size)
                    + 0.01 * jnp.mean(out.transmittance))
        return loss_fn

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), jnp.zeros((N, 2)))
    g_ref = jax.grad(make_loss("reference"), argnums=tuple(range(6)))(*args)
    g_pal = jax.grad(make_loss("pallas"), argnums=tuple(range(6)))(*args)
    names = ["means", "scales", "quats", "opac", "shs", "probe"]
    for name, a, b in zip(names, g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        # 3e-5·max: the scatter-free segmented-sum VJP uses global prefix
        # differences whose rounding differs slightly between backends.
        np.testing.assert_allclose(b, a, atol=3e-5 * scale + 1e-6,
                                   err_msg=f"grad mismatch: {name}")
        assert np.abs(a).max() > 0, f"zero gradient for {name}"


def _assert_bf16_grad_close(p, e, name):
    """bf16-mode gradient tolerance: absolute bound at 2e-2·max PLUS a
    relative bound on significant entries — atol-only permits unbounded
    relative error on small-magnitude entries and could mask a localized
    bug in the fast path (ADVICE r4). Measured error profile of the bf16
    paths on this scene (r5): entries ≥ 1e-2·max agree to q99 ≤ 6.8%
    relative across every param; below that floor, cancellation in the
    mean-centred moment sums amplifies the ~2^-8-per-contribution rounding
    to 15-28% on the geometry grads — the documented numeric character of
    the opt-in fast modes, bounded absolutely by the atol above."""
    scale = max(np.abs(e).max(), 1e-8)
    np.testing.assert_allclose(p, e, atol=2e-2 * scale,
                               err_msg=f"bf16 grad mismatch: {name}")
    sig = np.abs(e) > 1e-2 * scale
    if sig.any():
        rel = np.abs(p[sig] - e[sig]) / np.abs(e[sig])
        q99 = float(np.quantile(rel, 0.99))
        assert q99 < 0.10, (
            f"bf16 grad relative error too large for {name}: "
            f"q99={q99:.3f} over {int(sig.sum())} significant entries")


def test_bwd_bf16_close(camera, scene):
    """bwd_bf16 (MXU bf16 moment/prefix contractions in the backward
    kernel) must reproduce the exact-f32 gradients to bf16-contribution
    tolerance, and must leave forward values bit-identical (only the
    backward pass changes)."""
    means, scales, quats, opac, shs = scene

    def run(flag):
        settings = RasterSettings(backend="pallas", entry_cap=1 << 15,
                                  bwd_bf16=flag)

        def loss_fn(means3d, scales_, quats_, opac_, shs_, probe):
            out = rasterize(
                camera, means3d, opac_, shs=shs_, scales=scales_,
                quats=quats_, active_sh_degree=0,
                bg=jnp.array([0.2, 0.3, 0.4]), means2d_probe=probe,
                settings=settings)
            return jnp.sum(out.image * jnp.cos(out.image)), out.image

        args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                jnp.asarray(opac), jnp.asarray(shs), jnp.zeros((N, 2)))
        (loss, img), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3, 4, 5), has_aux=True)(*args)
        return img, grads

    img_e, exact = run(False)
    img_f, fast = run(True)
    np.testing.assert_array_equal(np.asarray(img_f), np.asarray(img_e))
    names = ["means", "scales", "quats", "opac", "shs", "probe"]
    for name, e, p in zip(names, exact, fast):
        e, p = np.asarray(e), np.asarray(p)
        _assert_bf16_grad_close(p, e, name)
        assert np.abs(p).max() > 0


def test_grad_pack_bf16_close(camera, scene):
    """grad_pack_bf16 (bf16-paired VJP sort operands) must reproduce the
    exact-f32 gradients to bf16-contribution tolerance — a speed/precision
    trade gated off the strict parity path (RasterSettings docstring)."""
    means, scales, quats, opac, shs = scene

    def grads(pack):
        settings = RasterSettings(backend="pallas", entry_cap=1 << 15,
                                  grad_pack_bf16=pack)

        def loss_fn(means3d, scales_, quats_, opac_, shs_):
            out = rasterize(
                camera, means3d, opac_, shs=shs_, scales=scales_,
                quats=quats_, active_sh_degree=0,
                bg=jnp.array([0.2, 0.3, 0.4]), settings=settings)
            return jnp.sum(out.image * jnp.cos(out.image))

        return jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))

    exact = grads(False)
    packed = grads(True)
    for name, e, p in zip(["means", "scales", "quats", "opac", "shs"],
                          exact, packed):
        e, p = np.asarray(e), np.asarray(p)
        _assert_bf16_grad_close(p, e, name)
        # And it must not be trivially zero / exact (the pack is active).
        assert np.abs(p).max() > 0
