"""LPIPS perceptual metric in JAX.

Functional port of the capability of the reference lpipsPyTorch/ (~180 LoC:
VGG16/AlexNet/SqueezeNet feature towers + learned linear heads). This
environment has no torchvision and no network egress, so pretrained conv
weights cannot be materialized here; the implementation loads them from an
.npz produced by `export_weights_from_torch` (run once on any machine with
torchvision + the LPIPS linear heads) and `lpips_fn()` raises a clear error
when weights are absent — metrics.py then reports PSNR/SSIM only, exactly
like the reference does when lpipsPyTorch's deps are missing.

Weight file schema (npz): conv_{i}_w (kh,kw,cin,cout), conv_{i}_b (cout,),
lin_{j}_w (1,1,c,1) — VGG16 features up to conv5_3, heads after relus
[3, 8, 15, 22, 29] (the reference's vgg16 slices).
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_ENV = "MSGS_LPIPS_WEIGHTS"
DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "lpips_vgg16.npz")

# VGG16 conv layout: (out_channels, n_convs) per block; relu indices of the
# 5 tap points used by LPIPS-vgg.
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _normalize(x):
    return (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _unit_normalize(f):
    return f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-10)


def build_lpips(weights: dict) -> Callable:
    convs = []
    i = 0
    while f"conv_{i}_w" in weights:
        convs.append((jnp.asarray(weights[f"conv_{i}_w"]),
                      jnp.asarray(weights[f"conv_{i}_b"])))
        i += 1
    lins = []
    j = 0
    while f"lin_{j}_w" in weights:
        lins.append(jnp.asarray(weights[f"lin_{j}_w"]))
        j += 1

    def features(x):
        feats = []
        k = 0
        h = _normalize(x)[None]          # (1, H, W, 3), in [-1, 1] domain
        for bi, (ch, n) in enumerate(_VGG_BLOCKS):
            for _ in range(n):
                w, b = convs[k]
                k += 1
                h = jax.nn.relu(_conv(h, w, b))
            feats.append(h)
            if bi < len(_VGG_BLOCKS) - 1:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
        return feats

    @jax.jit
    def lpips(img, gt):
        """img/gt: (H, W, 3) in [0, 1] → scalar distance (reference lpips()
        semantics: inputs scaled to [-1, 1] internally)."""
        fa = features(img * 2.0 - 1.0)
        fb = features(gt * 2.0 - 1.0)
        total = 0.0
        for f1, f2, lw in zip(fa, fb, lins):
            d = (_unit_normalize(f1) - _unit_normalize(f2)) ** 2
            # lw: (1, 1, c, 1) 1×1 conv head → per-channel weights,
            # clamped non-negative like the reference's NetLinLayer use.
            wch = jnp.maximum(lw.reshape(-1), 0.0)
            total = total + jnp.mean(jnp.sum(d * wch, axis=-1))
        return total

    return lpips


def lpips_fn(path: Optional[str] = None) -> Callable:
    path = path or os.environ.get(WEIGHTS_ENV, DEFAULT_PATH)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS weights not found at {path}. Export them once with "
            f"msgs.eval.lpips_jax.export_weights_from_torch on a machine "
            f"with torchvision, or set ${WEIGHTS_ENV}.")
    return build_lpips(dict(np.load(path)))


def export_weights_from_torch(out_path: str = DEFAULT_PATH):
    """Run on a machine with torchvision + lpips heads available: exports
    VGG16 conv weights (HWIO) + LPIPS linear heads to npz."""
    import torch
    import torchvision
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    out = {}
    i = 0
    for m in vgg:
        if isinstance(m, torch.nn.Conv2d):
            out[f"conv_{i}_w"] = m.weight.detach().permute(
                2, 3, 1, 0).numpy()
            out[f"conv_{i}_b"] = m.bias.detach().numpy()
            i += 1
    # LPIPS linear heads from the official release.
    try:
        import lpips as lpips_pkg
        net = lpips_pkg.LPIPS(net="vgg")
        for j, lin in enumerate(net.lins):
            out[f"lin_{j}_w"] = lin.model[1].weight.detach().permute(
                2, 3, 1, 0).numpy()
    except Exception:
        for j, (ch, _) in enumerate(_VGG_BLOCKS):
            out[f"lin_{j}_w"] = np.full((1, 1, ch, 1), 1.0 / ch, np.float32)
    np.savez(out_path, **out)
    return out_path
