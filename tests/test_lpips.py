"""LPIPS math validation: build_lpips (JAX) vs an independent torch
reimplementation of the reference formula (lpipsPyTorch/modules/lpips.py:
normalize → VGG16 feature taps → unit-normalize → squared diff → 1×1
linear head → spatial mean → sum), on synthetic weights with the real
VGG16-features architecture. No pretrained weights exist in this offline
environment; this pins the conv layout/orientation, tap points, pooling,
and the distance formula so a real weight export drops in verified."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from msgs.eval.lpips_jax import _SCALE, _SHIFT, _VGG_BLOCKS, build_lpips


def _synthetic_weights(rng):
    out = {}
    cin = 3
    i = 0
    for ch, n in _VGG_BLOCKS:
        for _ in range(n):
            out[f"conv_{i}_w"] = rng.normal(
                0, 0.08, (3, 3, cin, ch)).astype(np.float32)
            out[f"conv_{i}_b"] = rng.normal(0, 0.01, (ch,)).astype(
                np.float32)
            cin = ch
            i += 1
    for j, (ch, _) in enumerate(_VGG_BLOCKS):
        out[f"lin_{j}_w"] = np.abs(rng.normal(
            0, 1.0 / ch, (1, 1, ch, 1))).astype(np.float32)
    return out


def _torch_lpips(weights, img, gt):
    """Independent oracle in torch NCHW, following the reference pipeline."""
    import torch.nn.functional as F

    def tower(x):
        # x: (H, W, 3) in [0, 1] → scaled to [-1, 1] → normalized
        x = torch.from_numpy(np.asarray(x)).permute(2, 0, 1)[None] * 2 - 1
        shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
        h = (x - shift) / scale
        feats = []
        i = 0
        for bi, (ch, n) in enumerate(_VGG_BLOCKS):
            for _ in range(n):
                w = torch.from_numpy(
                    weights[f"conv_{i}_w"]).permute(3, 2, 0, 1)
                b = torch.from_numpy(weights[f"conv_{i}_b"])
                h = F.relu(F.conv2d(h, w, b, padding=1))
                i += 1
            feats.append(h)
            if bi < len(_VGG_BLOCKS) - 1:
                h = F.max_pool2d(h, 2)
        return feats

    fa, fb = tower(img), tower(gt)
    total = 0.0
    for j, (f1, f2) in enumerate(zip(fa, fb)):
        n1 = f1 / torch.sqrt((f1 * f1).sum(1, keepdim=True) + 1e-10)
        n2 = f2 / torch.sqrt((f2 * f2).sum(1, keepdim=True) + 1e-10)
        d = (n1 - n2) ** 2
        lw = torch.from_numpy(weights[f"lin_{j}_w"]).permute(3, 2, 0, 1)
        lw = torch.clamp(lw, min=0.0)
        total = total + F.conv2d(d, lw).mean()
    return float(total)


def test_lpips_matches_torch_oracle():
    rng = np.random.default_rng(7)
    weights = _synthetic_weights(rng)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    gt = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32)

    ours = float(build_lpips(weights)(img, gt))
    oracle = _torch_lpips(weights, img, gt)
    assert ours > 0.0
    np.testing.assert_allclose(ours, oracle, rtol=2e-4)

    # Identity distance is ~0.
    assert float(build_lpips(weights)(img, img)) < 1e-9
