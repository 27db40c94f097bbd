"""Offline metric evaluation — reference metrics.py:36-103 equivalent.

Walks <model>/<split>/ours_<iter>/{renders,gt}, computes per-image
SSIM / PSNR / LPIPS (LPIPS gated on available weights — see eval/lpips_jax),
writes results.json + per_view.json in the reference's format.

  python -m msgs.apps.metrics -m <model_path> [<model_path2> ...]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def evaluate(model_paths, splits=("test",)):
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from msgs.eval.metrics import psnr, ssim
    try:
        from msgs.eval.lpips_jax import lpips_fn
        lpips = lpips_fn()
    except Exception:
        lpips = None

    for model_path in model_paths:
        print(f"Evaluating {model_path}")
        full, per_view = {}, {}
        for split in splits:
            split_dir = os.path.join(model_path, split)
            if not os.path.isdir(split_dir):
                continue
            for method in sorted(os.listdir(split_dir)):
                mdir = os.path.join(split_dir, method)
                rdir = os.path.join(mdir, "renders")
                gdir = os.path.join(mdir, "gt")
                if not (os.path.isdir(rdir) and os.path.isdir(gdir)):
                    continue
                ssims, psnrs, lpipss, names = [], [], [], []
                for fname in sorted(os.listdir(rdir)):
                    r = np.asarray(imageio.imread(
                        os.path.join(rdir, fname)))[..., :3] / 255.0
                    g = np.asarray(imageio.imread(
                        os.path.join(gdir, fname)))[..., :3] / 255.0
                    r, g = jnp.asarray(r, jnp.float32), jnp.asarray(
                        g, jnp.float32)
                    ssims.append(float(ssim(r, g)))
                    psnrs.append(float(psnr(r, g)))
                    if lpips is not None:
                        lpipss.append(float(lpips(r, g)))
                    names.append(fname)
                entry = {
                    "SSIM": float(np.mean(ssims)),
                    "PSNR": float(np.mean(psnrs)),
                }
                if lpipss:
                    entry["LPIPS"] = float(np.mean(lpipss))
                full[method] = entry
                per_view[method] = {
                    "SSIM": dict(zip(names, ssims)),
                    "PSNR": dict(zip(names, psnrs)),
                    **({"LPIPS": dict(zip(names, lpipss))} if lpipss else {}),
                }
                print(f"  {method}: PSNR {entry['PSNR']:.4f} "
                      f"SSIM {entry['SSIM']:.4f}"
                      + (f" LPIPS {entry['LPIPS']:.4f}"
                         if "LPIPS" in entry else ""))
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


def main(argv=None):
    p = argparse.ArgumentParser("msgs metrics")
    p.add_argument("-m", "--model_paths", nargs="+", required=True)
    p.add_argument("--splits", nargs="+", default=["test"])
    a = p.parse_args(argv)
    evaluate(a.model_paths, a.splits)


if __name__ == "__main__":
    main()
