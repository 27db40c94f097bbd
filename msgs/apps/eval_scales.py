"""Offline multi-scale evaluation of a saved model.

Computes per-scale PSNR/SSIM (+LPIPS when weights exist) over the train and
test splits of a saved PLY snapshot — the offline counterpart of the
in-train `training_report` multi-scale eval (reference train.py:446-551,
which the reference can only run during training; render.py:24-66 +
metrics.py:36-93 only cover scale 1). Writes eval_scales.json next to the
snapshot and prints one line per (split, scale).

  python -m msgs.apps.eval_scales -m <model_path> [--iteration N]
      [--scales 1 2 4 8] [--skip_train] [--backend pallas]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser("msgs eval_scales")
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-s", "--source_path", default=None)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--scales", nargs="+", type=float,
                   default=[1, 2, 4, 8, 16, 32, 64])
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--n_train_views", type=int, default=5,
                   help="train views evaluated (reference uses 5)")
    p.add_argument("--backend", default="pallas")
    p.add_argument("--entry_cap", type=int, default=1 << 20)
    p.add_argument("--anti_alias", action="store_true",
                   help="filter_small+filter_large, viewer.py:59-64")
    p.add_argument("--fade_ungated", action="store_true",
                   help="with --anti_alias: filter_small keys on the "
                        "current footprint alone (the alternative fade "
                        "reading) — separates eval-time from train-time "
                        "filter effects (BASELINE.md r5)")
    p.add_argument("--fade_size", type=float, default=0.0)
    p.add_argument("--checkpoint", default=None,
                   help="evaluate a chkpntN.npz train state instead of a "
                        "PLY snapshot — lets runs that only saved PLYs at "
                        "their final iteration be evaluated at any "
                        "checkpointed iteration (VERDICT r4 #3: localizing "
                        "the ms28k x1 trajectory needs eval at 21k/24k)")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from msgs.apps.config import load_cfg
    from msgs.apps.render import find_iteration
    from msgs.data.dataset import load_scene
    from msgs.data.ply import read_ply
    from msgs.eval.metrics import l1_loss, psnr, ssim
    from msgs.kernels.rasterize import RasterSettings
    from msgs.model.gaussians import GaussianConfig
    from msgs.train import loop as L
    from msgs.train.checkpoint import load_ply_snapshot

    saved = load_cfg(args.model_path)
    source = args.source_path or saved.get("source_path", "")
    white_bg = bool(saved.get("white_background", False))

    scene = load_scene(source, images_dir=saved.get("images", "images"),
                       eval_split=bool(saved.get("eval", False)),
                       resolution=int(saved.get("resolution", -1)),
                       white_background=white_bg)

    if args.checkpoint:
        # Rebuild the trainer's state template from the persisted cfg (the
        # same path apps/train.py resumes through), then load the npz.
        from msgs.model.gaussians import create_from_points
        from msgs.train.checkpoint import load_train_state
        it = int("".join(c for c in os.path.basename(args.checkpoint)
                         if c.isdigit()) or 0)
        cfg = GaussianConfig(
            sh_degree=int(saved.get("sh_degree", 3)),
            reso_lvls=int(saved.get("ms_train_max_scale", 7)) + 1,
            multi_occ=bool(saved.get("multi_occ", False)),
            multi_dc=bool(saved.get("multi_dc", False)),
            capacity=int(saved.get("capacity", 1 << 17)))
        print(f"Loading {args.checkpoint}")
        # Only the pytree STRUCTURE matters for the template (leaf shapes
        # come from the npz itself — and the checkpoint's capacity may have
        # grown past the cfg value anyway), so seed it with one point.
        template = L.init_train_state(
            create_from_points(cfg, scene.points[:1], scene.colors[:1]))
        state = load_train_state(args.checkpoint, template)
        cfg = cfg._replace(capacity=int(state.gaussians.xyz.shape[0]))
    else:
        it = find_iteration(args.model_path, args.iteration)
        ply = os.path.join(args.model_path, "point_cloud",
                           f"iteration_{it}", "point_cloud.ply")
        print(f"Loading {ply}")
        n = len(read_ply(ply)["x"])
        cap = 1 << max(int(n).bit_length(), 10)
        cfg = GaussianConfig(sh_degree=int(saved.get("sh_degree", 3)),
                             reso_lvls=8, capacity=cap)
        state = L.init_train_state(load_ply_snapshot(ply, cfg))
    settings = RasterSettings(
        backend=args.backend, entry_cap=args.entry_cap,
        filter_small=args.anti_alias, filter_large=args.anti_alias,
        fade_ungated=args.fade_ungated)
    bg = jnp.ones((3,)) if white_bg else jnp.zeros((3,))

    try:
        from msgs.eval.lpips_jax import lpips_fn
        lpips = lpips_fn()
    except Exception:
        lpips = None

    report = {}
    splits = []
    if not args.skip_test and scene.test_views:
        splits.append(("test", scene.test_views))
    if not args.skip_train and scene.train_views:
        splits.append(("train", scene.train_views[:args.n_train_views]))
    for split, views in splits:
        for scale in args.scales:
            lvl = min(max(int(round(math.log2(max(scale, 1)))), 0),
                      cfg.reso_lvls - 1)
            l1s, psnrs, ssims, lpipss, times = [], [], [], [], []
            for view in views:
                cam = view.camera(scale)
                t0 = time.time()
                out = L.eval_render(state, cam, cfg=cfg, settings=settings,
                                    reso_lvl=lvl, bg=bg,
                                    fade_size=args.fade_size)
                img = jnp.clip(out.image, 0, 1)
                img.block_until_ready()
                times.append(time.time() - t0)
                gt = jnp.asarray(view.image(scale))
                l1s.append(float(l1_loss(img, gt)))
                psnrs.append(float(psnr(img, gt)))
                ssims.append(float(ssim(img, gt)))
                if lpips is not None:
                    lpipss.append(float(lpips(img, gt)))
            entry = {"l1": float(np.mean(l1s)),
                     "psnr": float(np.mean(psnrs)),
                     "ssim": float(np.mean(ssims)),
                     # Median: robust to single-dispatch tunnel stalls (see
                     # apps/train.py evaluate_scales).
                     "render_ms": float(np.median(times[1:] or times) * 1000),
                     "render_ms_mean": float(np.mean(times[1:] or times) * 1000)}
            if lpipss:
                entry["lpips"] = float(np.mean(lpipss))
            report[f"{split}_s{scale:g}"] = entry
            print(f"[eval_scales {it}] {split} x{scale:g}: "
                  f"psnr {entry['psnr']:.2f} ssim {entry['ssim']:.4f} "
                  f"l1 {entry['l1']:.4f} {entry['render_ms']:.1f}ms",
                  flush=True)

    tag = "_ungated" if args.fade_ungated else ""
    out_path = os.path.join(args.model_path, f"eval_scales_{it}{tag}.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
