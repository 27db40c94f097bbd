"""Offline render CLI — reference render.py:24-66 equivalent.

Renders train/test splits of a saved model to PNG pairs
(<model>/<split>/ours_<iter>/{renders,gt}) for metrics.py.

  python -m msgs.apps.render -m <model_path> [--iteration N] [--skip_train]
      [--skip_test] [--reso_scale S] [--anti_alias]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def find_iteration(model_path: str, iteration: int) -> int:
    base = os.path.join(model_path, "point_cloud")
    if iteration != -1:
        return iteration
    iters = [int(d.split("_")[-1]) for d in os.listdir(base)
             if d.startswith("iteration_")]
    return max(iters)


def render_sets(args):
    import jax.numpy as jnp

    from msgs.apps.config import load_cfg
    from msgs.data.dataset import load_scene
    from msgs.kernels.rasterize import RasterSettings
    from msgs.model.gaussians import GaussianConfig
    from msgs.train import loop as L
    from msgs.train.checkpoint import load_ply_snapshot

    saved = load_cfg(args.model_path)
    source = args.source_path or saved.get("source_path", "")
    sh_degree = int(saved.get("sh_degree", 3))
    white_bg = bool(saved.get("white_background", False))

    it = find_iteration(args.model_path, args.iteration)
    ply = os.path.join(args.model_path, "point_cloud",
                       f"iteration_{it}", "point_cloud.ply")
    print(f"Loading {ply}")

    from msgs.data.ply import read_ply
    n = len(read_ply(ply)["x"])
    cap = 1 << max(int(n).bit_length(), 10)
    cfg = GaussianConfig(sh_degree=sh_degree, reso_lvls=8, capacity=cap)
    st = load_ply_snapshot(ply, cfg)
    state = L.init_train_state(st)

    scene = load_scene(source, images_dir=saved.get("images", "images"),
                       eval_split=bool(saved.get("eval", False)),
                       resolution=int(saved.get("resolution", -1)),
                       white_background=white_bg)
    settings = RasterSettings(
        backend=args.backend, entry_cap=args.entry_cap,
        filter_small=args.anti_alias, filter_large=args.anti_alias)
    bg = jnp.ones((3,)) if white_bg else jnp.zeros((3,))

    import imageio.v2 as imageio
    for split, views in (("train", scene.train_views),
                        ("test", scene.test_views)):
        if (split == "train" and args.skip_train) or \
           (split == "test" and args.skip_test) or not views:
            continue
        out_dir = os.path.join(args.model_path, split, f"ours_{it}")
        rdir = os.path.join(out_dir, "renders")
        gdir = os.path.join(out_dir, "gt")
        os.makedirs(rdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)
        for i, view in enumerate(views):
            cam = view.camera(args.reso_scale)
            out = L.eval_render(state, cam, cfg=cfg, settings=settings,
                                bg=bg, fade_size=args.fade_size)
            img = np.clip(np.asarray(out.image), 0, 1)
            gt = view.image(args.reso_scale)
            imageio.imwrite(os.path.join(rdir, f"{i:05d}.png"),
                            (img * 255).astype(np.uint8))
            imageio.imwrite(os.path.join(gdir, f"{i:05d}.png"),
                            (np.clip(gt, 0, 1) * 255).astype(np.uint8))
            view.drop_cache()
        print(f"[render] {split}: {len(views)} views -> {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser("msgs render")
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-s", "--source_path", default=None)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--reso_scale", type=float, default=1.0)
    p.add_argument("--fade_size", type=float, default=0.0)
    p.add_argument("--anti_alias", action="store_true")
    p.add_argument("--backend", default="pallas")
    p.add_argument("--entry_cap", type=int, default=1 << 20)
    render_sets(p.parse_args(argv))


if __name__ == "__main__":
    main()
