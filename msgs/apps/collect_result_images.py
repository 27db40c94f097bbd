"""Per-image qualitative comparison grids — the capability of the
reference's `utils/collect_result_images.py` (1-288), re-architected
headless: instead of scraping rendered images out of TensorBoard event
files and compositing them in a tkinter UI, this renders each method's
saved model directly at the requested view/scale matrix and exports
labeled comparison figures (rows = scales, columns = GT + methods, the
reference's qualitative-figure layout) plus a per-image PSNR CSV.

  python -m msgs.apps.collect_result_images -m <out_root>/<scene> \
      [--methods base ms] [--scales 1 8 32] [--views 0 2] [-o figs/]

Each `<out_root>/<scene>/<method>` is a trained model dir as produced by
msgs.apps.train_all (cfg_args + point_cloud/iteration_*/point_cloud.ply).
"""
from __future__ import annotations

import argparse
import csv
import os

import numpy as np

# Display names, reference collect_result_images.py:34-41.
FULL_NAMES = {
    "gt": "Ground Truth",
    "base": "3DGS",
    "abl_ms_train": "3DGS+MS Train",
    "abl_filter_small": "3DGS+Filter Small",
    "abl_insert_large": "3DGS+Insert Large",
    "ms": "Full Method",
}


def _label(img: np.ndarray, text: str) -> np.ndarray:
    """Burn a text label into the bottom-left corner (PIL when available,
    reference add_text_to_image:54-97; silently skipped otherwise)."""
    try:
        from PIL import Image, ImageDraw
        im = Image.fromarray(img)
        draw = ImageDraw.Draw(im)
        h = im.size[1]
        draw.text((4, h - 14), text, fill=(255, 255, 255))
        draw.text((3, h - 15), text, fill=(0, 0, 0))
        return np.asarray(im)
    except Exception:
        return img


def _load_model(model_path: str, iteration: int):
    from msgs.apps.config import load_cfg
    from msgs.apps.render import find_iteration
    from msgs.data.ply import read_ply
    from msgs.model.gaussians import GaussianConfig
    from msgs.train import loop as L
    from msgs.train.checkpoint import load_ply_snapshot

    saved = load_cfg(model_path)
    it = find_iteration(model_path, iteration)
    ply = os.path.join(model_path, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    n = len(read_ply(ply)["x"])
    cap = 1 << max(int(n).bit_length(), 10)
    cfg = GaussianConfig(sh_degree=int(saved.get("sh_degree", 3)),
                         reso_lvls=8, capacity=cap)
    state = L.init_train_state(load_ply_snapshot(ply, cfg))
    return state, cfg, saved, it


def main(argv=None):
    p = argparse.ArgumentParser("msgs collect_result_images")
    p.add_argument("-m", "--scene_root", required=True,
                   help="<out_root>/<scene> containing one dir per method")
    p.add_argument("-o", "--out_dir", default=None)
    p.add_argument("--methods", nargs="+", default=None)
    p.add_argument("--scales", nargs="+", type=float,
                   default=[1, 8, 32])
    p.add_argument("--views", nargs="+", type=int, default=None,
                   help="test-view indices (default: first 2)")
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--width_ratio", type=float, default=0.6,
                   help="center-crop fraction of width "
                        "(collect_result_images.py:49)")
    p.add_argument("--anti_alias", action="store_true",
                   help="render every method with filter_small+filter_large "
                        "instead of each method's own flags")
    p.add_argument("--backend", default="auto")
    p.add_argument("--entry_cap", type=int, default=1 << 20)
    args = p.parse_args(argv)

    import imageio.v2 as imageio
    import jax.numpy as jnp

    from msgs.data.dataset import load_scene
    from msgs.eval.metrics import psnr
    from msgs.kernels.rasterize import RasterSettings
    from msgs.train import loop as L

    methods = args.methods or sorted(
        d for d in os.listdir(args.scene_root)
        if os.path.isdir(os.path.join(args.scene_root, d, "point_cloud")))
    if not methods:
        raise SystemExit(f"no trained methods under {args.scene_root}")
    out_dir = args.out_dir or os.path.join(args.scene_root, "figures")
    os.makedirs(out_dir, exist_ok=True)

    # Scene comes from the first method's saved config (all methods of a
    # scene share the source).
    states = {}
    scene = None
    for m in methods:
        state, cfg, saved, it = _load_model(
            os.path.join(args.scene_root, m), args.iteration)
        if scene is None:
            scene = load_scene(
                saved.get("source_path", ""),
                images_dir=saved.get("images", "images"),
                eval_split=bool(saved.get("eval", False)),
                resolution=int(saved.get("resolution", -1)),
                white_background=bool(saved.get("white_background", False)))
        flt = args.anti_alias or bool(saved.get("filter_small", False))
        fll = args.anti_alias or bool(saved.get("insert_large", False)) \
            or bool(saved.get("grow_large", False))
        settings = RasterSettings(backend=args.backend,
                                  entry_cap=args.entry_cap,
                                  filter_small=flt, filter_large=fll)
        states[m] = (state, cfg, settings, it,
                     bool(saved.get("white_background", False)))

    views = scene.test_views or scene.train_views
    idxs = args.views if args.views is not None else list(
        range(min(2, len(views))))

    rows_csv = []
    for vi in idxs:
        view = views[vi]
        rows = []
        for scale in args.scales:
            lvl = int(round(np.log2(max(scale, 1))))
            cam = view.camera(scale)
            gt = np.asarray(view.image(scale))
            cols = [_label((np.clip(gt, 0, 1) * 255).astype(np.uint8),
                           FULL_NAMES["gt"] + f"  x{scale:g}")]
            for m in methods:
                state, cfg, settings, it, white = states[m]
                bg = jnp.ones((3,)) if white else jnp.zeros((3,))
                out = L.eval_render(state, cam, cfg=cfg, settings=settings,
                                    reso_lvl=min(lvl, cfg.reso_lvls - 1),
                                    bg=bg)
                img = np.clip(np.asarray(out.image), 0, 1)
                val = float(psnr(jnp.asarray(img), jnp.asarray(gt)))
                rows_csv.append([vi, scale, m, f"{val:.3f}"])
                cols.append(_label((img * 255).astype(np.uint8),
                                   f"{FULL_NAMES.get(m, m)}  {val:.1f}dB"))
            # Center crop (reference width_ratio) then upsample coarse
            # scales to the finest row's width for a rectangular grid.
            w = cols[0].shape[1]
            cw = max(int(w * args.width_ratio), 1)
            x0 = (w - cw) // 2
            cols = [c[:, x0:x0 + cw] for c in cols]
            row = np.concatenate(cols, axis=1)
            if rows:
                reps = max(rows[0].shape[1] // row.shape[1], 1)
                row = np.repeat(np.repeat(row, reps, 0), reps, 1)
                row = row[:, :rows[0].shape[1]]
            rows.append(row)
        width = max(r.shape[1] for r in rows)
        rows = [np.pad(r, ((0, 0), (0, width - r.shape[1]), (0, 0)))
                for r in rows]
        fig = np.concatenate(rows, axis=0)
        path = os.path.join(out_dir, f"view{vi:03d}.png")
        imageio.imwrite(path, fig)
        print(f"wrote {path}")

    with open(os.path.join(out_dir, "per_image_psnr.csv"), "w",
              newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(["view", "scale", "method", "psnr"])
        wtr.writerows(rows_csv)
    print(f"wrote {os.path.join(out_dir, 'per_image_psnr.csv')}")


if __name__ == "__main__":
    main()
