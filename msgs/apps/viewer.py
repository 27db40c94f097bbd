"""Interactive viewer — reference viewer.py:37-177 capability: fly-through
of a trained model with live resolution-scale / fade / gaussian-scale
controls and render / acc-pixel-size / depth panes.

Uses OpenCV windows when a display is available (`--display`), else a
headless mode that writes frames to disk on keypress-scripted trajectories.

Keys (matching viewer.py:107-158): w/s/a/d/q/e move, i/k/j/l rotate,
-/= resolution scale down/up, ;/' fade size, [/] gaussian scale modifier,
p save frame, ESC quit.
"""
from __future__ import annotations

import argparse
import math
import os

import numpy as np


def render_interactive(args):
    import jax.numpy as jnp

    from msgs.apps.config import load_cfg
    from msgs.apps.render import find_iteration
    from msgs.core.camera import make_camera
    from msgs.data.dataset import load_scene
    from msgs.data.ply import read_ply
    from msgs.kernels.rasterize import RasterSettings
    from msgs.model.gaussians import GaussianConfig
    from msgs.train import loop as L
    from msgs.train.checkpoint import load_ply_snapshot

    saved = load_cfg(args.model_path)
    source = args.source_path or saved.get("source_path", "")
    it = find_iteration(args.model_path, args.iteration)
    ply = os.path.join(args.model_path, "point_cloud",
                       f"iteration_{it}", "point_cloud.ply")
    n = len(read_ply(ply)["x"])
    cap = 1 << max(int(n).bit_length(), 10)
    cfg = GaussianConfig(sh_degree=int(saved.get("sh_degree", 3)),
                         reso_lvls=8, capacity=cap)
    state = L.init_train_state(load_ply_snapshot(ply, cfg))

    scene = load_scene(source, eval_split=False,
                       resolution=int(saved.get("resolution", -1)))
    view0 = scene.train_views[0]
    R, T = view0.R.copy(), view0.T.copy()
    fovx, fovy = view0.fovx, view0.fovy
    W0, H0 = view0.width, view0.height

    reso_scale = float(args.reso_scale)
    fade_size = 1.0
    gs_scale = 1.0
    move, rot = 0.1 * scene.cameras_extent, 0.05

    def render_frame():
        w = max(int(W0 / reso_scale) // 16 * 16, 16)
        h = max(int(H0 / reso_scale) // 16 * 16, 16)
        cam = make_camera(R, T, fovx, fovy, w, h)
        settings = RasterSettings(
            backend=args.backend, entry_cap=args.entry_cap,
            filter_small=args.anti_alias, filter_large=args.anti_alias)
        out = L.eval_render(state, cam, cfg=cfg, settings=settings,
                            fade_size=fade_size,
                            scale_modifier=round(gs_scale, 2))
        img = np.clip(np.asarray(out.image), 0, 1)
        acc = np.asarray(out.acc_pixel_size)
        acc = acc / max(acc.max(), 1e-6)
        depth = np.asarray(out.depth)
        depth = depth / max(depth.max(), 1e-6)
        return img, acc, depth

    if not args.display:
        img, acc, depth = render_frame()
        import imageio.v2 as imageio
        os.makedirs(args.out_dir, exist_ok=True)
        imageio.imwrite(os.path.join(args.out_dir, "view.png"),
                        (img * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(args.out_dir, "acc.png"),
                        (acc * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(args.out_dir, "depth.png"),
                        (depth * 255).astype(np.uint8))
        print(f"headless: wrote view/acc/depth to {args.out_dir} "
              f"(reso x{reso_scale}, anti_alias={args.anti_alias})")
        return

    import cv2
    while True:
        img, acc, depth = render_frame()
        cv2.imshow("render", img[..., ::-1])
        cv2.imshow("acc_pixel_size", acc)
        cv2.imshow("depth", depth)
        k = cv2.waitKey(1) & 0xFF
        fwd = R[:, 2]
        right = R[:, 0]
        up = R[:, 1]
        if k == 27:
            break
        elif k == ord("w"):
            T[2] -= move
        elif k == ord("s"):
            T[2] += move
        elif k == ord("a"):
            T[0] += move
        elif k == ord("d"):
            T[0] -= move
        elif k == ord("q"):
            T[1] += move
        elif k == ord("e"):
            T[1] -= move
        elif k in (ord("i"), ord("k"), ord("j"), ord("l")):
            ang = {-1: -rot, 1: rot}
            axis = {"i": (0, -rot), "k": (0, rot),
                    "j": (1, -rot), "l": (1, rot)}[chr(k)]
            c, s = math.cos(axis[1]), math.sin(axis[1])
            if axis[0] == 0:
                Rx = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
                R = R @ Rx
            else:
                Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
                R = R @ Ry
        elif k == ord("-"):
            reso_scale = min(reso_scale * 2, 128)
        elif k == ord("="):
            reso_scale = max(reso_scale / 2, 1)
        elif k == ord(";"):
            fade_size = max(fade_size - 0.1, 0.0)
        elif k == ord("'"):
            fade_size = min(fade_size + 0.1, 2.0)
        elif k == ord("["):
            gs_scale = max(gs_scale - 0.1, 0.1)
        elif k == ord("]"):
            gs_scale += 0.1
        elif k == ord("p"):
            import imageio.v2 as imageio
            os.makedirs(args.out_dir, exist_ok=True)
            imageio.imwrite(os.path.join(args.out_dir, "frame.png"),
                            (img * 255).astype(np.uint8))
    cv2.destroyAllWindows()


def main(argv=None):
    p = argparse.ArgumentParser("msgs viewer")
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-s", "--source_path", default=None)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--anti_alias", action="store_true")
    p.add_argument("--reso_scale", type=float, default=1.0)
    p.add_argument("--display", action="store_true",
                   help="use OpenCV windows (needs a display)")
    p.add_argument("--out_dir", default="viewer_out")
    p.add_argument("--backend", default="pallas")
    p.add_argument("--entry_cap", type=int, default=1 << 20)
    render_interactive(p.parse_args(argv))


if __name__ == "__main__":
    main()
