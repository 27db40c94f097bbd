"""Trajectory video renderer — reference render_traj.py:40-317 capability:
render generated camera paths (circle / spiral) with a sinusoidally varying
resolution scale, per-frame wall-clock timing, and frame-time-synced video
export.

  python -m msgs.apps.traj -m <model> [--traj circle|spiral] [--n_frames N]
      [--anti_alias] [--min_scale 1 --max_scale 64]
"""
from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np


def circle_trajectory(views, n_frames: int, radius_frac: float = 0.3):
    """Camera positions on a circle around the centroid of the training
    cameras, looking at the scene center (render_traj generate_circle
    semantics)."""
    centers = []
    for v in views:
        W2C = np.eye(4)
        W2C[:3, :3] = v.R.T
        W2C[:3, 3] = v.T
        C2W = np.linalg.inv(W2C)
        centers.append(C2W[:3, 3])
    centers = np.stack(centers)
    centroid = centers.mean(0)
    radius = np.linalg.norm(centers - centroid, axis=1).mean() * radius_frac
    base = views[0]
    up = base.R[:, 1]

    frames = []
    for i in range(n_frames):
        ang = 2 * math.pi * i / n_frames
        offset = (math.cos(ang) * base.R[:, 0]
                  + math.sin(ang) * base.R[:, 2]) * radius
        pos = centroid + offset
        fwd = centroid - pos
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R = np.stack([right, true_up, fwd], axis=1)
        T = -R.T @ pos
        frames.append((R, T))
    return frames


def spiral_trajectory(views, n_frames: int):
    frames = circle_trajectory(views, n_frames)
    out = []
    for i, (R, T) in enumerate(frames):
        lift = 0.1 * math.sin(4 * math.pi * i / n_frames)
        out.append((R, T + np.array([0, lift, 0])))
    return out


def render_trajectory(args):
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

    gen = circle_trajectory if args.traj == "circle" else spiral_trajectory
    frames = gen(scene.train_views, args.n_frames)
    v0 = scene.train_views[0]

    settings = RasterSettings(
        backend=args.backend, entry_cap=args.entry_cap,
        filter_small=args.anti_alias, filter_large=args.anti_alias)

    os.makedirs(args.out_dir, exist_ok=True)
    images, times = [], []
    for i, (R, T) in enumerate(frames):
        # Sinusoidal resolution sweep min_scale ↔ max_scale
        # (render_traj.py:85-96).
        t = 0.5 - 0.5 * math.cos(2 * math.pi * i / args.n_frames)
        scale = args.min_scale * (args.max_scale / args.min_scale) ** t
        w = max(int(v0.width / scale) // 16 * 16, 16)
        h = max(int(v0.height / scale) // 16 * 16, 16)
        cam = make_camera(R, T, v0.fovx, v0.fovy, w, h)
        t0 = time.time()
        out = L.eval_render(state, cam, cfg=cfg, settings=settings,
                            fade_size=args.fade_size)
        out.image.block_until_ready()
        times.append(time.time() - t0)
        img = np.clip(np.asarray(out.image), 0, 1)
        # upscale to base resolution for a steady video
        import cv2
        img = cv2.resize(img, (v0.width, v0.height),
                         interpolation=cv2.INTER_NEAREST)
        images.append((img * 255).astype(np.uint8))
        if i % 10 == 0:
            print(f"frame {i}/{args.n_frames} x{scale:.1f} "
                  f"{times[-1]*1000:.1f}ms")

    video_path = os.path.join(args.out_dir, "trajectory.mp4")
    import imageio.v2 as imageio
    imageio.mimwrite(video_path, images, fps=args.fps)
    print(f"wrote {video_path}; mean render "
          f"{np.mean(times)*1000:.1f}ms/frame")
    with open(os.path.join(args.out_dir, "frame_times.txt"), "w") as f:
        f.writelines(f"{t*1000:.2f}\n" for t in times)


def main(argv=None):
    p = argparse.ArgumentParser("msgs traj")
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-s", "--source_path", default=None)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--traj", choices=["circle", "spiral"], default="circle")
    p.add_argument("--n_frames", type=int, default=120)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--min_scale", type=float, default=1.0)
    p.add_argument("--max_scale", type=float, default=64.0)
    p.add_argument("--fade_size", type=float, default=1.0)
    p.add_argument("--anti_alias", action="store_true")
    p.add_argument("--out_dir", default="traj_out")
    p.add_argument("--backend", default="pallas")
    p.add_argument("--entry_cap", type=int, default=1 << 20)
    render_trajectory(p.parse_args(argv))


if __name__ == "__main__":
    main()
