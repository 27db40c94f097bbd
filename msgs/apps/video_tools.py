"""Video/figure assembly tooling — capability parity with the reference's
utils/{cut_and_stack_video, concat_tmp, visualize_camera}.py (C22,
SURVEY.md §2.1): cut segments out of videos and stack them side by side,
concatenate image grids, and plot camera trajectories.

  python -m msgs.apps.video_tools cut_and_stack -i a.mp4 b.mp4 -o out.mp4
      [--start 0 --end 5] [--axis h|v]
  python -m msgs.apps.video_tools concat -i img1.png img2.png -o grid.png
      [--cols 2]
  python -m msgs.apps.video_tools visualize_cameras -s <scene> -o cams.png
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def cut_and_stack(inputs, output, start=0.0, end=None, axis="h", fps=30):
    import imageio.v2 as imageio
    clips = []
    for path in inputs:
        reader = imageio.get_reader(path)
        meta = reader.get_meta_data()
        src_fps = meta.get("fps", fps)
        frames = []
        for i, frame in enumerate(reader):
            t = i / src_fps
            if t < start:
                continue
            if end is not None and t > end:
                break
            frames.append(frame)
        reader.close()
        clips.append(frames)
    n = min(len(c) for c in clips)
    h = min(min(f.shape[0] for f in c[:n]) for c in clips)
    w = min(min(f.shape[1] for f in c[:n]) for c in clips)
    stacked = []
    ax = 1 if axis == "h" else 0
    for i in range(n):
        row = [c[i][:h, :w] for c in clips]
        stacked.append(np.concatenate(row, axis=ax))
    imageio.mimwrite(output, stacked, fps=fps)
    print(f"wrote {output} ({n} frames)")


def concat_images(inputs, output, cols=None):
    import imageio.v2 as imageio
    imgs = [np.asarray(imageio.imread(p)) for p in inputs]
    h = min(i.shape[0] for i in imgs)
    w = min(i.shape[1] for i in imgs)
    imgs = [i[:h, :w] for i in imgs]
    cols = cols or len(imgs)
    rows = []
    for r in range(0, len(imgs), cols):
        row = imgs[r:r + cols]
        while len(row) < cols:
            row.append(np.zeros_like(imgs[0]))
        rows.append(np.concatenate(row, axis=1))
    imageio.imwrite(output, np.concatenate(rows, axis=0))
    print(f"wrote {output}")


def visualize_cameras(source_path, output):
    """Top-down scatter of camera centers + look directions + SfM points
    (utils/visualize_camera.py capability, matplotlib-free PNG render)."""
    import imageio.v2 as imageio

    from msgs.data.dataset import load_scene
    scene = load_scene(source_path, eval_split=False)
    centers, fwds = [], []
    for v in scene.train_views:
        W2C = np.eye(4)
        W2C[:3, :3] = v.R.T
        W2C[:3, 3] = v.T
        C2W = np.linalg.inv(W2C)
        centers.append(C2W[:3, 3])
        fwds.append(C2W[:3, 2])
    centers = np.stack(centers)
    fwds = np.stack(fwds)
    pts = scene.points

    size = 800
    canvas = np.full((size, size, 3), 255, np.uint8)
    allxy = np.concatenate([centers[:, [0, 2]], pts[:, [0, 2]]], axis=0)
    lo, hi = allxy.min(0), allxy.max(0)
    span = np.maximum(hi - lo, 1e-6)

    def to_px(xy):
        uv = (xy - lo) / span
        return (uv * (size - 40) + 20).astype(int)

    for p in to_px(pts[:, [0, 2]])[::max(len(pts) // 20000, 1)]:
        if 0 <= p[1] < size and 0 <= p[0] < size:
            canvas[size - 1 - p[1], p[0]] = (180, 180, 180)
    cps = to_px(centers[:, [0, 2]])
    for c in cps:
        y, x = size - 1 - c[1], c[0]
        canvas[max(y - 3, 0):y + 3, max(x - 3, 0):x + 3] = (200, 30, 30)
    for c, f in zip(centers, fwds):
        a = to_px(c[None, [0, 2]])[0]
        b = to_px((c + f * span.mean() * 0.05)[None, [0, 2]])[0]
        n = 20
        for t in range(n):
            p = (a + (b - a) * t / n).astype(int)
            if 0 <= p[1] < size and 0 <= p[0] < size:
                canvas[size - 1 - p[1], p[0]] = (30, 30, 220)
    imageio.imwrite(output, canvas)
    print(f"wrote {output}")


def main(argv=None):
    p = argparse.ArgumentParser("msgs video_tools")
    sub = p.add_subparsers(dest="cmd", required=True)
    c1 = sub.add_parser("cut_and_stack")
    c1.add_argument("-i", "--inputs", nargs="+", required=True)
    c1.add_argument("-o", "--output", required=True)
    c1.add_argument("--start", type=float, default=0.0)
    c1.add_argument("--end", type=float, default=None)
    c1.add_argument("--axis", choices=["h", "v"], default="h")
    c1.add_argument("--fps", type=int, default=30)
    c2 = sub.add_parser("concat")
    c2.add_argument("-i", "--inputs", nargs="+", required=True)
    c2.add_argument("-o", "--output", required=True)
    c2.add_argument("--cols", type=int, default=None)
    c3 = sub.add_parser("visualize_cameras")
    c3.add_argument("-s", "--source_path", required=True)
    c3.add_argument("-o", "--output", required=True)
    a = p.parse_args(argv)
    if a.cmd == "cut_and_stack":
        cut_and_stack(a.inputs, a.output, a.start, a.end, a.axis, a.fps)
    elif a.cmd == "concat":
        concat_images(a.inputs, a.output, a.cols)
    else:
        visualize_cameras(a.source_path, a.output)


if __name__ == "__main__":
    main()
