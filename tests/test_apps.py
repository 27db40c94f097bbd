"""End-to-end CLI tests: train on a tiny synthetic Blender-format scene,
then render + metrics over the result — the apps-level smoke path."""
import json
import math
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_scene(tmp_path_factory):
    """A tiny NeRF-synthetic-style dataset: GT images rendered from a known
    Gaussian model via the oracle backend."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from msgs.core.camera import make_camera
    from msgs.kernels.rasterize import RasterSettings
    from msgs.model.gaussians import GaussianConfig, create_from_points
    from msgs.train import loop as L

    root = tmp_path_factory.mktemp("scene")
    (root / "train").mkdir()

    rng = np.random.default_rng(0)
    n = 80
    pts = np.concatenate([
        rng.uniform(-0.8, 0.8, (n, 2)), rng.uniform(-0.3, 0.3, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32)
    cfg = GaussianConfig(sh_degree=0, reso_lvls=1, capacity=128)
    st = create_from_points(cfg, pts, cols)
    state = L.init_train_state(st)
    settings = RasterSettings(backend="reference", entry_cap=1 << 12)

    fov = 0.9
    frames = []
    W = H = 64
    for i in range(6):
        ang = 2 * math.pi * i / 6
        # camera on a circle of radius 4 looking at origin
        pos = np.array([4 * math.sin(ang), 0.0, -4 * math.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R = np.stack([right, true_up, fwd], axis=1)
        T = -R.T @ pos
        cam = make_camera(R, T, fov, fov, W, H)
        out = L.eval_render(state, cam, cfg=cfg, settings=settings)
        img = np.clip(np.asarray(out.image), 0, 1)
        name = f"./train/r_{i}"
        imageio.imwrite(str(root / f"train/r_{i}.png"),
                        (img * 255).astype(np.uint8))
        c2w = np.linalg.inv(
            np.block([[R.T, (T)[:, None]], [np.zeros((1, 3)), np.ones((1, 1))]]))
        # store OpenGL-convention c2w (loader flips cols 1:3 back)
        c2w_gl = c2w.copy()
        c2w_gl[:3, 1:3] *= -1
        frames.append({"file_path": name,
                       "transform_matrix": c2w_gl.tolist()})
    meta = {"camera_angle_x": fov, "frames": frames}
    with open(root / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    return str(root)


def test_blender_loader_roundtrip(synthetic_scene):
    from msgs.data.dataset import load_scene
    scene = load_scene(synthetic_scene, eval_split=False)
    assert len(scene.train_views) == 6
    img = scene.train_views[0].image(1.0)
    assert img.shape == (64, 64, 3)
    cam = scene.train_views[0].camera(1.0)
    assert cam.width == 64


def test_train_cli_end_to_end(synthetic_scene, tmp_path):
    from msgs.apps import train as train_app
    out = str(tmp_path / "model")
    train_app.main([
        "-s", synthetic_scene, "-m", out,
        "--iterations", "40", "--capacity", "256",
        "--entry_cap", "4096", "--backend", "reference",
        "--test_iterations", "40", "--test_interval", "0",
        "--save_iterations", "40", "--sh_degree", "1", "--quiet"])
    assert os.path.exists(os.path.join(
        out, "point_cloud/iteration_40/point_cloud.ply"))
    log = [json.loads(l) for l in
           open(os.path.join(out, "train_log.jsonl"))]
    evals = [r for r in log if "eval" in r]
    assert evals, "no eval record written"
    psnr = evals[-1]["eval"]["train_s1"]["psnr"]
    assert np.isfinite(psnr) and psnr > 10.0, psnr


def test_render_and_metrics_cli(synthetic_scene, tmp_path):
    from msgs.apps import metrics as metrics_app
    from msgs.apps import render as render_app
    from msgs.apps import train as train_app
    out = str(tmp_path / "model2")
    train_app.main([
        "-s", synthetic_scene, "-m", out,
        "--iterations", "10", "--capacity", "256", "--entry_cap", "4096",
        "--backend", "reference", "--test_interval", "0",
        "--test_iterations", "-1",
        "--save_iterations", "10", "--sh_degree", "0", "--quiet"])
    render_app.main(["-m", out, "--skip_test", "--backend", "reference",
                     "--entry_cap", "4096"])
    metrics_app.main(["-m", out, "--splits", "train"])
    results = json.load(open(os.path.join(out, "results.json")))
    assert "ours_10" in results
    assert np.isfinite(results["ours_10"]["PSNR"])


def test_eval_scales_checkpoint_mode(synthetic_scene, tmp_path):
    """eval_scales --checkpoint evaluates a chkpntN.npz train state (the
    round-5 path that localized the ms28k regression) and writes the same
    report schema as the PLY path."""
    from msgs.apps import eval_scales as es_app
    from msgs.apps import train as train_app
    out = str(tmp_path / "model_ck")
    train_app.main([
        "-s", synthetic_scene, "-m", out,
        "--iterations", "10", "--capacity", "256", "--entry_cap", "4096",
        "--backend", "reference", "--test_interval", "0",
        "--test_iterations", "-1", "--save_iterations", "-1",
        "--checkpoint_iterations", "10", "--sh_degree", "0", "--quiet"])
    ck = os.path.join(out, "chkpnt10.npz")
    assert os.path.exists(ck)
    es_app.main(["-m", out, "--checkpoint", ck, "--scales", "1", "2",
                 "--backend", "reference", "--entry_cap", "4096",
                 "--skip_test", "--n_train_views", "1"])
    rep = json.load(open(os.path.join(out, "eval_scales_10.json")))
    assert "train_s1" in rep and np.isfinite(rep["train_s1"]["psnr"])


def test_get_combined_args_explicit_default_wins(tmp_path):
    """An explicitly-passed flag must beat the saved config even when its
    value equals the parser default (the reference's value-comparison merge
    cannot tell these apart — arguments/__init__.py:91-111)."""
    import argparse

    from msgs.apps.config import get_combined_args, save_cfg

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, default="")
    parser.add_argument("--resolution", type=int, default=-1)
    parser.add_argument("--sh_degree", type=int, default=3)

    model = tmp_path / "model"
    model.mkdir()
    saved = argparse.Namespace(model_path=str(model), resolution=4,
                               sh_degree=2)
    save_cfg(str(model), saved)

    # No explicit flags: saved config wins over defaults.
    a = get_combined_args(parser, ["--model_path", str(model)])
    assert a.resolution == 4 and a.sh_degree == 2

    # Explicit flag AT the default value: CLI must win over saved.
    a = get_combined_args(
        parser, ["--model_path", str(model), "--resolution", "-1"])
    assert a.resolution == -1
    assert a.sh_degree == 2  # untouched option still falls back to saved

    # Explicit non-default beats saved too.
    a = get_combined_args(
        parser, ["--model_path", str(model), "--sh_degree", "1"])
    assert a.sh_degree == 1 and a.resolution == 4


def test_collect_result_images_cli(synthetic_scene, tmp_path):
    """Per-image comparison-figure tool (reference
    utils/collect_result_images.py analogue): trains two tiny 'methods',
    then asserts labeled grids + the per-image PSNR CSV land on disk."""
    import csv

    from msgs.apps import collect_result_images as cri_app
    from msgs.apps import train as train_app

    root = str(tmp_path / "scene1")
    for method in ("base", "ms"):
        train_app.main([
            "-s", synthetic_scene, "-m", os.path.join(root, method),
            "--iterations", "10", "--capacity", "256", "--entry_cap", "4096",
            "--backend", "reference", "--test_interval", "0",
            "--test_iterations", "-1", "--save_iterations", "10",
            "--sh_degree", "0", "--quiet"])

    cri_app.main(["-m", root, "--scales", "1", "4", "--views", "0",
                  "--backend", "reference", "--entry_cap", "4096"])

    fig = os.path.join(root, "figures", "view000.png")
    assert os.path.exists(fig)
    import imageio.v2 as imageio
    img = imageio.imread(fig)
    assert img.ndim == 3 and img.shape[0] > 8 and img.shape[1] > 8

    with open(os.path.join(root, "figures", "per_image_psnr.csv")) as f:
        rows = list(csv.reader(f))
    # header + 2 scales x 2 methods
    assert rows[0] == ["view", "scale", "method", "psnr"]
    assert len(rows) == 1 + 4
    assert all(np.isfinite(float(r[3])) for r in rows[1:])


def test_train_cli_mesh_sharded(synthetic_scene, tmp_path):
    """--mesh G T end-to-end on the 8-virtual-device CPU mesh: the sharded
    hot path plus the gather → structural-op → reshard cold path (densify +
    opacity reset fire inside the window), then a PLY save from the
    gathered state (VERDICT r2 item 3: multi-chip training must be
    reachable from the CLI, not only from the library)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-virtual-device CPU mesh (conftest)")
    from msgs.apps import train as train_app
    out = str(tmp_path / "model_mesh")
    train_app.main([
        "-s", synthetic_scene, "-m", out, "--mesh", "2", "4",
        "--iterations", "30", "--capacity", "256",
        "--entry_cap", "4096", "--backend", "reference",
        "--densify_from_iter", "5", "--densify_until_iter", "25",
        "--opacity_reset_interval", "20",
        "--test_iterations", "30", "--test_interval", "0",
        "--save_iterations", "30", "--sh_degree", "0", "--quiet"])
    assert os.path.exists(os.path.join(
        out, "point_cloud/iteration_30/point_cloud.ply"))
    log = [json.loads(l) for l in
           open(os.path.join(out, "train_log.jsonl"))]
    evals = [r for r in log if "eval" in r]
    assert evals and np.isfinite(evals[-1]["eval"]["train_s1"]["psnr"])


def test_pyramid_disk_cache_persists_and_separates_splits(tmp_path):
    """The on-disk pyramid cache must (a) actually write cache files
    (np.save appends '.npy' to bare filenames — regression: the tmp-file
    rename never found its source and the cache silently no-op'd), and
    (b) key on the split-relative path: Blender scenes name frames
    train/r_0.png AND test/r_0.png — a basename key served train pixels
    as test ground truth."""
    import imageio.v2 as imageio
    import json as _json

    root = tmp_path / "scene"
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()
    c2w = np.eye(4)
    c2w[2, 3] = -4.0
    frames = lambda split: {"camera_angle_x": 0.8, "frames": [
        {"file_path": f"./{split}/r_0", "transform_matrix": c2w.tolist()}]}
    imageio.imwrite(str(root / "train/r_0.png"),
                    np.full((32, 32, 3), 10, np.uint8))
    imageio.imwrite(str(root / "test/r_0.png"),
                    np.full((32, 32, 3), 200, np.uint8))
    for split in ("train", "test"):
        with open(root / f"transforms_{split}.json", "w") as f:
            _json.dump(frames(split), f)

    from msgs.data.dataset import load_scene
    scene = load_scene(str(root), eval_split=True)
    tr = scene.train_views[0].image(1.0)
    te = scene.test_views[0].image(1.0)
    assert abs(float(tr.mean()) - 10 / 255) < 1e-3
    assert abs(float(te.mean()) - 200 / 255) < 1e-3

    cache = root / "msgs_cache"
    files = sorted(os.listdir(cache)) if cache.exists() else []
    assert len([f for f in files if f.endswith(".npy")]) >= 2, \
        f"cache files missing: {files}"
    assert not [f for f in files if ".tmp" in f], f"orphan tmps: {files}"

    # Second load must serve from cache and keep the splits distinct.
    scene2 = load_scene(str(root), eval_split=True)
    assert abs(float(scene2.test_views[0].image(1.0).mean()) - 200 / 255) \
        < 1e-3
