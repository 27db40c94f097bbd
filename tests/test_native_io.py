"""Native C++ I/O parsers must agree with the pure-Python ones."""
import os
import struct

import numpy as np
import pytest

from msgs.data import colmap, native_io, ply


def _write_points3d_bin(path, n=500, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(0, 2, (n, 3))
    rgb = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    err = rng.random(n)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<Q3d3Bd", i + 1, *xyz[i], *rgb[i], err[i]))
            tl = int(rng.integers(0, 4))
            f.write(struct.pack("<Q", tl))
            for _ in range(tl):
                f.write(struct.pack("<ii", 1, 2))
    return xyz, rgb, err


def _write_images_bin(path, n=7, seed=1):
    rng = np.random.default_rng(seed)
    qs = rng.normal(size=(n, 4))
    ts = rng.normal(size=(n, 3))
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *qs[i]))
            f.write(struct.pack("<3d", *ts[i]))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.jpg".encode() + b"\x00")
            npts = int(rng.integers(0, 5))
            f.write(struct.pack("<Q", npts))
            for _ in range(npts):
                f.write(struct.pack("<ddq", 1.0, 2.0, -1))
    return qs, ts


@pytest.fixture(scope="module")
def lib_available():
    if native_io.get_lib() is None:
        pytest.skip("native toolchain unavailable")


def test_native_points3d(tmp_path, lib_available):
    path = str(tmp_path / "points3D.bin")
    xyz, rgb, err = _write_points3d_bin(path)
    out = native_io.read_points3d_bin(path)
    assert out is not None
    nxyz, nrgb, nerr = out
    np.testing.assert_allclose(nxyz, xyz, atol=1e-6)
    np.testing.assert_array_equal(nrgb, rgb)
    np.testing.assert_allclose(nerr, err, atol=1e-6)
    # agrees with the Python parser
    pxyz, prgb, perr = colmap.read_points3d_binary(path)
    np.testing.assert_allclose(nxyz, pxyz, atol=1e-6)


def test_native_images(tmp_path, lib_available):
    path = str(tmp_path / "images.bin")
    qs, ts = _write_images_bin(path)
    out = native_io.read_images_bin(path)
    assert out is not None
    np.testing.assert_allclose(out["qvec"], qs)
    np.testing.assert_allclose(out["tvec"], ts)
    assert out["names"][0] == "img_000.jpg"
    pimgs = colmap.read_images_binary(path)
    assert len(pimgs) == len(qs)
    np.testing.assert_allclose(pimgs[1].qvec, out["qvec"][0])


def test_native_ply(tmp_path, lib_available):
    path = str(tmp_path / "m.ply")
    rng = np.random.default_rng(2)
    fields = {"x": rng.normal(size=50).astype(np.float32),
              "opacity": rng.normal(size=50).astype(np.float32),
              "flag": rng.integers(0, 2, 50).astype(np.uint8)}
    ply.write_ply(path, fields)
    out = native_io.read_ply_f32(path)
    assert out is not None
    np.testing.assert_allclose(out["x"], fields["x"], atol=1e-6)
    np.testing.assert_allclose(out["flag"], fields["flag"].astype(np.float32))
