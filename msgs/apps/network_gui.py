"""SIBR remote-viewer socket service — reference
gaussian_renderer/network_gui.py:26-85 protocol, re-served from the JAX
renderer so the stock SIBR_remoteGaussian client can connect to a training
or viewing session.

Wire protocol (network_gui.py:34-70):
  in : 4-byte LE length + JSON {resolution_x/y, fov_y, fov_x, z_near, z_far,
       shs_python, rot_scale_python, keep_alive, scaling_modifier,
       view_matrix (16 floats), view_projection_matrix (16 floats)}
  out: H*W*3 raw RGB bytes, then 4-byte LE length + source_path string.
  MiniCam construction flips Y/Z columns of both matrices
  (network_gui.py:74-79).
"""
from __future__ import annotations

import json
import socket
import struct
import traceback
from typing import Optional, Tuple

import numpy as np

_listener: Optional[socket.socket] = None
conn: Optional[socket.socket] = None
addr = None


def init(wish_host: str = "127.0.0.1", wish_port: int = 6009):
    global _listener
    _listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    _listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    _listener.bind((wish_host, wish_port))
    _listener.listen()
    _listener.settimeout(0)


def try_connect():
    global conn, addr
    if _listener is None:
        return
    try:
        conn, addr = _listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def _read_bytes(n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = conn.recv(n - len(out))
        if not chunk:
            raise ConnectionError("client closed")
        out += chunk
    return out


def receive() -> Tuple[Optional[object], bool, bool, bool, float]:
    """Returns (camera | None, do_training, shs_python, rot_scale_python,
    keep_alive, scaling_modifier) — mirroring network_gui.receive():49-84."""
    from msgs.core.camera import make_camera_from_matrices

    msg_len = struct.unpack("I", _read_bytes(4))[0]
    msg = json.loads(_read_bytes(msg_len).decode("utf-8"))
    width = msg["resolution_x"]
    height = msg["resolution_y"]
    cam = None
    if width != 0 and height != 0:
        fovy = msg["fov_y"]
        fovx = msg["fov_x"]
        wvt = np.reshape(msg["view_matrix"], (4, 4))
        wvt[:, 1] = -wvt[:, 1]
        wvt[:, 2] = -wvt[:, 2]
        fpt = np.reshape(msg["view_projection_matrix"], (4, 4))
        fpt[:, 1] = -fpt[:, 1]
        cam = make_camera_from_matrices(wvt, fpt, fovx, fovy, width, height)
    return (cam, msg["train"], msg["shs_python"], msg["rot_scale_python"],
            msg["keep_alive"], msg["scaling_modifier"])


def send(image_bytes: Optional[bytes], source_path: str):
    if image_bytes is not None:
        conn.sendall(image_bytes)
    enc = source_path.encode("ascii")
    conn.sendall(struct.pack("I", len(enc)))
    conn.sendall(enc)


def disconnect():
    global conn
    if conn is not None:
        try:
            conn.close()
        except Exception:
            pass
    conn = None


def serve_step(render_fn, source_path: str, keep_alive_training: bool
               ) -> bool:
    """One head-of-iteration GUI pump (train.py:127-141 pattern):
    render_fn(camera, scaling_modifier) → (H, W, 3) float image in [0, 1].
    Returns True while the client wants to stay connected."""
    global conn
    if conn is None:
        try_connect()
    while conn is not None:
        try:
            cam, do_training, _, _, keep_alive, scale_mod = receive()
            img_bytes = None
            if cam is not None:
                img = render_fn(cam, scale_mod)
                arr = np.clip(np.asarray(img), 0, 1)
                img_bytes = memoryview(
                    (arr * 255).astype(np.uint8).tobytes())
            send(img_bytes, source_path)
            if do_training and (not keep_alive or keep_alive_training):
                return True
        except Exception:
            traceback.print_exc()
            disconnect()
            return False
    return False
