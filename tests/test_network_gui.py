"""Byte-level fake-client test of the SIBR socket protocol (reference
gaussian_renderer/network_gui.py:26-85): length-prefixed JSON request in,
raw RGB + length-prefixed source_path out, Y/Z camera-matrix sign flips."""
import json
import socket
import struct
import threading

import numpy as np

from msgs.apps import network_gui


def _client_request(width, height):
    view = np.eye(4, dtype=np.float32)
    proj = np.eye(4, dtype=np.float32)
    return {
        "resolution_x": width, "resolution_y": height,
        "train": True, "fov_y": 0.8, "fov_x": 0.9,
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": False, "scaling_modifier": 1.0,
        "view_matrix": view.reshape(-1).tolist(),
        "view_projection_matrix": proj.reshape(-1).tolist(),
    }


def test_serve_step_round_trip():
    W, H = 24, 16
    network_gui.init("127.0.0.1", 0)
    port = network_gui._listener.getsockname()[1]

    captured = {}

    def render_fn(cam, scale_mod):
        captured["cam"] = cam
        captured["scale_mod"] = scale_mod
        img = np.zeros((H, W, 3), np.float32)
        img[..., 0] = 1.0          # pure red frame
        img[0, 0] = [0.0, 1.0, 0.0]
        return img

    result = {}

    def client():
        cl = socket.create_connection(("127.0.0.1", port), timeout=10)
        payload = json.dumps(_client_request(W, H)).encode("utf-8")
        cl.sendall(struct.pack("I", len(payload)) + payload)
        img = b""
        while len(img) < W * H * 3:
            img += cl.recv(W * H * 3 - len(img))
        n = struct.unpack("I", cl.recv(4))[0]
        path = cl.recv(n).decode("ascii")
        result["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
        result["path"] = path
        cl.close()

    t = threading.Thread(target=client)
    t.start()
    # serve_step is pumped once per training iteration; the listener is
    # non-blocking, so poll until the client's connect lands.
    import time
    deadline = time.time() + 10
    cont = False
    while not cont and time.time() < deadline:
        cont = network_gui.serve_step(render_fn, "/scene/path",
                                      keep_alive_training=True)
        if not cont:
            time.sleep(0.02)
    t.join(timeout=10)
    network_gui.disconnect()
    network_gui._listener.close()

    assert cont, "server never honoured the training request"
    assert result["path"] == "/scene/path"
    np.testing.assert_array_equal(result["img"][1, 1], [255, 0, 0])
    np.testing.assert_array_equal(result["img"][0, 0], [0, 255, 0])
    assert result["img"].shape == (H, W, 3)
    assert captured["scale_mod"] == 1.0

    # Y/Z sign flips (network_gui.py:74-79): identity matrices from the
    # client arrive with columns 1/2 negated in the world-view transform.
    wv = np.asarray(captured["cam"].world_view)
    np.testing.assert_allclose(np.diag(wv), [1.0, -1.0, -1.0, 1.0])
