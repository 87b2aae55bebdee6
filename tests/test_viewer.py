"""Network GUI server: wire protocol + control semantics.

Speaks the reference SIBR protocol (4-byte LE length + JSON in; raw RGB
bytes + length-prefixed verify string out —
/root/reference/gaussian_renderer/network_gui.py:43-55) against a live
ViewerServer over a real socket, and checks the `train` pause gate and
`scaling_modifier` plumbing (reference train.py:150-161).
"""
import json
import socket
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatco_tpu.config import ModelConfig
from splatco_tpu.data.cameras import look_at_camera
from splatco_tpu.models.splatco import init_model
from splatco_tpu.viewer.network_gui import ViewerServer


class _StubTrainer:
    """The minimal Trainer surface the viewer touches."""

    def __init__(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(300, 3)).astype(np.float32) * 0.5
        self.cfg = ModelConfig(feat_dim=16, n_offsets=4, voxel_size=0.05,
                               plane_size=64, num_channels=9,
                               appearance_dim=0, contractor=True,
                               scene_center=[0.0, 0.0, 0.0],
                               scene_length=[2.0, 2.0, 2.0],
                               source_path="/tmp/stub_scene")
        self.params, self.mstate = init_model(jax.random.key(0), self.cfg,
                                              pts)
        self.activate_level = 0
        self.backend = "dense"
        self.kmax_pack = None

    def _bg(self):
        return jnp.zeros(3, jnp.float32)


def _msg(width=32, height=24, train=True, keep_alive=False,
         scaling_modifier=1.0):
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.0, 0.75, width, height)
    view = np.asarray(cam.world_view_transform).copy()
    proj = np.asarray(cam.full_proj_transform).copy()
    # undo the server's sign flips so it reconstructs this camera
    view[:, 1] *= -1
    view[:, 2] *= -1
    proj[:, 1] *= -1
    return {
        "resolution_x": width, "resolution_y": height,
        "train": train, "fov_y": float(cam.fovy), "fov_x": float(cam.fovx),
        "z_near": 0.01, "z_far": 100.0, "shs_python": False,
        "rot_scale_python": False, "keep_alive": keep_alive,
        "scaling_modifier": scaling_modifier,
        "view_matrix": view.reshape(-1).tolist(),
        "view_projection_matrix": proj.reshape(-1).tolist(),
    }


def _send(sock, msg):
    raw = json.dumps(msg).encode("utf-8")
    sock.sendall(len(raw).to_bytes(4, "little"))
    sock.sendall(raw)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed early"
        buf += chunk
    return buf


def _roundtrip(sock, msg):
    _send(sock, msg)
    img = None
    if msg["resolution_x"] and msg["resolution_y"]:
        img = _recv_exact(sock, msg["resolution_x"] * msg["resolution_y"]
                          * 3)
    vn = int.from_bytes(_recv_exact(sock, 4), "little")
    verify = _recv_exact(sock, vn).decode("ascii")
    return img, verify


@pytest.fixture(scope="module")
def server():
    tr = _StubTrainer()
    srv = ViewerServer(tr, host="127.0.0.1", port=0)
    # port=0: rebind to an ephemeral port; expose it for the client
    ready = threading.Event()
    orig = srv._serve

    def serve_with_port():
        import socket as s

        lst = s.socket(s.AF_INET, s.SOCK_STREAM)
        lst.setsockopt(s.SOL_SOCKET, s.SO_REUSEADDR, 1)
        lst.bind((srv.host, 0))
        srv.port = lst.getsockname()[1]
        lst.close()
        ready.set()
        orig()

    srv._thread = threading.Thread(target=serve_with_port, daemon=True)
    srv._thread.start()
    ready.wait(5)
    time.sleep(0.3)  # let the real listener bind
    yield srv
    srv.stop()


def test_protocol_roundtrip(server):
    with socket.create_connection(("127.0.0.1", server.port), 5) as sock:
        sock.settimeout(180)  # first render pays jit compile
        img, verify = _roundtrip(sock, _msg())
        assert verify == "/tmp/stub_scene"
        arr = np.frombuffer(img, np.uint8).reshape(24, 32, 3)
        assert arr.size == 24 * 32 * 3
        # zero-resolution message: no image, just the verify string
        m = _msg()
        m["resolution_x"] = 0
        img2, verify2 = _roundtrip(sock, m)
        assert img2 is None and verify2 == "/tmp/stub_scene"


def test_train_gate_and_scaling_modifier(server):
    with socket.create_connection(("127.0.0.1", server.port), 5) as sock:
        sock.settimeout(180)
        _roundtrip(sock, _msg(train=False, scaling_modifier=0.5))
        assert server.scaling_modifier == 0.5
        # gate must block while train=False...
        unblocked = threading.Event()
        t = threading.Thread(
            target=lambda: (server.wait_training_allowed(),
                            unblocked.set()),
            daemon=True)
        t.start()
        time.sleep(0.3)
        assert not unblocked.is_set(), "gate should hold while paused"
        # ...and release when the client re-enables training
        _roundtrip(sock, _msg(train=True, keep_alive=True))
        t.join(5)
        assert unblocked.is_set()
        assert server.keep_alive is True
