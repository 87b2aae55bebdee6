"""SIBR network viewer server — same TCP wire protocol as the reference
(/root/reference/gaussian_renderer/network_gui.py): 4-byte little-endian
length + JSON camera message in; raw RGB bytes + length-prefixed verify
string out.  Runs on a background thread so it never blocks a training
step (the reference polls it inline each iteration, train.py:148-161).
"""
from __future__ import annotations

import json
import math
import socket
import threading
import traceback
from typing import Optional

import jax.numpy as jnp
import numpy as np

from splatco_tpu.data.cameras import Camera
from splatco_tpu.models.renderer import prefilter_voxel, render
from splatco_tpu.models.splatco import decode_kwargs


def camera_from_message(msg: dict) -> Optional[Camera]:
    width = msg["resolution_x"]
    height = msg["resolution_y"]
    if width == 0 or height == 0:
        return None
    view = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
    view[:, 1] = -view[:, 1]
    view[:, 2] = -view[:, 2]
    proj = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
    proj[:, 1] = -proj[:, 1]
    cam_center = np.linalg.inv(view)[3, :3]
    return Camera(
        world_view_transform=jnp.asarray(view),
        full_proj_transform=jnp.asarray(proj),
        camera_center=jnp.asarray(cam_center),
        image=None,
        R=jnp.eye(3), T=jnp.zeros(3),
        image_height=height, image_width=width,
        fovx=msg["fov_x"], fovy=msg["fov_y"], uid=np.int32(0),
        znear=msg["z_near"], zfar=msg["z_far"])


class ViewerServer:
    """Serves SIBR viewer clients and mirrors the reference's control
    semantics (train.py:150-161): the client's `train` field pauses/resumes
    training, `scaling_modifier` scales the rendered gaussians, and
    `keep_alive` keeps the server (and a paused trainer) alive past the
    final iteration.  The reference polls the socket inline between steps;
    here rendering runs on this thread and the trainer instead calls
    `wait_training_allowed()` at the top of each iteration — equivalent
    gating without stalling the step on socket I/O."""

    def __init__(self, trainer, host: str = "127.0.0.1", port: int = 6009):
        self.trainer = trainer
        self.host = host
        self.port = port
        self._stop = threading.Event()
        self._train_allowed = threading.Event()
        self._train_allowed.set()
        self._connected = False
        self.keep_alive = False
        self.scaling_modifier = 1.0
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._train_allowed.set()

    def wait_training_allowed(self, poll: float = 0.05):
        """Block while a connected viewer has training paused
        (reference: the `while network_gui.conn != None` loop only breaks
        when do_training is set)."""
        while self._connected and not self._train_allowed.is_set():
            if self._stop.is_set():
                return
            self._train_allowed.wait(poll)

    # ------------------------------------------------------------------
    def _serve(self):
        listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        listener.bind((self.host, self.port))
        listener.listen()
        listener.settimeout(0.5)
        print(f"viewer listening on {self.host}:{self.port}")
        while not self._stop.is_set():
            try:
                conn, addr = listener.accept()
            except socket.timeout:
                continue
            print(f"\nviewer connected from {addr}")
            self._connected = True
            try:
                self._handle(conn)
            except (ConnectionError, OSError):
                # expected teardown: the viewer closed its socket (or the
                # test harness did) — not an error, keep the log clean
                pass
            except Exception:
                traceback.print_exc()
            finally:
                self._connected = False
                self._train_allowed.set()
                conn.close()
        listener.close()

    def _read_message(self, conn) -> dict:
        raw = conn.recv(4)
        if not raw:
            raise ConnectionError("viewer disconnected")
        n = int.from_bytes(raw, "little")
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return json.loads(buf.decode("utf-8"))

    def _handle(self, conn):
        tr = self.trainer
        while not self._stop.is_set():
            msg = self._read_message(conn)
            # control fields (reference network_gui.receive :57-84)
            if bool(msg.get("train", True)):
                self._train_allowed.set()
            else:
                self._train_allowed.clear()
            self.keep_alive = bool(msg.get("keep_alive", False))
            self.scaling_modifier = float(msg.get("scaling_modifier", 1.0))
            cam = camera_from_message(msg)
            payload = None
            if cam is not None:
                bg = tr._bg()
                vis = prefilter_voxel(tr.params["anchors"],
                                      tr.mstate.active, cam)
                out = render(
                    tr.params, tr.mstate.active, tr.mstate.contractor, cam,
                    bg, visible_mask=vis,
                    activate_level=tr.activate_level, is_training=False,
                    kmax=tr.cfg.kmax, backend=tr.backend,
                    scale_modifier=self.scaling_modifier,
                    **decode_kwargs(tr.cfg))
                img = np.asarray(jnp.clip(out.image, 0.0, 1.0))
                payload = (img.transpose(1, 2, 0) * 255).astype(
                    np.uint8).tobytes()
            verify = tr.cfg.source_path
            if payload is not None:
                conn.sendall(payload)
            conn.sendall(len(verify).to_bytes(4, "little"))
            conn.sendall(verify.encode("ascii"))
