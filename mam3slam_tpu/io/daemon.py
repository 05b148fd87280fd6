"""Process-boundary frame ingestion + live viewing.

The reference ingests frames across a process boundary via ROS topics:
``ImageGrabber::GrabImage`` stuffs each arriving image into a per-agent
single slot under a mutex and the agent thread polls it
(/root/reference/Examples/ROS/MAM3SLAM/nodes/ros_mono_multi.cc:48-122,
src/Agent.cc:92-113), and renders live per-agent tracking windows
(src/AgentViewer.cc:21-45, src/MultiAgentViewer.cc:10-26).  This module is
the dependency-free equivalent a real robot (or another process) can feed:

* ``FrameIngestServer`` — TCP server, one connection per camera; a tiny
  length-free binary header ``(agent u32 | ts f64 | h u32 | w u32)`` +
  h*w grayscale bytes per frame.  Frames land in per-agent
  ``LatestFrameBuffer`` mailboxes, so the reference's overwrite/drop
  contract (freshest frame wins) applies across the process boundary.
* ``watch_directory`` — filesystem transport for the same contract:
  ``agent<k>_<ts>.png`` files appearing in a directory are pushed (and
  optionally consumed/deleted).
* ``MjpegServer`` — live view without a display server: an HTTP
  multipart/x-mixed-replace stream of the latest annotated tracking
  frame per agent (``/agent<k>``), viewable in any browser — the
  AgentViewer window's headless twin.

See ``examples/run_daemon.py`` for the wired-up driver.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time
from typing import Dict, Optional

import numpy as np

from mam3slam_tpu.io.stream import LatestFrameBuffer

_HDR = struct.Struct("<IdII")  # agent u32, ts f64, h u32, w u32


def send_frame(sock: socket.socket, agent: int, ts: float,
               image: np.ndarray) -> None:
    """Client side: push one grayscale uint8 frame."""
    img = np.ascontiguousarray(np.asarray(image, np.uint8))
    h, w = img.shape
    sock.sendall(_HDR.pack(agent, float(ts), h, w) + img.tobytes())


def _recv_exact(conn: socket.socket, n: int) -> Optional[bytes]:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


class FrameIngestServer:
    """TCP ingest: frames from any number of client processes land in
    per-agent ``LatestFrameBuffer`` mailboxes (newest frame wins)."""

    def __init__(self, buffers: Dict[int, LatestFrameBuffer],
                 host: str = "127.0.0.1", port: int = 0):
        self.buffers = buffers
        self._srv = socket.create_server((host, port))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._threads = []
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    def _accept_loop(self):
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            th = threading.Thread(target=self._client_loop, args=(conn,),
                                  daemon=True)
            th.start()
            self._threads.append(th)

    def _client_loop(self, conn: socket.socket):
        with conn:
            while not self._stop.is_set():
                hdr = _recv_exact(conn, _HDR.size)
                if hdr is None:
                    return
                agent, ts, h, w = _HDR.unpack(hdr)
                data = _recv_exact(conn, h * w)
                if data is None:
                    return
                buf = self.buffers.get(agent)
                if buf is not None:
                    img = np.frombuffer(data, np.uint8).reshape(h, w)
                    buf.push(ts, img)

    def close(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass
        for b in self.buffers.values():
            b.close()


def watch_directory(path: str, buffers: Dict[int, LatestFrameBuffer],
                    poll_s: float = 0.05, consume: bool = True,
                    stop: Optional[threading.Event] = None
                    ) -> threading.Thread:
    """Poll ``path`` for ``agent<k>_<ts>.png`` files and push them into
    the per-agent mailboxes (a robot writing to shared storage).  With
    ``consume`` the file is deleted after ingestion.  A file named
    ``STOP`` closes all buffers and ends the watcher."""
    import cv2

    stop = stop or threading.Event()

    def run():
        seen = set()
        while not stop.is_set():
            try:
                names = sorted(os.listdir(path))
            except OSError:
                names = []
            if "STOP" in names:
                break
            for name in names:
                if name in seen or not name.endswith(".png"):
                    continue
                stem = name[:-4]
                if not stem.startswith("agent") or "_" not in stem:
                    continue
                try:
                    agent = int(stem[5:stem.index("_")])
                    ts = float(stem[stem.index("_") + 1:])
                except ValueError:
                    continue
                full = os.path.join(path, name)
                img = cv2.imread(full, cv2.IMREAD_GRAYSCALE)
                if img is None:
                    continue  # partially written; retry next poll
                buf = buffers.get(agent)
                if buf is not None:
                    buf.push(ts, img)
                if consume:
                    try:
                        os.remove(full)
                    except OSError:
                        pass
                else:
                    seen.add(name)
            time.sleep(poll_s)
        for b in buffers.values():
            b.close()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    return th


class MjpegServer:
    """Live view over plain HTTP (no display server needed):
    ``GET /agent<k>`` streams multipart JPEG of the latest annotated
    tracking frame; ``GET /map`` streams the live 3D map view
    (reference MapDrawer window, src/MapDrawer.cc:1-419 — publish
    ``viewer.draw_map_image`` under the key ``"map"`` at ~1 Hz);
    ``GET /`` lists all streams.  Update frames with ``publish``."""

    BOUNDARY = b"--mam3frame"

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 fps: float = 20.0):
        self._frames: Dict[int, bytes] = {}
        self._cv = threading.Condition()
        self._stop = threading.Event()
        self._period = 1.0 / fps
        self._srv = socket.create_server((host, port))
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def publish(self, agent, bgr_image: np.ndarray) -> None:
        """``agent``: an agent id (int) or the string key ``"map"``."""
        import cv2

        ok, jpg = cv2.imencode(".jpg", bgr_image,
                               [cv2.IMWRITE_JPEG_QUALITY, 80])
        if not ok:
            return
        with self._cv:
            self._frames[agent] = jpg.tobytes()
            self._cv.notify_all()

    def _accept_loop(self):
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def _serve(self, conn: socket.socket):
        with conn:
            try:
                req = conn.recv(4096).decode("latin1", "replace")
            except OSError:
                return
            path = req.split(" ")[1] if " " in req else "/"
            if path.startswith("/agent"):
                try:
                    agent = int(path[6:])
                except ValueError:
                    agent = 0
                self._stream(conn, agent)
            elif path.startswith("/map"):
                self._stream(conn, "map")
            else:
                with self._cv:
                    agents = sorted(self._frames, key=str)
                body = ("<html><body>" + "".join(
                    f'<h3>{a}</h3><img src="/map"/>' if a == "map" else
                    f'<h3>agent {a}</h3><img src="/agent{a}"/>'
                    for a in agents) + "</body></html>").encode()
                conn.sendall(b"HTTP/1.0 200 OK\r\nContent-Type: "
                             b"text/html\r\nContent-Length: "
                             + str(len(body)).encode() + b"\r\n\r\n"
                             + body)

    def _stream(self, conn: socket.socket, agent):
        conn.sendall(
            b"HTTP/1.0 200 OK\r\nContent-Type: multipart/x-mixed-replace;"
            b"boundary=" + self.BOUNDARY[2:] + b"\r\n\r\n")
        last = None
        while not self._stop.is_set():
            with self._cv:
                self._cv.wait(timeout=self._period)
                jpg = self._frames.get(agent)
            if jpg is None or jpg is last:
                continue
            last = jpg
            try:
                conn.sendall(
                    self.BOUNDARY + b"\r\nContent-Type: image/jpeg\r\n"
                    b"Content-Length: " + str(len(jpg)).encode()
                    + b"\r\n\r\n" + jpg + b"\r\n")
            except OSError:
                return

    def close(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass
