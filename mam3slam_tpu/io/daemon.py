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
    ``GET /map3d`` serves a self-contained interactive 3D viewer page
    (rotate/zoom/pan with the mouse — the Pangolin window's browser
    twin) that polls ``GET /mapdata`` (JSON snapshot published with
    ``publish_json``, see ``viewer.map_snapshot``);
    ``GET /`` lists all streams.  Update frames with ``publish``."""

    BOUNDARY = b"--mam3frame"

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 fps: float = 20.0):
        self._frames: Dict[int, bytes] = {}
        self._json: Dict[str, bytes] = {}
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

    def publish_json(self, key: str, obj) -> None:
        """Publish a JSON document (e.g. ``viewer.map_snapshot``) under
        ``/<key>data`` — the interactive ``/map3d`` page polls
        ``/mapdata`` at ~1 Hz."""
        import json

        blob = json.dumps(obj, separators=(",", ":")).encode()
        with self._cv:
            self._json[key] = blob

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
            elif path.startswith("/map3d"):
                self._send(conn, _MAP3D_HTML, b"text/html")
            elif path.startswith("/mapdata"):
                with self._cv:
                    blob = self._json.get("map", b"{}")
                self._send(conn, blob, b"application/json")
            elif path.startswith("/map"):
                self._stream(conn, "map")
            else:
                with self._cv:
                    agents = sorted(self._frames, key=str)
                    has_3d = "map" in self._json
                body = ("<html><body>" + "".join(
                    f'<h3>{a}</h3><img src="/map"/>' if a == "map" else
                    f'<h3>agent {a}</h3><img src="/agent{a}"/>'
                    for a in agents)
                    + ('<p><a href="/map3d">interactive 3D map</a></p>'
                       if has_3d else "")
                    + "</body></html>").encode()
                self._send(conn, body, b"text/html")

    @staticmethod
    def _send(conn: socket.socket, body: bytes, ctype: bytes):
        conn.sendall(b"HTTP/1.0 200 OK\r\nContent-Type: " + ctype
                     + b"\r\nContent-Length: " + str(len(body)).encode()
                     + b"\r\n\r\n" + body)

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


# Self-contained interactive 3D viewer (no external assets — the host is
# typically airgapped): canvas renderer with mouse orbit/zoom/pan over the
# ``/mapdata`` JSON snapshot (``viewer.map_snapshot``).  Functional twin
# of the reference's interactive Pangolin map window
# (src/MapDrawer.cc:1-419, src/Viewer.cc, src/MultiAgentViewer.cc:10-26).
_MAP3D_HTML = b"""<!doctype html><html><head><meta charset=utf-8>
<title>MAM3SLAM map</title><style>
html,body{margin:0;height:100%;background:#101014;overflow:hidden}
#c{width:100%;height:100%;display:block;cursor:grab}
#hud{position:fixed;top:8px;left:10px;color:#9aa;font:12px monospace;
pointer-events:none;white-space:pre}
</style></head><body><canvas id=c></canvas><div id=hud>loading...</div>
<script>
'use strict';
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
const hud=document.getElementById('hud');
let data=null,yaw=-0.7,pitch=0.35,dist=0,panx=0,pany=0,ctr=[0,0,0];
const AG=['#ff9f40','#4dc9f6','#f67019','#f53794','#acc236','#00a950'];
const SEGCOL=i=>i===0?'rgba(80,200,120,0.35)':i===1?'#5b8dd9'
  :AG[(i-2)%AG.length];
const PCOL=['#c8c8d8','#e8b4b8','#b4e8c8','#e8e0a0','#c0b4e8','#a0d8e8'];
async function poll(){
 try{const r=await fetch('/mapdata');
  if(r.ok){const d=await r.json();
   if(d.points){data=d;
    if(dist===0){dist=3.2*(d.span||1);
     let n=d.points.length;
     if(n){let s=[0,0,0];
      for(const p of d.points){s[0]+=p[0];s[1]+=p[1];s[2]+=p[2];}
      ctr=[s[0]/n,s[1]/n,s[2]/n];}}}}
 }catch(e){}
 setTimeout(poll,1000);}
function proj(x,y,z,f,w,h){
 const cy=Math.cos(yaw),sy=Math.sin(yaw),
       cp=Math.cos(pitch),sp=Math.sin(pitch);
 x-=ctr[0];y-=ctr[1];z-=ctr[2];
 const x1=cy*x+sy*z,z1=-sy*x+cy*z,y1=cp*y-sp*z1,z2=sp*y+cp*z1+dist;
 if(z2<1e-3)return null;
 return [w/2+panx+f*x1/z2,h/2+pany+f*y1/z2,z2];}
function draw(){
 const w=cv.width=innerWidth,h=cv.height=innerHeight,
       f=0.9*Math.min(w,h);
 ctx.fillStyle='#101014';ctx.fillRect(0,0,w,h);
 if(!data){requestAnimationFrame(draw);return;}
 ctx.lineWidth=1;
 for(let i=0;i<data.segs.length;i++){
  const s=data.segs[i],a=proj(s[0],s[1],s[2],f,w,h),
        b=proj(s[3],s[4],s[5],f,w,h);
  if(!a||!b)continue;
  ctx.strokeStyle=SEGCOL(data.scls[i]);
  ctx.beginPath();ctx.moveTo(a[0],a[1]);ctx.lineTo(b[0],b[1]);
  ctx.stroke();}
 for(let i=0;i<data.points.length;i++){
  const p=data.points[i],q=proj(p[0],p[1],p[2],f,w,h);
  if(!q)continue;
  const r=Math.max(0.6,Math.min(2.5,1.8*dist/(3*q[2])));
  ctx.fillStyle=PCOL[((data.pmap[i]%6)+6)%6];
  ctx.fillRect(q[0]-r/2,q[1]-r/2,r,r);}
 const st=data.stats||{};
 hud.textContent='KFs '+(st.kfs||0)+'  MPs '+(st.mps||0)
   +'  agents '+(st.agents||0)
   +'\\ndrag rotate | wheel zoom | shift-drag pan';
 requestAnimationFrame(draw);}
let drag=null;
cv.onmousedown=e=>{drag=[e.clientX,e.clientY,e.shiftKey||e.button===2];
 cv.style.cursor='grabbing';};
onmouseup=()=>{drag=null;cv.style.cursor='grab';};
onmousemove=e=>{if(!drag)return;
 const dx=e.clientX-drag[0],dy=e.clientY-drag[1];
 if(drag[2]){panx+=dx;pany+=dy;}
 else{yaw+=dx*0.008;
  pitch=Math.max(-1.55,Math.min(1.55,pitch+dy*0.008));}
 drag=[e.clientX,e.clientY,drag[2]];};
cv.onwheel=e=>{e.preventDefault();
 dist*=Math.exp(e.deltaY*0.0012);};
cv.oncontextmenu=e=>e.preventDefault();
poll();draw();
</script></body></html>"""
