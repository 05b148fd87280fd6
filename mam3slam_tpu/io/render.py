"""Raycast renderer for a textured closed-loop environment + ASL writer.

The reference's accuracy story is dataset replay with committed artifacts
(EuRoC bags through ``Examples/ROS/MAM3SLAM/nodes/ros_mono_multi.cc:48-91``,
judged from ``output/MapLogs.txt`` / ``Trajectory_i.txt``).  This module
provides the self-contained equivalent: a deterministic textured room with
known ground truth, rendered to PNG sequences in the EuRoC ASL layout so
the standard driver (``examples/run_euroc.py``) consumes them end-to-end —
pixels -> ORB -> tracking -> mapping -> loop closure / multi-agent merge.

Scene: the interior of a closed box (4 walls + floor + ceiling), each face
carrying a distinct band-limited two-octave noise texture (corner-rich at
multiple pyramid scales, no aliasing under sub-pixel motion).  The camera
orbits inside looking radially outward: a full orbit revisits its start
(intra-map LOOP); two agents covering overlapping arcs produce an
inter-agent MERGE.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class RenderCam:
    width: int = 640
    height: int = 480
    fx: float = 320.0
    fy: float = 320.0
    cx: float = 320.0
    cy: float = 240.0
    fps: float = 20.0
    # camera model: "pinhole" or "kb8" (KannalaBrandt8 equidistant
    # fisheye — the reference's own fixture operating point is 960x960
    # KB8, /root/reference/test/settingsForTest_00.yaml:8-50)
    model: str = "pinhole"
    k: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)


def reference_kb8_cam(scale: float = 1.0) -> RenderCam:
    """The reference fixture's camera (settingsForTest_00.yaml: 960x960
    KB8 @20fps, fx=fy=470.2, k1..k4 below), optionally resolution-scaled
    for faster tests."""
    s = float(scale)
    return RenderCam(width=int(960 * s), height=int(960 * s),
                     fx=470.2 * s, fy=470.2 * s,
                     cx=479.9 * s, cy=479.9 * s, fps=20.0, model="kb8",
                     k=(0.0034823894022493434, 0.0007150348452162257,
                        -0.0020532361418706202, 0.00020293673591811182))


@dataclass(frozen=True)
class Photometric:
    """Per-frame photometric perturbations (deterministic in the frame
    index): multiplicative gain + additive bias drift, Gaussian blur, and
    radial vignetting — the degradations EuRoC-grade footage carries that
    the clean renderer lacked (VERDICT r2: easy-mode benchmarks)."""

    gain_amp: float = 0.15     # gain in [1-a, 1+a], smooth over frames
    bias_amp: float = 12.0     # additive offset in [-b, b]
    blur_sigma: float = 0.8    # Gaussian blur sigma (px); 0 = off
    vignette: float = 0.35     # corner darkening fraction; 0 = off
    noise_sigma: float = 2.0   # zero-mean Gaussian pixel noise; 0 = off
    seed: int = 7

    def apply(self, img: np.ndarray, frame_idx: int) -> np.ndarray:
        from scipy.ndimage import gaussian_filter

        h, w = img.shape
        out = img.astype(np.float32)
        if self.blur_sigma > 0:
            out = gaussian_filter(out, self.blur_sigma)
        if self.vignette > 0:
            ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
            r2 = (((xs - w / 2) / (w / 2)) ** 2
                  + ((ys - h / 2) / (h / 2)) ** 2)
            out = out * (1.0 - self.vignette * 0.5 * r2)
        # smooth exposure drift (deterministic, band-limited)
        ph = 2 * np.pi * (frame_idx * 0.013 + 0.1 * self.seed)
        gain = 1.0 + self.gain_amp * np.sin(ph)
        bias = self.bias_amp * np.sin(0.7 * ph + 1.3)
        out = out * gain + bias
        if self.noise_sigma > 0:
            rng = np.random.default_rng(self.seed * 100003 + frame_idx)
            out = out + rng.normal(0, self.noise_sigma, out.shape)
        return np.clip(out, 0, 255)


def _kb8_unproject_grid(cam: RenderCam) -> np.ndarray:
    """Per-pixel unit ray directions (camera frame) for a KB8 fisheye:
    invert theta_d = theta + k1 th^3 + k2 th^5 + k3 th^7 + k4 th^9 by
    Newton iteration (the reference KannalaBrandt8::unproject does the
    same solve per point, src/CameraModels/KannalaBrandt8.cpp)."""
    W, H = cam.width, cam.height
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    mx = (xs - cam.cx) / cam.fx
    my = (ys - cam.cy) / cam.fy
    theta_d = np.sqrt(mx * mx + my * my)
    k1, k2, k3, k4 = cam.k
    th = theta_d.copy()
    for _ in range(10):
        th2 = th * th
        f = th * (1 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4)))) \
            - theta_d
        fp = 1 + th2 * (3 * k1 + th2 * (5 * k2 + th2 * (7 * k3
                                                        + th2 * 9 * k4)))
        th = th - f / np.maximum(fp, 1e-9)
    scale = np.where(theta_d > 1e-9, np.tan(th) / np.maximum(theta_d, 1e-9),
                     1.0)
    rays = np.stack([mx * scale, my * scale, np.ones_like(mx)], axis=-1)
    return (rays / np.linalg.norm(rays, axis=-1, keepdims=True)
            ).astype(np.float32)


def _texture(rng: np.random.Generator, hw: Tuple[int, int]) -> np.ndarray:
    """Band-limited two-octave noise texture, values ~[30, 225]."""
    from scipy.ndimage import gaussian_filter

    fine = gaussian_filter(rng.uniform(-1, 1, hw), 1.5, mode="wrap")
    coarse = gaussian_filter(rng.uniform(-1, 1, hw), 6.0, mode="wrap")
    t = fine / (np.abs(fine).max() + 1e-9) + coarse / (
        np.abs(coarse).max() + 1e-9)
    t = (t - t.min()) / (t.max() - t.min())
    return (t * 195 + 30).astype(np.float32)


def _bilinear(tex: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    h, w = tex.shape
    u = np.clip(u, 0.0, w - 1.001)
    v = np.clip(v, 0.0, h - 1.001)
    u0 = u.astype(np.int32)
    v0 = v.astype(np.int32)
    du = u - u0
    dv = v - v0
    t00 = tex[v0, u0]
    t01 = tex[v0, u0 + 1]
    t10 = tex[v0 + 1, u0]
    t11 = tex[v0 + 1, u0 + 1]
    return (t00 * (1 - du) * (1 - dv) + t01 * du * (1 - dv)
            + t10 * (1 - du) * dv + t11 * du * dv)


class RoomScene:
    """Interior of a textured box, world frame: x right, y down, z forward.

    Faces: x=+S, x=-S, z=+S, z=-S (walls), y=+Hh (floor, y down),
    y=-Hh (ceiling).
    """

    def __init__(self, half_size: float = 5.0, half_height: float = 2.5,
                 seed: int = 0, px_per_m: float = 100.0):
        self.S = float(half_size)
        self.Hh = float(half_height)
        self.px_per_m = float(px_per_m)
        self.seed = int(seed)  # part of the render-cache key
        rng = np.random.default_rng(seed)
        wall_hw = (int(2 * self.Hh * px_per_m) + 2,
                   int(2 * self.S * px_per_m) + 2)
        cap_hw = (int(2 * self.S * px_per_m) + 2,
                  int(2 * self.S * px_per_m) + 2)
        # normal (into the room is -n), plane offset n.p = d, texture
        self.planes = [
            (np.array([1.0, 0, 0]), self.S, _texture(rng, wall_hw)),
            (np.array([-1.0, 0, 0]), self.S, _texture(rng, wall_hw)),
            (np.array([0, 0, 1.0]), self.S, _texture(rng, wall_hw)),
            (np.array([0, 0, -1.0]), self.S, _texture(rng, wall_hw)),
            (np.array([0, 1.0, 0]), self.Hh, _texture(rng, cap_hw)),
            (np.array([0, -1.0, 0]), self.Hh, _texture(rng, cap_hw)),
        ]

    def _texcoords(self, pi: int, pts: np.ndarray):
        s = self.px_per_m
        n, _, _ = self.planes[pi]
        if abs(n[0]) > 0.5:      # x walls: (z, y)
            return (pts[..., 2] + self.S) * s, (pts[..., 1] + self.Hh) * s
        if abs(n[2]) > 0.5:      # z walls: (x, y)
            return (pts[..., 0] + self.S) * s, (pts[..., 1] + self.Hh) * s
        return (pts[..., 0] + self.S) * s, (pts[..., 2] + self.S) * s

    _ray_cache = {}

    def render(self, R: np.ndarray, t: np.ndarray,
               cam: RenderCam) -> np.ndarray:
        """R, t: world->cam.  Returns grayscale float image [H, W]."""
        W, H = cam.width, cam.height
        if cam.model == "kb8":
            key = (cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy,
                   cam.k)
            rays_c = RoomScene._ray_cache.get(key)
            if rays_c is None:
                rays_c = _kb8_unproject_grid(cam)
                RoomScene._ray_cache[key] = rays_c
        else:
            ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
            rays_c = np.stack([(xs - cam.cx) / cam.fx,
                               (ys - cam.cy) / cam.fy,
                               np.ones_like(xs)], axis=-1)
        Rwc = R.T
        C = -Rwc @ t
        rays_w = rays_c @ Rwc.T  # [H, W, 3]

        lam_all = np.full((len(self.planes), H, W), np.inf, np.float32)
        for i, (n, d, _) in enumerate(self.planes):
            denom = rays_w @ n
            safe = np.where(np.abs(denom) > 1e-8, denom, 1.0)
            lam = np.where(np.abs(denom) > 1e-8, (d - C @ n) / safe, np.inf)
            lam_all[i] = np.where(lam > 0.05, lam, np.inf)
        best = np.argmin(lam_all, axis=0)
        lam = np.take_along_axis(lam_all, best[None], axis=0)[0]
        pts = C[None, None] + lam[..., None] * rays_w

        img = np.zeros((H, W), np.float32)
        for i, (_, _, tex) in enumerate(self.planes):
            sel = best == i
            if not sel.any():
                continue
            u, v = self._texcoords(i, pts[sel])
            img[sel] = _bilinear(tex, u, v)
        return np.clip(img, 0, 255)


def orbit_pose(theta: float, radius: float):
    """Camera on a circle of ``radius`` in the y=0 plane, optical axis
    radially outward, image y = world y (down).  Returns (R, t, C, q_wc)
    with R, t world->cam and q_wc the world-from-camera quaternion (wxyz)
    for ground-truth export."""
    c, s = np.cos(theta), np.sin(theta)
    C = np.array([radius * c, 0.0, radius * s])
    z_cam = np.array([c, 0.0, s])          # outward
    x_cam = np.array([-s, 0.0, c])          # tangent
    y_cam = np.cross(z_cam, x_cam)          # = (0, 1, 0): world down
    R = np.stack([x_cam, y_cam, z_cam])     # rows: world->cam
    t = -R @ C
    q = _rot_to_quat_wxyz(R.T)
    return R.astype(np.float32), t.astype(np.float32), C, q


def _rot_to_quat_wxyz(Rm: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(Rm).as_quat()  # xyzw
    return np.array([q[3], q[0], q[1], q[2]])


def orbit_trajectory(n_frames: int, start_deg: float, end_deg: float,
                     radius: float = 2.5, bob: float = 0.0
                     ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray,
                                     np.ndarray]]:
    """List of (R, t, C, q_wc) along an arc; ``bob`` adds a small vertical
    oscillation so the trajectory is not exactly planar (better-conditioned
    BA, and a non-trivial ATE test)."""
    out = []
    for i in range(n_frames):
        th = np.deg2rad(start_deg + (end_deg - start_deg) * i
                        / max(n_frames - 1, 1))
        R, t, C, q = orbit_pose(th, radius)
        if bob:
            dy = bob * np.sin(4 * th)
            C = C + np.array([0, dy, 0])
            t = -R @ C.astype(np.float32)
        out.append((R, t.astype(np.float32), C, q))
    return out


def write_asl_sequence(seq_dir: str, scene: RoomScene,
                       traj: Sequence, cam: RenderCam,
                       t0: float = 0.0) -> None:
    """Render ``traj`` and write a full EuRoC ASL sequence:
    mav0/cam0/{data.csv,sensor.yaml,data/*.png} +
    mav0/state_groundtruth_estimate0/data.csv."""
    import cv2

    cam_dir = os.path.join(seq_dir, "mav0", "cam0")
    img_dir = os.path.join(cam_dir, "data")
    gt_dir = os.path.join(seq_dir, "mav0", "state_groundtruth_estimate0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)

    if cam.model == "kb8":
        model, dist_model = "kb8", "equidistant"
        k = cam.k
    else:
        model, dist_model = "pinhole", "radial-tangential"
        k = (0.0, 0.0, 0.0, 0.0)
    with open(os.path.join(cam_dir, "sensor.yaml"), "w") as f:
        f.write(
            "%YAML:1.0\n"
            "sensor_type: camera\n"
            f"rate_hz: {cam.fps}\n"
            f"resolution: [{cam.width}, {cam.height}]\n"
            f"camera_model: {model}\n"
            f"intrinsics: [{cam.fx}, {cam.fy}, {cam.cx}, {cam.cy}]\n"
            f"distortion_model: {dist_model}\n"
            f"distortion_coefficients: [{k[0]}, {k[1]}, {k[2]}, {k[3]}]\n")

    rows_cam = ["#timestamp [ns],filename"]
    rows_gt = ["#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
               "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []"]
    dt = 1.0 / cam.fps
    for i, (R, t, C, q) in enumerate(traj):
        ts_ns = int(round((t0 + i * dt) * 1e9))
        name = f"{ts_ns}.png"
        img = scene.render(R, t, cam).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, name), img)
        rows_cam.append(f"{ts_ns},{name}")
        rows_gt.append(f"{ts_ns},{C[0]:.6f},{C[1]:.6f},{C[2]:.6f},"
                       f"{q[0]:.6f},{q[1]:.6f},{q[2]:.6f},{q[3]:.6f}")
    with open(os.path.join(cam_dir, "data.csv"), "w") as f:
        f.write("\n".join(rows_cam) + "\n")
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("\n".join(rows_gt) + "\n")


def render_sequence_cached(scene: RoomScene, traj, cam: RenderCam,
                           cache_dir: str = None) -> "np.ndarray":
    """Rendered frame stack [N, H, W] float16 with a DISK cache keyed by
    (scene seed/geometry, camera intrinsics, trajectory poses).

    The slow test tier re-renders identical orbit sequences in every
    test and every run; one 240-frame 720x720 sequence costs tens of
    seconds of host CPU.  The cache (default
    ``$MAM3_RENDER_CACHE`` or ``~/.cache/mam3slam_renders``) is shared
    across tests, processes, and rounds (VERDICT r4 #7).  Frames
    are stored float16: uint8 quantization measurably perturbs FAST/BoW
    margins (a KB8 loop test lost its LOOP detection).  Trajectory
    entries may be (R, t) or (R, t, C, q) tuples."""
    import hashlib
    import os

    Rs = np.stack([np.asarray(p[0], np.float32) for p in traj])
    ts = np.stack([np.asarray(p[1], np.float32) for p in traj])
    h = hashlib.sha1()
    h.update(np.asarray(
        [scene.seed, scene.S, scene.Hh, scene.px_per_m,
         cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy],
        np.float64).tobytes())
    h.update(str(getattr(cam, "k", None)).encode())
    h.update(str(getattr(cam, "model", "pinhole")).encode())
    h.update(Rs.tobytes())
    h.update(ts.tobytes())
    cache_dir = cache_dir or os.environ.get(
        "MAM3_RENDER_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "mam3slam_renders"))
    path = os.path.join(cache_dir, h.hexdigest()[:24] + ".npz")
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                return z["frames"]
        except Exception:
            pass  # corrupt/partial file: re-render
    frames = np.stack([
        scene.render(R, t, cam).astype(np.float16)
        for R, t in zip(Rs, ts)])
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp.npz"  # savez appends .npz
        np.savez_compressed(tmp, frames=frames)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort (read-only FS, quota, races)
    return frames
