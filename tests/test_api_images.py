"""Image-level end-to-end: MultiAgentSystem facade on rendered frames.

The closest analog of the reference's ``test/testMultiAgentSystem.cc``
smoke test, but with assertions: synthetic textured 3D scene (two planes),
real ORB extraction, monocular init, and sustained tracking.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu import api
from mam3slam_tpu.slam.system import OK, SlamConfig

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

W, H = 640, 480
FX = FY = 320.0
CX, CY = 320.0, 240.0

YAML = f"""%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: {FX}
Camera1.fy: {FY}
Camera1.cx: {CX}
Camera1.cy: {CY}
Camera.width: {W}
Camera.height: {H}
Camera.fps: 20
Camera.RGB: 1
ORBextractor.nFeatures: 600
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


class PlanesScene:
    """Raycast renderer: far wall (z=8) + side wall, noise textures."""

    def __init__(self, seed=0):
        import cv2
        rng = np.random.default_rng(seed)
        # low-pass the noise so the texture is band-limited (no aliasing
        # under sub-pixel motion) but still corner-rich
        def tex():
            t = rng.uniform(0, 255, (600, 1200)).astype(np.float32)
            t = cv2.GaussianBlur(t, (0, 0), 3.0)
            t = (t - t.min()) / (t.max() - t.min()) * 195 + 30
            return t.astype(np.float32)
        self.tex_wall = tex()
        self.tex_side = tex()

    def render(self, R, t):
        """R, t: world->cam.  Wall plane z_w=8; side plane x_w=4."""
        ys, xs = np.mgrid[0:H, 0:W]
        rays_c = np.stack([(xs - CX) / FX, (ys - CY) / FY,
                           np.ones_like(xs, np.float32)], axis=-1)
        Rwc = R.T
        C = -Rwc @ t
        rays_w = rays_c @ Rwc.T  # [H, W, 3]

        img = np.zeros((H, W), np.float32)
        depth = np.full((H, W), np.inf, np.float32)

        # wall z=8
        dz = rays_w[..., 2]
        lam = np.where(np.abs(dz) > 1e-6, (8.0 - C[2]) / dz, np.inf)
        pts = C[None, None] + lam[..., None] * rays_w
        ok = (lam > 0.1) & (lam < depth)
        u = np.clip(((pts[..., 0] + 6) * 100).astype(int), 0, 1199)
        v = np.clip(((pts[..., 1] + 3) * 100).astype(int), 0, 599)
        img = np.where(ok, self.tex_wall[v, u], img)
        depth = np.where(ok, lam, depth)

        # side wall x=4
        dx = rays_w[..., 0]
        lam = np.where(np.abs(dx) > 1e-6, (4.0 - C[0]) / dx, np.inf)
        pts = C[None, None] + lam[..., None] * rays_w
        ok = (lam > 0.1) & (lam < depth) & (pts[..., 2] > 0) & (
            pts[..., 2] < 8.0)
        u = np.clip((pts[..., 2] * 150).astype(int), 0, 1199)
        v = np.clip(((pts[..., 1] + 3) * 100).astype(int), 0, 599)
        img = np.where(ok, self.tex_side[v, u], img)
        return np.clip(img, 0, 255)


def test_facade_tracks_rendered_images(tmp_path):
    scene = PlanesScene()
    yaml_path = tmp_path / "cam.yaml"
    yaml_path.write_text(YAML)

    mas = api.MultiAgentSystem(
        active_loop_closing=False,
        slam_config=SlamConfig(width=W, height=H, n_feat=640, max_kf=64,
                               max_mp=8192, n_levels=4,
                               min_init_matches=80, kf_max_interval=10))
    aid = mas.add_agent(str(yaml_path))

    states = []
    n_frames = 25
    for i in range(n_frames):
        yaw = np.deg2rad(0.3 * i)
        R = Rsc.from_euler("y", yaw).as_matrix().astype(np.float32)
        C = np.array([0.06 * i, 0.005 * i, 0.02 * i], np.float32)
        t = (-R @ C).astype(np.float32)
        img = scene.render(R, t)
        st, pose = mas.track_monocular(aid, img, float(i))
        states.append(st)

    assert OK in states, states
    first = states.index(OK)
    assert np.mean([s == OK for s in states[first:]]) > 0.9, states
    n_kf = int(np.asarray(mas.sys.ms.kf_valid).sum())
    n_mp = int(np.asarray(mas.sys.ms.mp_valid).sum())
    assert n_kf >= 2 and n_mp > 100, (n_kf, n_mp)

    out = str(tmp_path / "output")
    mas.shutdown(out_dir=out)
    import os
    assert os.path.exists(os.path.join(out, "Trajectory_0.txt"))
