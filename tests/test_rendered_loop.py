"""Pixel-driven loop closure + accuracy: the full pipeline (ORB on
rendered images -> tracking -> mapping -> BoW place recognition -> Sim3
verification -> loop correction) on a textured closed-loop orbit with
known ground truth.

This is the repo's analog of the reference's dataset-replay validation
(output/MapLogs.txt + Trajectory_i.txt artifacts) — no oracle descriptors
anywhere: data association must survive real rBRIEF matching.
"""

import numpy as np
import pytest

from mam3slam_tpu import api
from mam3slam_tpu.io import render, writers
from mam3slam_tpu.slam.server import ServerConfig
from mam3slam_tpu.slam.system import OK, SlamConfig

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

W, H = 640, 480
CAM = render.RenderCam(width=W, height=H)

YAML = f"""%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: {CAM.fx}
Camera1.fy: {CAM.fy}
Camera1.cx: {CAM.cx}
Camera1.cy: {CAM.cy}
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


def _slam_config(max_kf=128, max_mp=16384):
    return SlamConfig(width=W, height=H, n_feat=640, max_kf=max_kf,
                      max_mp=max_mp, n_levels=4, min_init_matches=80,
                      kf_max_interval=8)


def _ate(mas, aid, traj, states):
    est, ref = [], []
    for (ts, q, t, st), (_, _, C, _) in zip(
            mas.sys.trajectory_world(aid), traj):
        if st != 2:
            continue
        est.append(t)
        ref.append(C)
    assert len(est) > 50, f"too few OK frames: {len(est)}"
    ate = writers.ate_rmse(np.asarray(est), np.asarray(ref))
    span = float(np.ptp(np.asarray(ref), axis=0).max())
    return ate, span


def test_rendered_orbit_loop_closure(tmp_path):
    scene = render.RoomScene(seed=3)
    traj = render.orbit_trajectory(240, 0.0, 378.0, radius=2.5, bob=0.05)
    yaml_path = tmp_path / "cam.yaml"
    yaml_path.write_text(YAML)

    mas = api.MultiAgentSystem(slam_config=_slam_config(),
                               server_config=ServerConfig())
    aid = mas.add_agent(str(yaml_path))

    states = []
    frames = render.render_sequence_cached(scene, traj, CAM)
    for i, img in enumerate(frames):
        st, _ = mas.track_monocular(aid, img, i / 20.0)
        states.append(st)

    # sustained tracking from pixels
    first_ok = states.index(OK)
    ok_frac = np.mean([s == OK for s in states[first_ok:]])
    assert ok_frac > 0.95, (ok_frac, "".join(str(s) for s in states))

    # a pixel-driven LOOP event fired and was applied
    loops = [e for e in mas.server.events if e.startswith("LOOP")]
    assert loops, (mas.server.events, mas.sys.events)

    # accuracy: ATE < 1% of trajectory span (VERDICT round-1 target)
    ate, span = _ate(mas, aid, traj, states)
    assert ate < 0.01 * span, (ate, span)
    mas.shutdown()
