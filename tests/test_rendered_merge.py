"""Pixel-driven 2-agent merge with INTERLEAVED feeding: both agents track
concurrently (like the reference's per-agent threads pumping frames,
src/Agent.cc:92-113) on overlapping arcs of the textured room; the
centralized server must detect the inter-agent common region from real
descriptors and merge the maps while both agents are live.

Regression guard for the interleaving bug this scenario found: map-point
recency culling must use per-agent KF ids (reference agent-aware windows,
LocalMapping.cc:488-495) or each agent's insertions prematurely kill the
other agent's fresh triangulations.
"""

import numpy as np

from mam3slam_tpu import api
from mam3slam_tpu.io import render, writers
from mam3slam_tpu.slam.server import ServerConfig
from mam3slam_tpu.slam.system import OK, SlamConfig

import pytest

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


def test_rendered_interleaved_two_agent_merge(tmp_path):
    N = 130
    scene = render.RoomScene(seed=3)
    traj0 = render.orbit_trajectory(N, 0.0, 190.0, radius=2.5, bob=0.05)
    traj1 = render.orbit_trajectory(N, 170.0, 360.0, radius=2.5, bob=0.05)
    yaml_path = tmp_path / "cam.yaml"
    yaml_path.write_text(YAML)

    mas = api.MultiAgentSystem(
        slam_config=SlamConfig(width=W, height=H, n_feat=640, max_kf=160,
                               max_mp=24576, n_levels=4,
                               min_init_matches=80, kf_max_interval=8),
        server_config=ServerConfig())
    a0 = mas.add_agent(str(yaml_path))
    a1 = mas.add_agent(str(yaml_path))

    states = {a0: [], a1: []}
    frames = {a0: render.render_sequence_cached(scene, traj0, CAM),
              a1: render.render_sequence_cached(scene, traj1, CAM)}
    for i in range(N):
        for aid in (a0, a1):
            st, _ = mas.track_monocular(aid, frames[aid][i], i / 20.0)
            states[aid].append(st)

    # both agents tracked essentially the whole interleaved run
    for aid in (a0, a1):
        s = states[aid]
        first_ok = s.index(OK)
        frac = np.mean([x == OK for x in s[first_ok:]])
        assert frac > 0.95, (aid, "".join(str(x) for x in s))

    # a pixel-driven inter-agent MERGE fired and both agents co-track
    merges = [e for e in mas.server.events if e.startswith("MERGE")]
    assert merges, (mas.server.events, mas.sys.events)
    shared = {a.map_id for a in mas.sys.agents}
    assert len(shared) == 1, shared
    assert sorted(mas.get_agents_in_map(shared.pop())) == [a0, a1]

    # per-agent accuracy after the merge: ATE < 1% of each arc's span
    for aid, traj in ((a0, traj0), (a1, traj1)):
        est, ref = [], []
        for (ts, q, t, st), (_, _, C, _) in zip(
                mas.sys.trajectory_world(aid), traj):
            if st != 2:
                continue
            est.append(t)
            ref.append(C)
        assert len(est) > 50
        ate = writers.ate_rmse(np.asarray(est), np.asarray(ref))
        span = float(np.ptp(np.asarray(ref), axis=0).max())
        assert ate < 0.01 * span, (aid, ate, span)
    mas.shutdown()
