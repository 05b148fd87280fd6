"""Atlas multi-map behaviors: relocalization after brief loss, new-map
spawn after long loss, and eventual Sim3 merge back (EuRoC V1_03-style
scenario — BASELINE config 3)."""

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras
from mam3slam_tpu.slam import steps
from mam3slam_tpu.slam.server import LoopServer, ServerConfig
from mam3slam_tpu.slam.system import (LOST, NOT_INITIALIZED, OK,
                                      RECENTLY_LOST, SlamConfig, SlamSystem)

from test_slam_e2e import (FX, FY, CX, CY, H, N_FEAT, W, SyntheticWorld)
from test_server_merge import arc_trajectory

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


def empty_frame():
    return steps.FrameObs(
        uv=jnp.zeros((N_FEAT, 2), jnp.float32),
        level=jnp.zeros(N_FEAT, jnp.int32),
        angle=jnp.zeros(N_FEAT, jnp.float32),
        desc=jnp.zeros((N_FEAT, 32), jnp.uint8),
        valid=jnp.zeros(N_FEAT, bool))


def build_system(reloc_window=8):
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=96,
                     max_mp=6144, n_levels=4, kf_max_interval=10,
                     min_init_matches=60,
                     recently_lost_frames=reloc_window)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=4, vocab_k=8,
                                        vocab_depth=3))
    sys_.server = srv
    return sys_, aid, srv


def test_relocalization_after_brief_loss():
    world = SyntheticWorld(n_mp=900, seed=4)
    sys_, aid, srv = build_system()
    traj = arc_trajectory(60, start_x=0.0)
    t_i = 0
    for i in range(30):
        f, _ = world.render(*traj[i])
        sys_.track(aid, f, float(t_i))
        t_i += 1
    assert sys_.agents[aid].state == OK
    # brief occlusion: 4 empty frames
    for _ in range(4):
        sys_.track(aid, empty_frame(), float(t_i))
        t_i += 1
    assert sys_.agents[aid].state == RECENTLY_LOST
    # resume FAR from the predicted pose (teleport + 25 deg yaw) —
    # motion-model matching must fail, forcing the BoW + PnP reloc path
    from scipy.spatial.transform import Rotation as Rsc
    dR = Rsc.from_euler("y", 25, degrees=True).as_matrix().astype(np.float32)
    for i in range(5, 12):
        R, t = traj[i]
        Rj = (dR @ R).astype(np.float32)
        C = -R.T @ t
        tj = (-Rj @ C).astype(np.float32)
        f, _ = world.render(Rj, tj)
        sys_.track(aid, f, float(t_i))
        t_i += 1
    a = sys_.agents[aid]
    assert a.state == OK
    # recovery may come from the BoW reference-KF tracking fallback
    # (TrackReferenceKeyFrame, src/Tracking.cc:2640 — tried before reloc)
    # or from full relocalization; both are reference-correct.  Verify the
    # recovered ROTATION against ground truth (translation is mono-scale
    # ambiguous).
    from mam3slam_tpu.geometry import lie
    R_est = np.asarray(lie.quat_to_matrix(a.q))
    R_true, t_true = traj[11]
    R_true = (dR @ R_true).astype(np.float32)
    cos_err = (np.trace(R_est @ R_true.T) - 1) / 2
    assert np.rad2deg(np.arccos(np.clip(cos_err, -1, 1))) < 3.0
    assert a.map_id == 0  # same map — no new map spawned
    assert not [e for e in sys_.events if e.startswith("NEWMAP")]


def test_new_map_after_long_loss_then_merge():
    world = SyntheticWorld(n_mp=1400, seed=5)
    sys_, aid, srv = build_system(reloc_window=6)
    # phase 1: map region x in [0, 1.8]
    traj1 = arc_trajectory(40, start_x=0.0)
    t_i = 0
    for i in range(40):
        f, _ = world.render(*traj1[i])
        sys_.track(aid, f, float(t_i))
        t_i += 1
    assert sys_.agents[aid].state == OK
    n_kf_map0 = int(np.asarray(sys_.ms.kf_valid).sum())

    # long occlusion -> LOST -> new map in atlas
    for _ in range(10):
        sys_.track(aid, empty_frame(), float(t_i))
        t_i += 1
    assert sys_.agents[aid].state in (LOST, NOT_INITIALIZED)
    newmaps = [e for e in sys_.events if e.startswith("NEWMAP")]
    assert newmaps, sys_.events
    new_map_id = sys_.agents[aid].map_id
    assert new_map_id != 0

    # phase 2: resume in a DISJOINT region (x around 3.6) -> init new map,
    # then sweep back toward the overlap with map 0
    traj2 = arc_trajectory(60, start_x=3.6, step=-0.05)
    states2 = []
    for i in range(60):
        f, _ = world.render(*traj2[i])
        st, _ = sys_.track(aid, f, float(t_i))
        states2.append(st)
        t_i += 1
    assert OK in states2

    merges = [e for e in srv.events if e.startswith("MERGE")]
    relocs = [e for e in sys_.events if e.startswith("RELOC")]
    # either the server merged the two maps, or tracking relocalized into
    # map 0 directly when re-entering the overlap — both are correct
    # multi-map recoveries (reference supports both paths)
    assert merges or any("-> 0" in e for e in relocs), \
        (srv.events, sys_.events)
    if merges:
        kfm = np.asarray(sys_.ms.kf_map)[np.asarray(sys_.ms.kf_valid)]
        assert len(np.unique(kfm)) == 1
