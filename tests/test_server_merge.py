"""Centralized server tests: inter-agent map merge on a shared synthetic
world (the core MAM3SLAM capability — two agents, two maps, Sim3 fusion)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.geometry import cameras, lie
from mam3slam_tpu.slam import steps
from mam3slam_tpu.slam.server import LoopServer, ServerConfig
from mam3slam_tpu.slam.system import OK, SlamConfig, SlamSystem

from test_slam_e2e import (FX, FY, CX, CY, H, N_FEAT, W, SyntheticWorld,
                           umeyama_align)

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


def arc_trajectory(n, start_x=0.0, step=0.045):
    poses = []
    for i in range(n):
        yaw = np.deg2rad(0.1 * i)
        R = Rsc.from_euler("y", yaw).as_matrix().astype(np.float32)
        C = np.array([start_x + step * i, 0.01 * np.sin(i * 0.3),
                      0.015 * i], np.float32)
        t = (-R @ C).astype(np.float32)
        poses.append((R, t))
    return poses


def test_two_agent_merge():
    world = SyntheticWorld(n_mp=1200, seed=1)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=96,
                     max_mp=6144, n_levels=4, kf_max_interval=10,
                     min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    a0 = sys_.add_agent()
    a1 = sys_.add_agent()
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=4, vocab_k=8,
                                        vocab_depth=3))
    sys_.server = srv

    # agent 0 maps x in [0, 2.2]; agent 1 starts at x=1.1 (overlap) and
    # continues to 3.3 — their regions overlap in [1.1, 2.2]
    traj0 = arc_trajectory(50, start_x=0.0)
    traj1 = arc_trajectory(50, start_x=1.1)

    states0, states1 = [], []
    for i in range(50):
        R, t = traj0[i]
        f, _ = world.render(R, t)
        s0, _ = sys_.track(a0, f, float(i))
        states0.append(s0)
    for i in range(50):
        R, t = traj1[i]
        f, _ = world.render(R, t)
        s1, _ = sys_.track(a1, f, float(100 + i))
        states1.append(s1)

    # both agents tracked
    assert OK in states0 and OK in states1
    merges = [e for e in srv.events if e.startswith("MERGE")]
    assert merges, f"no merge happened; events={srv.events} " \
                   f"hyp={srv.hyp} maps={np.unique(np.asarray(sys_.ms.kf_map))}"

    # after the merge both agents share one map
    assert sys_.agents[a0].map_id == sys_.agents[a1].map_id
    ms = sys_.ms
    kfm = np.asarray(ms.kf_map)[np.asarray(ms.kf_valid)]
    assert len(np.unique(kfm)) == 1

    # agent 1's trajectory, now in the shared frame, aligns with GT
    traj = sys_.trajectory_world(a1)
    est, gt = [], []
    for (ts, qw, tw, st) in traj:
        if st != OK or ts < 100:
            continue
        i = int(ts - 100)
        R, t = traj1[i]
        est.append(tw)
        gt.append(-R.T @ t)
    est, gt = np.array(est), np.array(gt)
    assert len(est) > 25
    aligned = umeyama_align(est, gt)
    ate = np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean())
    assert ate < 0.08, ate
