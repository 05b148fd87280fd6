"""Two agents with DIFFERENT camera intrinsics sharing one system —
tracking, per-KF calibration in BA/triangulation, and inter-agent merge
(the reference's own fixtures are two cameras with different calibrations,
test/settingsForTest_00/01.yaml)."""

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras
from mam3slam_tpu.slam import steps
from mam3slam_tpu.slam.server import LoopServer, ServerConfig
from mam3slam_tpu.slam.system import OK, SlamConfig, SlamSystem

from test_slam_e2e import H, N_FEAT, W, SyntheticWorld, umeyama_align
from test_server_merge import arc_trajectory

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

CAM0 = dict(fx=300.0, fy=300.0, cx=320.0, cy=240.0)
CAM1 = dict(fx=340.0, fy=335.0, cx=316.0, cy=245.0)  # distinctly different


def render(world, R, t, cam_k, rng):
    pc = world.pts @ R.T + t
    uv = (pc[:, :2] / np.maximum(pc[:, 2:3], 1e-6)
          * [cam_k["fx"], cam_k["fy"]] + [cam_k["cx"], cam_k["cy"]])
    vis = ((pc[:, 2] > 0.5) & (pc[:, 2] < 20)
           & (uv[:, 0] > 5) & (uv[:, 0] < W - 5)
           & (uv[:, 1] > 5) & (uv[:, 1] < H - 5))
    ids = np.where(vis)[0][:N_FEAT]
    n = len(ids)
    f_uv = np.zeros((N_FEAT, 2), np.float32)
    f_desc = np.zeros((N_FEAT, 32), np.uint8)
    f_uv[:n] = uv[ids] + rng.normal(0, 0.3, (n, 2))
    d = world.desc[ids].copy()
    byte = rng.integers(0, 32, n)
    bit = rng.integers(0, 8, n).astype(np.uint8)
    d[np.arange(n), byte] ^= (1 << bit).astype(np.uint8)
    f_desc[:n] = d
    valid = np.arange(N_FEAT) < n
    return steps.FrameObs(
        uv=jnp.asarray(f_uv), level=jnp.zeros(N_FEAT, jnp.int32),
        angle=jnp.zeros(N_FEAT, jnp.float32), desc=jnp.asarray(f_desc),
        valid=jnp.asarray(valid))


def test_two_agents_different_intrinsics_merge():
    world = SyntheticWorld(n_mp=1200, seed=13)
    rng = np.random.default_rng(3)
    cam0 = cameras.make_pinhole(**CAM0)
    cam1 = cameras.make_pinhole(**CAM1)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=96,
                     max_mp=6144, n_levels=4, kf_max_interval=10,
                     min_init_matches=60)
    sys_ = SlamSystem(cfg, cam0)
    a0 = sys_.add_agent(cam=cam0)
    a1 = sys_.add_agent(cam=cam1)
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=4, vocab_k=8,
                                        vocab_depth=3))
    sys_.server = srv

    traj0 = arc_trajectory(50, start_x=0.0)
    traj1 = arc_trajectory(50, start_x=1.1)
    t = 0.0
    for R, tt in traj0:
        sys_.track(a0, render(world, R, tt, CAM0, rng), t)
        t += 1.0
    for R, tt in traj1:
        sys_.track(a1, render(world, R, tt, CAM1, rng), t)
        t += 1.0

    assert sys_.agents[a0].state == OK
    assert sys_.agents[a1].state == OK
    # per-KF calibration actually stored per agent
    ms = sys_.ms
    kf_agent = np.asarray(ms.kf_agent)
    kf_cam = np.asarray(ms.kf_cam)
    kv = np.asarray(ms.kf_valid)
    assert np.allclose(kf_cam[kv & (kf_agent == 0)][:, 0], CAM0["fx"])
    assert np.allclose(kf_cam[kv & (kf_agent == 1)][:, 0], CAM1["fx"])

    merges = [e for e in srv.events if e.startswith("MERGE")]
    assert merges, srv.events
    assert sys_.agents[a0].map_id == sys_.agents[a1].map_id

    # agent 1 accuracy in the merged frame
    traj = sys_.trajectory_world(a1)
    est, gt = [], []
    for ts, qw, tw, st in traj:
        if st != OK or ts < 50:
            continue
        R, tt = traj1[int(ts - 50)]
        est.append(tw)
        gt.append(-R.T @ tt)
    est, gt = np.array(est), np.array(gt)
    assert len(est) > 25
    al = umeyama_align(est, gt)
    ate = np.sqrt(((al - gt) ** 2).sum(axis=1).mean())
    assert ate < 0.08, ate
