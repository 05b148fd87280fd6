"""Mono-inertial tracking path: IMU measurements feed the navigation-
state prediction (reference Tracking::PreintegrateIMU/PredictStateIMU,
src/Tracking.cc:1633,2060) in place of the constant-velocity model.

Scenario: a smooth run followed by a sharp yaw burst.  Pure
constant-velocity prediction projects the map far from the true location
and tracking degrades/loses; the IMU-predicted pose keeps the projection
radius tight and tracking survives.
"""

import sys, os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

sys.path.insert(0, os.path.dirname(__file__))
from test_slam_e2e import FX, FY, CX, CY, H, N_FEAT, W, SyntheticWorld

from mam3slam_tpu.geometry import cameras
from mam3slam_tpu.slam.system import OK, SlamConfig, SlamSystem
from mam3slam_tpu.solvers.imu import GRAVITY

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

FPS = 20.0
IMU_PER_FRAME = 10


def burst_trajectory(n=70, burst_at=45, burst_len=6, burst_deg=7.0):
    """Gentle arc, then ``burst_len`` frames of ``burst_deg``/frame yaw."""
    poses = []
    yaw = 0.0
    for i in range(n):
        dyaw = 0.12 if not (burst_at <= i < burst_at + burst_len) \
            else burst_deg
        yaw += np.deg2rad(dyaw)
        R = Rsc.from_euler("y", yaw).as_matrix().astype(np.float32)
        C = np.array([0.04 * i, 0.01 * np.sin(i * 0.3), 0.015 * i],
                     np.float32)
        t = (-R @ C).astype(np.float32)
        poses.append((R, t, C))
    return poses


def synth_imu(poses, i):
    """Perfect gyro/acc between frame i-1 and i from ground truth (body
    frame == camera frame; accelerometer measures specific force)."""
    dt = 1.0 / FPS
    R0, _, C0 = poses[i - 1]
    R1, _, C1 = poses[i]
    # body angular velocity: R1 = R0 * exp(hat(w) dt)  (R are world->cam)
    dR = R0 @ R1.T                     # R_wb0^T... careful: R_wb = R^T
    Rb0, Rb1 = R0.T, R1.T              # body->world
    w_body = Rsc.from_matrix(Rb0.T @ Rb1).as_rotvec() / dt
    # world acceleration from neighbor centers (finite differences)
    Cm = poses[max(i - 2, 0)][2]
    Cp = poses[min(i + 1, len(poses) - 1)][2]
    v0 = (C0 - Cm) / dt
    v1 = (C1 - C0) / dt
    a_w = (v1 - v0) / dt
    g_w = np.array([0.0, 0.0, -GRAVITY])
    n = IMU_PER_FRAME
    gyro = np.tile(w_body, (n, 1)).astype(np.float32)
    # specific force in the (rotating) body frame, sampled mid-interval
    Rmid = Rb0
    f_b = (Rmid.T @ (a_w - g_w)).astype(np.float32)
    acc = np.tile(f_b, (n, 1))
    dts = np.full(n, dt / n, np.float32)
    return gyro, acc, dts


def _run_sys(use_imu):
    world = SyntheticWorld(n_mp=900, seed=4)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=64,
                     max_mp=6144, n_levels=4, min_init_matches=60,
                     kf_max_interval=10)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()
    poses = burst_trajectory()
    states = []
    for i, (R, t, C) in enumerate(poses):
        f, _ = world.render(R, t)
        imu = synth_imu(poses, i) if (use_imu and i > 0) else None
        st, _ = sys_.track(aid, f, i / FPS, imu=imu)
        states.append(st)
    return states, sys_.agents[aid].n_fallback


def test_imu_prediction_survives_rotation_burst():
    st_imu, fb_imu = _run_sys(use_imu=True)
    st_cv, fb_cv = _run_sys(use_imu=False)
    burst = slice(45, 60)
    ok_imu = st_imu[burst].count(OK)
    # the IMU path must track through the burst...
    assert ok_imu >= 13, (ok_imu, st_imu)
    # ...WITHOUT resorting to the widened-search / BoW fallback rescue
    # stages the constant-velocity model needs during the burst (the
    # yaw burst moves projections ~37 px/frame, far outside the tight
    # first-stage radius; an accurate IMU prediction re-centers it)
    assert fb_imu < fb_cv, (fb_imu, fb_cv)
    assert fb_imu <= 1, fb_imu
    # steady-state tracking unaffected before the burst
    assert st_imu[10:45].count(OK) >= 33
