"""Visual-inertial optimizers vs an analytic circular trajectory
(reference FullInertialBA / InertialOptimization /
PoseInertialOptimizationLastKeyFrame semantics, src/Optimizer.cc)."""

import numpy as np
import jax
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras, lie
from mam3slam_tpu.solvers import ba as ba_mod
from mam3slam_tpu.solvers import imu as imu_mod
from mam3slam_tpu.solvers import vi as vi_mod

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

G = imu_mod.GRAVITY
FX = FY = 300.0
CX, CY = 320.0, 240.0


def simulate(n_kf=8, dt_kf=0.25, rate=200, r=2.0, omega=0.6,
             vz=0.4, bg_true=(0.004, -0.003, 0.002),
             ba_true=(0.03, -0.02, 0.04), seed=0):
    """Circular trajectory with constant body rate: closed-form IMU.

    R_wb(t) = Rz(omega t); p(t) = [r cos, r sin, vz t];
    gyro_body = [0, 0, omega]; acc_body = R^T (a_w - g_w).
    Cameras look along world +z (body == camera), landmarks above.
    """
    rng = np.random.default_rng(seed)
    bg_true = np.asarray(bg_true, np.float32)
    ba_true = np.asarray(ba_true, np.float32)
    g_w = np.array([0.0, 0.0, -G])

    def Rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    def state(t):
        Rwb = Rz(omega * t)
        p = np.array([r * np.cos(omega * t), r * np.sin(omega * t),
                      vz * t])
        v = np.array([-r * omega * np.sin(omega * t),
                      r * omega * np.cos(omega * t), vz])
        a_w = np.array([-r * omega ** 2 * np.cos(omega * t),
                        -r * omega ** 2 * np.sin(omega * t), 0.0])
        return Rwb, p, v, a_w

    # IMU measurement stream between keyframes
    n_per = int(round(dt_kf * rate))
    dts = np.full(n_per, 1.0 / rate, np.float32)
    preints = []
    calib = imu_mod.ImuCalib(sigma_g=jnp.asarray(1.7e-4),
                             sigma_a=jnp.asarray(2e-3),
                             walk_g=jnp.asarray(1e-5),
                             walk_a=jnp.asarray(3e-4))
    for k in range(n_kf - 1):
        t0 = k * dt_kf
        gyr = np.zeros((n_per, 3), np.float32)
        acc = np.zeros((n_per, 3), np.float32)
        for s in range(n_per):
            # midpoint sampling of the continuous signal
            tm = t0 + (s + 0.5) / rate
            Rwb, _, _, a_w = state(tm)
            gyr[s] = np.array([0, 0, omega]) + bg_true
            acc[s] = Rwb.T @ (a_w - g_w) + ba_true
        preints.append(imu_mod.preintegrate(
            jnp.asarray(gyr), jnp.asarray(acc), jnp.asarray(dts),
            jnp.ones(n_per, bool), jnp.zeros(3), jnp.zeros(3), calib))

    # keyframe ground truth (T_cw with body == camera: R_cw = R_wb^T)
    q_gt, t_gt, v_gt = [], [], []
    for k in range(n_kf):
        Rwb, p, v, _ = state(k * dt_kf)
        Rcw = Rwb.T
        q_gt.append(np.asarray(lie.quat_from_matrix(jnp.asarray(
            Rcw, jnp.float32))))
        t_gt.append((-Rcw @ p).astype(np.float32))
        v_gt.append(v.astype(np.float32))
    q_gt, t_gt, v_gt = map(np.array, (q_gt, t_gt, v_gt))

    # landmarks above the circle; visible in all cameras (world +z fwd)
    n_pts = 120
    pts = np.stack([rng.uniform(-1.5, 1.5, n_pts) + 0.0,
                    rng.uniform(-1.5, 1.5, n_pts),
                    rng.uniform(8.0, 14.0, n_pts)], axis=1).astype(
        np.float32)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    oc, op, ouv = [], [], []
    for k in range(n_kf):
        Xc = np.asarray(lie.quat_rotate(
            jnp.asarray(q_gt[k])[None], jnp.asarray(pts))) + t_gt[k]
        uv = Xc[:, :2] / Xc[:, 2:3] * [FX, FY] + [CX, CY]
        for i in range(n_pts):
            oc.append(k)
            op.append(i)
            ouv.append(uv[i])
    obs = ba_mod.Obs(cam=jnp.asarray(oc, jnp.int32),
                     pt=jnp.asarray(op, jnp.int32),
                     uv=jnp.asarray(np.array(ouv), jnp.float32),
                     w=jnp.ones(len(oc), jnp.float32),
                     valid=jnp.ones(len(oc), bool))
    iedges = vi_mod.InertialEdges(
        i=jnp.arange(n_kf - 1, dtype=jnp.int32),
        j=jnp.arange(1, n_kf, dtype=jnp.int32),
        preint=jax.tree.map(lambda *xs: jnp.stack(xs), *preints),
        valid=jnp.ones(n_kf - 1, bool))
    return dict(q=q_gt, t=t_gt, v=v_gt, pts=pts, obs=obs, iedges=iedges,
                cam=cam, calib=calib, bg=bg_true, ba=ba_true,
                n_kf=n_kf)


def test_full_inertial_ba_recovers_states():
    sim = simulate()
    n_kf = sim["n_kf"]
    rng = np.random.default_rng(1)

    q0 = sim["q"].copy()
    t0 = sim["t"].copy()
    v0 = sim["v"].copy()
    pts0 = sim["pts"] + rng.normal(0, 0.01, sim["pts"].shape)
    for k in range(1, n_kf):  # KF0 fixed = gauge
        dq = lie.so3_exp_quat(jnp.asarray(rng.normal(0, 0.01, 3),
                                          jnp.float32))
        q0[k] = np.asarray(lie.quat_normalize(lie.quat_mul(
            dq, jnp.asarray(q0[k]))))
        t0[k] += rng.normal(0, 0.03, 3)
        v0[k] += rng.normal(0, 0.1, 3)
    # KF0 seeded with truth (it is the fixed gauge anchor)
    v0[0] = sim["v"][0]
    bg0 = np.tile(sim["bg"], (n_kf, 1))
    ba0 = np.tile(sim["ba"], (n_kf, 1))
    bg0[1:] += rng.normal(0, 0.002, (n_kf - 1, 3))
    ba0[1:] += rng.normal(0, 0.01, (n_kf - 1, 3))

    cam_free = np.ones(n_kf, bool)
    cam_free[0] = False
    prob = vi_mod.VIProblem(
        cam_q=jnp.asarray(q0, jnp.float32), cam_t=jnp.asarray(t0, jnp.float32),
        vel=jnp.asarray(v0, jnp.float32), bg=jnp.asarray(bg0, jnp.float32),
        ba=jnp.asarray(ba0, jnp.float32),
        cam_params=jnp.broadcast_to(sim["cam"].params, (n_kf, 8)),
        pts=jnp.asarray(pts0, jnp.float32), obs=sim["obs"],
        iedges=sim["iedges"],
        cam_free=jnp.asarray(cam_free),
        pt_free=jnp.ones(len(pts0), bool),
        gravity=jnp.asarray([0.0, 0.0, -G]))

    res = vi_mod.run_vi_ba(prob, cameras.PINHOLE, sim["calib"], iters=15)

    # poses recovered
    for k in range(n_kf):
        d = abs(float(jnp.dot(res.cam_q[k], jnp.asarray(sim["q"][k]))))
        assert 2 * np.arccos(min(d, 1.0)) < 2e-3, k
        assert np.linalg.norm(np.asarray(res.cam_t[k]) - sim["t"][k]) < 5e-3
    # velocities recovered
    assert np.abs(np.asarray(res.vel) - sim["v"]).max() < 0.02
    # biases recovered (preintegration was done at zero bias; the edges
    # carry first-order bias jacobians, so the optimizer must find the
    # true biases to make the deltas consistent)
    assert np.abs(np.asarray(res.bg)[1:] - sim["bg"]).max() < 1e-3
    assert np.abs(np.asarray(res.ba)[1:] - sim["ba"]).max() < 2e-2


def test_inertial_optimization_recovers_gravity_scale_bias():
    # accel bias zero for the init problem: with rotation only about the
    # gravity axis, ba and scale are near-unobservable jointly — the
    # reference's strong priorA (1e6) encodes exactly this assumption
    sim = simulate(n_kf=10, ba_true=(0.0, 0.0, 0.0))
    n_kf = sim["n_kf"]
    # visual map is correct up to scale and a rotated gravity: build
    # poses whose positions are shrunk by s_true and rotated by R0
    s_true = 2.4
    phi0 = np.array([0.06, -0.09, 0.0], np.float32)  # roll/pitch offset
    R0 = np.asarray(lie.so3_exp(jnp.asarray(phi0)))

    q_vis, t_vis = [], []
    for k in range(n_kf):
        R_cw = np.asarray(lie.quat_to_matrix(jnp.asarray(sim["q"][k])))
        p_w = -R_cw.T @ sim["t"][k]
        # world' = R0^T world, scaled
        R_cw2 = R_cw @ R0
        p2 = (R0.T @ p_w) / s_true
        q_vis.append(np.asarray(lie.quat_from_matrix(
            jnp.asarray(R_cw2, jnp.float32))))
        t_vis.append((-R_cw2 @ p2).astype(np.float32))

    Rwg, s, bg, bahat, vel = vi_mod.inertial_optimization(
        jnp.asarray(np.array(q_vis)), jnp.asarray(np.array(t_vis)),
        jnp.ones(n_kf, bool), sim["iedges"], sim["calib"])

    assert abs(float(s) - s_true) / s_true < 0.02, float(s)
    # gravity direction: Rwg aligns the assumed -z gravity with the true
    # one as seen in the visual frame: g_vis = R0^T g_w
    g_est = np.asarray(Rwg @ jnp.asarray([0.0, 0.0, -G]))
    g_true = R0.T @ np.array([0.0, 0.0, -G])
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert np.arccos(np.clip(cos, -1, 1)) < np.deg2rad(0.5)
    assert np.abs(np.asarray(bg) - sim["bg"]).max() < 1e-3


def test_pose_inertial_optimization_tracks_frame():
    sim = simulate(n_kf=3)
    rng = np.random.default_rng(3)
    calib = sim["calib"]
    # reference state = KF0 truth; current frame = KF1, perturbed
    q_ref = jnp.asarray(sim["q"][0])
    t_ref = jnp.asarray(sim["t"][0])
    v_ref = jnp.asarray(sim["v"][0])
    bg_ref = jnp.asarray(sim["bg"])
    ba_ref = jnp.asarray(sim["ba"])
    preint = jax.tree.map(lambda x: x[0], sim["iedges"].preint)

    dq = lie.so3_exp_quat(jnp.asarray([0.02, -0.015, 0.01]))
    q0 = lie.quat_normalize(lie.quat_mul(dq, jnp.asarray(sim["q"][1])))
    t0 = jnp.asarray(sim["t"][1] + rng.normal(0, 0.05, 3), jnp.float32)
    v0 = jnp.asarray(sim["v"][1] + rng.normal(0, 0.2, 3), jnp.float32)

    # visible points + projections in frame 1 (a few outliers)
    pts = jnp.asarray(sim["pts"])
    Xc = lie.quat_rotate(jnp.asarray(sim["q"][1])[None], pts) + jnp.asarray(
        sim["t"][1])[None]
    uv = np.array(cameras.project_ideal(sim["cam"], Xc))
    out = rng.choice(len(uv), 12, replace=False)
    uv[out] += rng.uniform(30, 60, (12, 2))
    q, t, v, bg, ba, inlier = vi_mod.pose_inertial_optimization(
        q0, t0, v0, bg_ref, ba_ref, sim["cam"].params, cameras.PINHOLE,
        pts, jnp.asarray(uv, jnp.float32), jnp.ones(len(uv)),
        jnp.ones(len(uv), bool),
        q_ref, t_ref, v_ref, bg_ref, ba_ref, preint, calib)

    d = abs(float(jnp.dot(q, jnp.asarray(sim["q"][1]))))
    assert 2 * np.arccos(min(d, 1.0)) < 2e-3
    assert np.linalg.norm(np.asarray(t) - sim["t"][1]) < 5e-3
    assert np.linalg.norm(np.asarray(v) - sim["v"][1]) < 0.05
    inl = np.asarray(inlier)
    assert not inl[out].any()
    keep = np.ones(len(inl), bool)
    keep[out] = False
    assert inl[keep].mean() > 0.95
