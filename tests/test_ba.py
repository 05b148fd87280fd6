"""Bundle adjustment / pose optimization tests on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.geometry import lie, cameras
from mam3slam_tpu.solvers import ba

FX, FY, CX, CY = 458.0, 458.0, 376.0, 240.0
CAM_PARAMS = np.array([FX, FY, CX, CY, 0, 0, 0, 0], np.float32)
RNG = np.random.default_rng(11)


def make_scene(n_cams=6, n_pts=300, noise_px=0.5, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
                    rng.uniform(4, 12, n_pts)], axis=1)
    # cameras on an arc looking at the cloud
    qs, ts = [], []
    for i in range(n_cams):
        ang = (i - n_cams / 2) * 4.0
        R = Rsc.from_euler("y", ang, degrees=True).as_matrix()
        C = np.array([0.4 * i, 0.05 * i, -0.1 * i])  # world camera center
        t = -R @ C
        qs.append(Rsc.from_matrix(R).as_quat())  # xyzw
        ts.append(t)
    q_wxyz = np.array([[q[3], q[0], q[1], q[2]] for q in qs], np.float32)
    ts = np.array(ts, np.float32)

    obs_cam, obs_pt, obs_uv = [], [], []
    for k in range(n_cams):
        R = Rsc.from_quat(np.concatenate(
            [q_wxyz[k, 1:], q_wxyz[k, :1]])).as_matrix()
        pc = pts @ R.T + ts[k]
        uv = pc[:, :2] / pc[:, 2:3] * [FX, FY] + [CX, CY]
        vis = ((pc[:, 2] > 0.5) & (uv[:, 0] > 10) & (uv[:, 0] < 740)
               & (uv[:, 1] > 10) & (uv[:, 1] < 470))
        for p in np.where(vis)[0]:
            obs_cam.append(k)
            obs_pt.append(p)
            obs_uv.append(uv[p] + rng.normal(0, noise_px, 2))
    return (q_wxyz, ts, pts.astype(np.float32), np.array(obs_cam, np.int32),
            np.array(obs_pt, np.int32), np.array(obs_uv, np.float32))


def test_pose_optimization_recovers_pose():
    q, t, pts, oc, op, ouv = make_scene(n_cams=1, noise_px=0.4)
    n = len(op)
    # perturb the pose
    dq = lie.so3_exp_quat(jnp.asarray([0.03, -0.02, 0.04]))
    q0 = lie.quat_mul(dq, jnp.asarray(q[0]))
    t0 = jnp.asarray(t[0] + np.array([0.1, -0.08, 0.12], np.float32))

    # inject outliers
    uv = ouv.copy()
    out = RNG.choice(n, n // 10, replace=False)
    uv[out] += RNG.uniform(30, 90, (len(out), 2))

    res = ba.pose_optimization(
        q0, t0, jnp.asarray(CAM_PARAMS), cameras.PINHOLE,
        jnp.asarray(pts[op]), jnp.asarray(uv),
        jnp.ones(n, np.float32), jnp.ones(n, bool))

    Rg = np.asarray(lie.quat_to_matrix(res.q))
    Rt = Rsc.from_quat(np.concatenate([q[0, 1:], q[0, :1]])).as_matrix()
    rot_err = np.rad2deg(np.linalg.norm(Rsc.from_matrix(Rg @ Rt.T).as_rotvec()))
    t_err = np.linalg.norm(np.asarray(res.t) - t[0])
    assert rot_err < 0.1, rot_err
    assert t_err < 0.02, t_err
    # outliers flagged
    inl = np.asarray(res.inlier)
    assert inl[out].mean() < 0.15
    assert np.delete(inl, out).mean() > 0.95


def _build_problem(q, t, pts, oc, op, ouv, cam_free, pt_free):
    K = len(q)
    obs = ba.Obs(cam=jnp.asarray(oc), pt=jnp.asarray(op),
                 uv=jnp.asarray(ouv),
                 w=jnp.ones(len(oc), np.float32),
                 valid=jnp.ones(len(oc), bool))
    return ba.BAProblem(
        cam_q=jnp.asarray(q), cam_t=jnp.asarray(t),
        cam_params=jnp.broadcast_to(jnp.asarray(CAM_PARAMS), (K, 8)),
        pts=jnp.asarray(pts), obs=obs,
        cam_free=jnp.asarray(cam_free), pt_free=jnp.asarray(pt_free))


def _reproj_rms(res, oc, op, ouv):
    q = np.asarray(res.cam_q)[oc]
    t = np.asarray(res.cam_t)[oc]
    X = np.asarray(res.pts)[op]
    Xc = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(X))) + t
    uv = Xc[:, :2] / Xc[:, 2:3] * [FX, FY] + [CX, CY]
    e = np.linalg.norm(uv - ouv, axis=1)
    return np.sqrt((e ** 2).mean()), e


def test_local_ba_converges():
    q, t, pts, oc, op, ouv = make_scene(n_cams=6, n_pts=300, noise_px=0.5,
                                        seed=1)
    rng = np.random.default_rng(2)
    # perturb everything except the first two (fixed, gauge) cameras
    qp = q.copy()
    tp = t.copy()
    for k in range(2, len(q)):
        dq = np.asarray(lie.so3_exp_quat(jnp.asarray(
            rng.normal(0, 0.015, 3).astype(np.float32))))
        qp[k] = np.asarray(lie.quat_mul(jnp.asarray(dq), jnp.asarray(q[k])))
        tp[k] = t[k] + rng.normal(0, 0.05, 3)
    ptsp = pts + rng.normal(0, 0.10, pts.shape).astype(np.float32)

    cam_free = np.array([False, False] + [True] * (len(q) - 2))
    pt_free = np.ones(len(pts), bool)
    prob = _build_problem(qp, tp, ptsp, oc, op, ouv, cam_free, pt_free)

    rms0, _ = _reproj_rms(
        ba.BAResult(prob.cam_q, prob.cam_t, prob.pts, None, None), oc, op, ouv)
    res = jax.jit(lambda p: ba.run_ba(p, cameras.PINHOLE, iters=15,
                                      cg_iters=40))(prob)
    rms, _ = _reproj_rms(res, oc, op, ouv)
    assert rms0 > 5.0          # perturbation was meaningful
    assert rms < 0.7, rms      # back to noise floor

    # pose accuracy
    for k in range(2, len(q)):
        Rg = np.asarray(lie.quat_to_matrix(res.cam_q[k]))
        Rt = np.asarray(lie.quat_to_matrix(jnp.asarray(q[k])))
        rot_err = np.rad2deg(np.linalg.norm(
            Rsc.from_matrix(Rg @ Rt.T).as_rotvec()))
        assert rot_err < 0.15, (k, rot_err)
        assert np.linalg.norm(np.asarray(res.cam_t[k]) - t[k]) < 0.05


def test_ba_outlier_classification():
    q, t, pts, oc, op, ouv = make_scene(n_cams=4, n_pts=200, noise_px=0.3,
                                        seed=3)
    n = len(oc)
    rng = np.random.default_rng(4)
    out = rng.choice(n, n // 12, replace=False)
    ouv2 = ouv.copy()
    ouv2[out] += rng.uniform(25, 60, (len(out), 2))

    cam_free = np.array([False, False, True, True])
    prob = _build_problem(q, t, pts, oc, op, ouv2, cam_free,
                          np.ones(len(pts), bool))
    # two-phase like the reference LBA: optimize, cut chi2 outliers,
    # re-optimize on the surviving edges (src/Optimizer.cc:1116 pattern)
    res = ba.run_ba(prob, cameras.PINHOLE, iters=5, cg_iters=30)
    prob2 = prob._replace(cam_q=res.cam_q, cam_t=res.cam_t, pts=res.pts)
    res = ba.run_ba(prob2, cameras.PINHOLE, iters=10, cg_iters=30,
                    edge_mask=res.inlier, robust=False)
    inl = np.asarray(res.inlier)
    assert inl[out].mean() < 0.1, inl[out].mean()
    assert np.delete(inl, out).mean() > 0.95, np.delete(inl, out).mean()


def test_fixed_vertices_do_not_move():
    q, t, pts, oc, op, ouv = make_scene(n_cams=4, n_pts=150, seed=5)
    cam_free = np.array([False, True, True, True])
    pt_free = np.ones(len(pts), bool)
    pt_free[:20] = False
    prob = _build_problem(q, t, pts, oc, op, ouv, cam_free, pt_free)
    res = ba.run_ba(prob, cameras.PINHOLE, iters=5, cg_iters=20)
    np.testing.assert_array_equal(np.asarray(res.cam_q[0]), q[0])
    np.testing.assert_array_equal(np.asarray(res.cam_t[0]), t[0])
    np.testing.assert_array_equal(np.asarray(res.pts[:20]), pts[:20])
