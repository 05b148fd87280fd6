"""Sim3 solver + essential-graph PGO tests on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.geometry import cameras, lie
from mam3slam_tpu.solvers import pgo, sim3

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

RNG = np.random.default_rng(17)
CAM = cameras.make_pinhole(300.0, 300.0, 320.0, 240.0)


def test_horn_exact():
    p2 = RNG.uniform(-3, 3, (40, 3)).astype(np.float32)
    R = Rsc.from_euler("xyz", [20, -10, 35], degrees=True).as_matrix()
    s, t = 1.7, np.array([0.4, -1.2, 2.0])
    p1 = (s * p2 @ R.T + t).astype(np.float32)
    q, tg, sg = sim3.horn_sim3(jnp.asarray(p1)[None], jnp.asarray(p2)[None])
    Rg = np.asarray(lie.quat_to_matrix(q[0]))
    np.testing.assert_allclose(Rg, R, atol=1e-4)
    np.testing.assert_allclose(float(sg[0]), s, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tg[0]), t, atol=1e-3)


def test_horn_fix_scale():
    p2 = RNG.uniform(-3, 3, (30, 3)).astype(np.float32)
    R = Rsc.from_euler("z", 25, degrees=True).as_matrix()
    p1 = (p2 @ R.T + [1.0, 0, 0]).astype(np.float32)
    q, t, s = sim3.horn_sim3(jnp.asarray(p1)[None], jnp.asarray(p2)[None],
                             fix_scale=True)
    assert float(s[0]) == 1.0
    np.testing.assert_allclose(np.asarray(lie.quat_to_matrix(q[0])), R,
                               atol=1e-4)


def _sim3_scene(n=80, n_out=20, scale=1.4, noise=0.01):
    """Two camera-frame point clouds related by a Sim3, with outliers."""
    pc2 = np.stack([RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
                    RNG.uniform(3, 8, n)], axis=1).astype(np.float32)
    R = Rsc.from_euler("xyz", [4, 7, -3], degrees=True).as_matrix()
    t = np.array([0.3, -0.1, 0.4])
    pc1 = (scale * pc2 @ R.T + t).astype(np.float32)
    pc1 += RNG.normal(0, noise, pc1.shape)
    out = RNG.choice(n, n_out, replace=False)
    pc1[out] += RNG.uniform(0.5, 2.0, (n_out, 3))

    def proj(p):
        return np.asarray(cameras.project_ideal(CAM, jnp.asarray(p)))

    uv1 = proj(pc1 if True else pc1)
    # observations = true projections of the *consistent* geometry
    uv1 = proj((scale * pc2 @ R.T + t).astype(np.float32))
    uv2 = proj(pc2)
    return pc1, pc2, uv1, uv2, R, t, scale, out


def test_ransac_sim3_recovers_with_outliers():
    pc1, pc2, uv1, uv2, R, t, s, out = _sim3_scene()
    n = len(pc1)
    # world == camera frames (identity poses) for this test
    ident_q = jnp.asarray([1.0, 0, 0, 0])
    zero = jnp.zeros(3)
    res = sim3.ransac_sim3(
        jnp.asarray(pc1), jnp.asarray(pc2), jnp.ones(n, bool),
        jnp.asarray(uv1), jnp.asarray(uv2), CAM, CAM,
        ident_q, zero, ident_q, zero, jax.random.PRNGKey(0),
        jnp.ones(n), jnp.ones(n))
    assert bool(res.ok)
    Rg = np.asarray(lie.quat_to_matrix(res.q))
    err = np.rad2deg(np.linalg.norm(Rsc.from_matrix(Rg @ R.T).as_rotvec()))
    assert err < 0.5, err
    assert abs(float(res.s) - s) < 0.02
    inl = np.asarray(res.inliers)
    assert inl[out].mean() < 0.15
    assert np.delete(inl, out).mean() > 0.9


def test_optimize_sim3_refines():
    pc1, pc2, uv1, uv2, R, t, s, out = _sim3_scene(noise=0.0, n_out=0)
    n = len(pc1)
    # perturb initial guess
    dq = lie.so3_exp_quat(jnp.asarray([0.02, -0.03, 0.01]))
    q0 = lie.quat_mul(dq, lie.quat_from_matrix(jnp.asarray(
        R.astype(np.float32))))
    t0 = jnp.asarray((t + [0.05, -0.05, 0.02]).astype(np.float32))
    s0 = jnp.asarray(s * 1.08, jnp.float32)
    q, tg, sg, inl, n_in = sim3.optimize_sim3(
        q0, t0, s0, jnp.asarray(pc1), jnp.asarray(pc2),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(n, bool), CAM, CAM,
        jnp.ones(n), jnp.ones(n))
    Rg = np.asarray(lie.quat_to_matrix(q))
    err = np.rad2deg(np.linalg.norm(Rsc.from_matrix(Rg @ R.T).as_rotvec()))
    assert err < 0.1, err
    assert abs(float(sg) - s) < 0.01
    assert int(n_in) > 0.95 * n


def test_pgo_closes_loop():
    """Circular trajectory with odometry drift; loop edge snaps it closed
    (the CorrectLoop -> OptimizeEssentialGraph scenario)."""
    K = 40
    radius = 5.0
    # ground truth: poses on a circle (T_kw world->kf)
    gt = []
    for k in range(K):
        ang = 2 * np.pi * k / K
        Rwc = Rsc.from_euler("y", np.rad2deg(ang), degrees=True).as_matrix()
        C = np.array([radius * np.sin(ang), 0.0, radius * (1 - np.cos(ang))])
        Rcw = Rwc.T
        t = -Rcw @ C
        gt.append((Rcw.astype(np.float32), t.astype(np.float32)))

    # odometry edges with drift: relative measurements are exact, but
    # integrated poses accumulate injected noise + scale drift
    q_est = [lie.quat_from_matrix(jnp.asarray(gt[0][0]))]
    t_est = [jnp.asarray(gt[0][1])]
    s_est = [jnp.asarray(1.0, jnp.float32)]
    edges_i, edges_j, eq, et, es = [], [], [], [], []
    drift_rng = np.random.default_rng(2)
    for k in range(1, K):
        S_prev = lie.Sim3(lie.quat_from_matrix(jnp.asarray(gt[k - 1][0])),
                          jnp.asarray(gt[k - 1][1]), jnp.asarray(1.0))
        S_cur = lie.Sim3(lie.quat_from_matrix(jnp.asarray(gt[k][0])),
                         jnp.asarray(gt[k][1]), jnp.asarray(1.0))
        S_rel = lie.sim3_compose(S_cur, lie.sim3_inverse(S_prev))  # j in i
        # measurement = exact relative
        edges_i.append(k - 1)
        edges_j.append(k)
        eq.append(np.asarray(S_rel.q))
        et.append(np.asarray(S_rel.t))
        es.append(float(S_rel.s))
        # integrated estimate with noise (drifting odometry)
        noise = jnp.asarray(np.concatenate([
            drift_rng.normal(0, 0.01, 3), drift_rng.normal(0, 0.004, 3),
            [0.004]]).astype(np.float32))
        S_noisy_rel = lie.sim3_compose(lie.sim3_exp(noise), S_rel)
        S_est_prev = lie.Sim3(q_est[-1], t_est[-1], s_est[-1])
        S_est_cur = lie.sim3_compose(S_noisy_rel, S_est_prev)
        q_est.append(S_est_cur.q)
        t_est.append(S_est_cur.t)
        s_est.append(S_est_cur.s)

    # loop edge K-1 -> 0 (exact)
    S_last = lie.Sim3(lie.quat_from_matrix(jnp.asarray(gt[K - 1][0])),
                      jnp.asarray(gt[K - 1][1]), jnp.asarray(1.0))
    S_first = lie.Sim3(lie.quat_from_matrix(jnp.asarray(gt[0][0])),
                       jnp.asarray(gt[0][1]), jnp.asarray(1.0))
    S_loop = lie.sim3_compose(S_first, lie.sim3_inverse(S_last))
    edges_i.append(K - 1)
    edges_j.append(0)
    eq.append(np.asarray(S_loop.q))
    et.append(np.asarray(S_loop.t))
    es.append(float(S_loop.s))

    E = len(edges_i)
    edges = pgo.PGOEdges(
        i=jnp.asarray(edges_i, jnp.int32), j=jnp.asarray(edges_j, jnp.int32),
        q=jnp.asarray(np.array(eq), jnp.float32),
        t=jnp.asarray(np.array(et), jnp.float32),
        s=jnp.asarray(np.array(es), jnp.float32),
        w=jnp.ones(E), valid=jnp.ones(E, bool))

    q0 = jnp.stack(q_est)
    t0 = jnp.stack(t_est)
    s0 = jnp.stack(s_est)
    fixed = jnp.zeros(K, bool).at[0].set(True)

    # drift before optimization is substantial
    drift0 = float(jnp.linalg.norm(t0[K - 1] - jnp.asarray(gt[K - 1][1])))
    q, t, s = pgo.optimize_essential_graph(q0, t0, s0, fixed, edges,
                                           iters=15)
    errs = []
    for k in range(K):
        C_est = -np.asarray(lie.quat_rotate(lie.quat_conj(q[k]),
                                            t[k])) / float(s[k])
        Rcw, tcw = gt[k]
        C_gt = -Rcw.T @ tcw
        errs.append(np.linalg.norm(C_est - C_gt))
    errs = np.array(errs)
    assert drift0 > 0.2, drift0
    assert errs.max() < 0.08, errs.max()
    # scales return to ~1
    assert np.abs(np.asarray(s) - 1.0).max() < 0.03


def test_essential_graph_4dof():
    """4DoF inertial PGO variant (reference Optimizer.cc:5299): only yaw
    (about gravity) + translation are corrected; roll/pitch of every
    pose is provably untouched; a yaw+translation drift loop closes."""
    from mam3slam_tpu.geometry import lie as lie_mod
    from mam3slam_tpu.solvers import pgo as pgo_mod

    rng = np.random.default_rng(3)
    K = 40
    # ground-truth ring (general orientations incl. roll/pitch content)
    qs, ts = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        c, s = np.cos(a), np.sin(a)
        R = np.stack([np.array([s, 0.0, -c]),
                      np.array([0.0, 1.0, 0.0]),
                      np.array([c, 0.0, s])]).astype(np.float32)
        # small constant tilt so rotations are NOT pure yaw
        tilt = Rsc.from_euler("x", 0.15).as_matrix().astype(np.float32)
        R = R @ tilt
        C = np.array([2.0 * c, 0.0, 2.0 * s], np.float32)
        qs.append(np.asarray(lie_mod.quat_from_matrix(jnp.asarray(R))))
        ts.append(-R @ C)
    qs, ts = np.stack(qs), np.stack(ts)

    # exact relative edges: chain + loop edge
    ei = np.r_[np.arange(K - 1), [K - 1]]
    ej = np.r_[np.arange(1, K), [0]]
    qrel, trel = [], []
    for i, j in zip(ei, ej):
        qr = np.asarray(lie_mod.quat_mul(
            jnp.asarray(qs[j]), lie_mod.quat_conj(jnp.asarray(qs[i]))))
        qrel.append(qr)
        trel.append(ts[j] - np.asarray(lie_mod.quat_rotate(
            jnp.asarray(qr), jnp.asarray(ts[i]))))
    edges = pgo_mod.PGOEdges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        q=jnp.asarray(np.stack(qrel)), t=jnp.asarray(np.stack(trel)),
        s=jnp.ones(len(ei)), w=jnp.ones(len(ei)),
        valid=jnp.ones(len(ei), bool))

    # drifted initialization: growing yaw + translation error (the
    # inertial drift mode — roll/pitch are gravity-observable)
    qd, td = [qs[0]], [ts[0]]
    for k in range(1, K):
        dyaw = 0.012 * k
        half = 0.5 * dyaw
        dq = np.array([np.cos(half), 0, 0, np.sin(half)], np.float32)
        q_n = np.asarray(lie_mod.quat_mul(jnp.asarray(qs[k]),
                                          jnp.asarray(dq)))
        t_n = ts[k] + np.asarray(lie_mod.quat_rotate(
            jnp.asarray(qs[k]),
            jnp.asarray(rng.normal(0, 0.01 * k, 3).astype(np.float32))))
        qd.append(q_n)
        td.append(t_n)
    qd, td = jnp.asarray(np.stack(qd)), jnp.asarray(np.stack(td))

    fixed = jnp.zeros(K, bool).at[0].set(True)
    q_out, t_out = pgo_mod.optimize_essential_graph_4dof(
        qd, td, fixed, edges, iters=25)

    # (a) poses recovered
    for k in range(K):
        dq = np.asarray(lie_mod.quat_mul(
            jnp.asarray(q_out[k]),
            lie_mod.quat_conj(jnp.asarray(qs[k]))))
        ang = 2 * np.arccos(np.clip(abs(dq[0]), -1, 1))
        assert ang < 0.02, (k, ang)
    # (b) roll/pitch INVARIANT: every correction q_out * qd^-1 ... the
    # retraction composes on the right, so check the body-frame delta
    # qd^-1 * q_out is a rotation about the world... verify directly:
    # the z-axis direction of R^T (world up in camera coords)?  Simplest
    # invariant: for each k, the relative rotation in WORLD frame
    # d = R_out^T R_init maps gravity axis to itself.
    g = np.array([0.0, 0.0, 1.0], np.float32)
    for k in range(K):
        R_i = np.asarray(lie_mod.quat_to_matrix(jnp.asarray(qd[k])))
        R_o = np.asarray(lie_mod.quat_to_matrix(jnp.asarray(q_out[k])))
        d = R_o.T @ R_i  # world-frame correction rotation
        np.testing.assert_allclose(d @ g, g, atol=1e-4)
