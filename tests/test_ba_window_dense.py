"""Dense reduced-camera window BA (ba_window.run_window_ba_dense) vs the
implicit-Schur CG solver: same problem, same convergence.

The dense path is the single-chip hot path (local / welding / global BA);
the CG path remains the distributed formulation's local reference
(parallel/dist_window_ba.py).  Reference semantics both ways:
Optimizer::LocalBundleAdjustment, /root/reference/src/Optimizer.cc:1116.
"""

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras, lie
from mam3slam_tpu.parallel import dist_window_ba as dwb
from mam3slam_tpu.solvers import ba_window as bw


def _toy_problem(seed=0, K=8, Pn=256, noise=0.02, n_fixed=2):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-2, 2, Pn), rng.uniform(-1.5, 1.5, Pn),
                    rng.uniform(4, 9, Pn)], 1).astype(np.float32)
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    cam = cameras.make_pinhole(fx, fy, cx, cy)
    qs, ts, uv, oc, op = [], [], [], [], []
    for k in range(K):
        ang = 0.05 * k
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
        C = np.array([0.4 * k, 0.0, 0.0], np.float32)
        t = -R @ C
        qs.append(np.asarray(lie.quat_from_matrix(jnp.asarray(R))))
        ts.append(t)
        pc = pts @ R.T + t
        u = fx * pc[:, 0] / pc[:, 2] + cx
        v = fy * pc[:, 1] / pc[:, 2] + cy
        vis = (pc[:, 2] > 0.1) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
        for p in np.flatnonzero(vis):
            oc.append(k)
            op.append(p)
            uv.append([u[p] + rng.normal(0, 0.3), v[p] + rng.normal(0, 0.3)])
    oc = np.asarray(oc, np.int32)
    op = np.asarray(op, np.int32)
    uv = np.asarray(uv, np.float32)
    q0 = np.stack(qs)
    t0 = np.stack(ts)
    # perturb the free cameras + all points
    cam_free = np.arange(K) >= n_fixed
    qn = q0 + rng.normal(0, noise, q0.shape).astype(np.float32) * \
        cam_free[:, None]
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    tn = t0 + rng.normal(0, noise, t0.shape).astype(np.float32) * \
        cam_free[:, None]
    ptsn = pts + rng.normal(0, noise, pts.shape).astype(np.float32)
    prob = dwb.window_problem_from_edges(
        qn, tn, np.tile(np.asarray(cam.params), (K, 1)), ptsn, oc, op, uv,
        np.ones(len(oc), np.float32), cam_free,
        np.ones(Pn, bool), max_obs=K)
    return prob, q0, t0, pts


def _rms(prob, res, kind=cameras.PINHOLE):
    _, inl = bw.window_cost_and_inliers(prob, kind, res.cam_q, res.cam_t,
                                        res.pts)
    r, _, _, dok = bw.pm_linearize_all(prob, kind, res.cam_q, res.cam_t,
                                       res.pts)
    e2 = jnp.sum(r * r, -1)
    act = prob.pm_valid & dok
    return float(jnp.sqrt(jnp.sum(jnp.where(act, e2, 0.0))
                          / jnp.maximum(jnp.sum(act), 1)))


def test_dense_matches_cg():
    prob, q_gt, t_gt, pts_gt = _toy_problem()
    cg = bw.run_window_ba(prob, cameras.PINHOLE, iters=10, cg_iters=40)
    de = bw.run_window_ba_dense(prob, cameras.PINHOLE, iters=10)
    rms_cg = _rms(prob, cg)
    rms_de = _rms(prob, de)
    # both converge to the measurement-noise floor
    assert rms_de < 0.6, rms_de
    assert rms_de <= rms_cg * 1.25 + 0.05
    # fixed cameras bit-exactly untouched
    np.testing.assert_array_equal(np.asarray(de.cam_q[:2]),
                                  np.asarray(prob.cam_q[:2]))
    # poses close to ground truth (gauge held by the 2 fixed cams)
    err_t = np.linalg.norm(np.asarray(de.cam_t[2:]) - t_gt[2:], axis=1)
    assert err_t.max() < 0.02, err_t


def test_dense_edge_mask_and_robust():
    prob, *_ = _toy_problem(seed=3)
    # corrupt 10% of the observations
    rng = np.random.default_rng(1)
    pm_uv = np.asarray(prob.pm_uv).copy()
    bad = rng.random(pm_uv.shape[:2]) < 0.10
    pm_uv[bad] += 80.0
    prob = prob._replace(pm_uv=jnp.asarray(pm_uv))
    res = bw.run_window_ba_dense(prob, cameras.PINHOLE, iters=10)
    # robust kernel keeps the solution near the noise floor; the corrupted
    # edges are classified outliers
    inl = np.asarray(res.pm_inlier)
    valid = np.asarray(prob.pm_valid)
    assert inl[valid & ~bad].mean() > 0.97
    assert inl[valid & bad].mean() < 0.05
    res2 = bw.run_window_ba_dense(prob, cameras.PINHOLE, iters=4,
                                  pm_edge_mask=jnp.asarray(~bad),
                                  robust=True)
    assert _rms(prob._replace(pm_valid=prob.pm_valid
                              & jnp.asarray(~bad)), res2) < 0.5
