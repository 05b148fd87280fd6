"""Distributed BA on a virtual 8-device mesh: parity with single-device."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mam3slam_tpu.geometry import cameras
from mam3slam_tpu.parallel import dist_ba
from mam3slam_tpu.solvers import ba

from test_ba import make_scene, _build_problem, _reproj_rms, CAM_PARAMS

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


def _mesh(n=8, axis="edge"):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, (axis,))


def test_dist_ba_matches_local():
    q, t, pts, oc, op, ouv = make_scene(n_cams=6, n_pts=250, noise_px=0.5,
                                        seed=7)
    rng = np.random.default_rng(0)
    qp, tp = q.copy(), t.copy()
    tp[2:] += rng.normal(0, 0.05, tp[2:].shape)
    ptsp = (pts + rng.normal(0, 0.08, pts.shape)).astype(np.float32)
    cam_free = np.array([False, False] + [True] * (len(q) - 2))
    prob = _build_problem(qp, tp, ptsp, oc, op, ouv, cam_free,
                          np.ones(len(pts), bool))

    local = ba.run_ba(prob, cameras.PINHOLE, iters=10, cg_iters=30)
    mesh = _mesh()
    dist = dist_ba.dist_run_ba(prob, mesh, cameras.PINHOLE, iters=10,
                               cg_iters=30)

    rms_l, _ = _reproj_rms(local, oc, op, ouv)
    rms_d, _ = _reproj_rms(dist, oc, op, ouv)
    assert rms_d < 0.8, rms_d
    # identical control flow => near-identical result (f32 reduction order)
    np.testing.assert_allclose(np.asarray(dist.cam_t),
                               np.asarray(local.cam_t), atol=5e-3)
    np.testing.assert_allclose(rms_d, rms_l, atol=0.05)


def test_batched_pose_opt_sharded():
    n_agents = 8
    qs, ts, ptss, uvs = [], [], [], []
    M = 0
    scenes = [make_scene(n_cams=1, n_pts=150, noise_px=0.4, seed=100 + i)
              for i in range(n_agents)]
    M = min(min((len(s[4]) for s in scenes)), 256)
    from mam3slam_tpu.geometry import lie
    for q, t, pts, oc, op, ouv in scenes:
        dq = lie.so3_exp_quat(jnp.asarray([0.02, -0.01, 0.02]))
        qs.append(np.asarray(lie.quat_mul(dq, jnp.asarray(q[0]))))
        ts.append(t[0] + np.array([0.05, -0.04, 0.06], np.float32))
        ptss.append(pts[op[:M]])
        uvs.append(ouv[:M])
    mesh = _mesh(axis="agent")
    fn = dist_ba.batched_pose_optimization(mesh, cameras.PINHOLE)
    res = fn(jnp.asarray(np.array(qs)), jnp.asarray(np.array(ts)),
             jnp.broadcast_to(jnp.asarray(CAM_PARAMS), (n_agents, 8)),
             jnp.asarray(np.array(ptss)), jnp.asarray(np.array(uvs)),
             jnp.ones((n_agents, M), np.float32),
             jnp.ones((n_agents, M), bool))
    for i, (q, t, *_rest) in enumerate(scenes):
        t_err = np.linalg.norm(np.asarray(res.t[i]) - t[0])
        assert t_err < 0.02, (i, t_err)
        assert int(res.n_inliers[i]) > 0.9 * M


def test_dist_window_ba_matches_local():
    """Owner-partitioned dense window BA (dist_window_ba) vs the
    single-device dense solver: same problem, near-identical solution."""
    from mam3slam_tpu.parallel import dist_window_ba as dwb
    from mam3slam_tpu.solvers import ba_window as bw

    q, t, pts, oc, op, ouv = make_scene(n_cams=6, n_pts=250, noise_px=0.5,
                                        seed=7)
    rng = np.random.default_rng(0)
    qp, tp = q.copy(), t.copy()
    tp[2:] += rng.normal(0, 0.05, tp[2:].shape)
    ptsp = (pts + rng.normal(0, 0.08, pts.shape)).astype(np.float32)
    cam_free = np.array([False, False] + [True] * (len(q) - 2))
    cam_params = np.broadcast_to(CAM_PARAMS, (len(q), 8))
    w = np.ones(len(oc), np.float32)

    prob = dwb.window_problem_from_edges(
        qp, tp, cam_params, ptsp, oc, op, ouv, w, cam_free,
        np.ones(len(pts), bool))

    local = bw.run_window_ba(prob, cameras.PINHOLE, iters=10, cg_iters=30)
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    dist = dwb.dist_run_window_ba(prob, mesh, cameras.PINHOLE, iters=10,
                                  cg_iters=30)

    P = len(pts)

    def rms(res):
        pt = np.asarray(res.pts)[:P]
        import mam3slam_tpu.geometry.lie as lie
        qq = np.asarray(res.cam_q)[: len(q)]
        tt = np.asarray(res.cam_t)[: len(q)]
        errs = []
        for e in range(len(oc)):
            X = pt[op[e]]
            pc = np.asarray(lie.quat_rotate(
                jnp.asarray(qq[oc[e]])[None], jnp.asarray(X)[None]))[0] \
                + tt[oc[e]]
            fx, fy, cx, cy = CAM_PARAMS[:4]
            uv = np.array([fx * pc[0] / pc[2] + cx,
                           fy * pc[1] / pc[2] + cy])
            errs.append(uv - ouv[e])
        return float(np.sqrt(np.mean(np.sum(np.array(errs) ** 2, 1))))

    rms_l = rms(local)
    rms_d = rms(dist)
    assert rms_l < 0.8, rms_l
    assert rms_d < 0.8, rms_d
    np.testing.assert_allclose(np.asarray(dist.cam_t)[: len(q)],
                               np.asarray(local.cam_t)[: len(q)],
                               atol=5e-3)


def test_dist_window_ba_dense_matches_local():
    """Distributed dense reduced-camera solver (one psum per LM
    iteration) vs the single-device dense solver: same problem,
    near-identical solution (f32 reduction-order differences only)."""
    from mam3slam_tpu.parallel import dist_window_ba as dwb
    from mam3slam_tpu.solvers import ba_window as bw

    q, t, pts, oc, op, ouv = make_scene(n_cams=6, n_pts=252, noise_px=0.5,
                                        seed=7)
    rng = np.random.default_rng(0)
    qp, tp = q.copy(), t.copy()
    tp[2:] += rng.normal(0, 0.05, tp[2:].shape)
    ptsp = (pts + rng.normal(0, 0.08, pts.shape)).astype(np.float32)
    cam_free = np.array([False, False] + [True] * (len(q) - 2))
    cam_params = np.broadcast_to(CAM_PARAMS, (len(q), 8))
    w = np.ones(len(oc), np.float32)

    prob = dwb.window_problem_from_edges(
        qp, tp, cam_params, ptsp, oc, op, ouv, w, cam_free,
        np.ones(len(pts), bool))

    local = bw.run_window_ba_dense(prob, cameras.PINHOLE, iters=10)
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    dist = dwb.dist_run_window_ba_dense(prob, mesh, cameras.PINHOLE,
                                        iters=10)

    np.testing.assert_allclose(np.asarray(dist.cam_t)[: len(q)],
                               np.asarray(local.cam_t)[: len(q)],
                               atol=5e-3)
    P = len(pts)
    np.testing.assert_allclose(np.asarray(dist.pts)[:P],
                               np.asarray(local.pts)[:P], atol=2e-2)
    # inlier classification agrees except at the chi2 boundary
    il = np.asarray(local.pm_inlier)
    idist = np.asarray(dist.pm_inlier)[: il.shape[0]]
    assert (il != idist).mean() < 0.02


def test_dist_window_ba_psum_matches_local():
    """Owner-partitioned psum-CG solver (one [Kc,6] psum per matvec — the
    production distributed global-BA path) vs the single-device CG
    solver: same problem, near-identical solution at 1 and 4 devices."""
    from mam3slam_tpu.parallel import dist_window_ba as dwb
    from mam3slam_tpu.solvers import ba_window as bw

    q, t, pts, oc, op, ouv = make_scene(n_cams=6, n_pts=252, noise_px=0.5,
                                        seed=7)
    rng = np.random.default_rng(0)
    qp, tp = q.copy(), t.copy()
    tp[2:] += rng.normal(0, 0.05, tp[2:].shape)
    ptsp = (pts + rng.normal(0, 0.08, pts.shape)).astype(np.float32)
    cam_free = np.array([False, False] + [True] * (len(q) - 2))
    cam_params = np.broadcast_to(CAM_PARAMS, (len(q), 8))
    w = np.ones(len(oc), np.float32)

    prob = dwb.window_problem_from_edges(
        qp, tp, cam_params, ptsp, oc, op, ouv, w, cam_free,
        np.ones(len(pts), bool))

    local = bw.run_window_ba(prob, cameras.PINHOLE, iters=10, cg_iters=30)
    P = len(pts)
    for n in (1, 4):
        mesh = Mesh(np.array(jax.devices()[:n]), ("shard",))
        dist = dwb.dist_run_window_ba_psum(prob, mesh, cameras.PINHOLE,
                                           iters=10, cg_iters=30)
        np.testing.assert_allclose(np.asarray(dist.cam_t)[: len(q)],
                                   np.asarray(local.cam_t)[: len(q)],
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(dist.pts)[:P],
                                   np.asarray(local.pts)[:P], atol=2e-2)
        # point order is restored through the shard permutation
        il = np.asarray(local.pm_inlier)[:P]
        ip = np.asarray(dist.pm_inlier)[:P]
        assert (il != ip).mean() < 0.02


def test_compact_free_window_problem_matches():
    """compact_free=True (camera block = free cams only) solves to the
    same poses as the identity-compaction layout."""
    from mam3slam_tpu.parallel import dist_window_ba as dwb
    from mam3slam_tpu.solvers import ba_window as bw

    q, t, pts, oc, op, ouv = make_scene(n_cams=6, n_pts=252, noise_px=0.5,
                                        seed=7)
    rng = np.random.default_rng(0)
    qp, tp = q.copy(), t.copy()
    tp[2:] += rng.normal(0, 0.05, tp[2:].shape)
    ptsp = (pts + rng.normal(0, 0.08, pts.shape)).astype(np.float32)
    cam_free = np.array([False, False] + [True] * (len(q) - 2))
    cam_params = np.broadcast_to(CAM_PARAMS, (len(q), 8))
    w = np.ones(len(oc), np.float32)

    full = dwb.window_problem_from_edges(
        qp, tp, cam_params, ptsp, oc, op, ouv, w, cam_free,
        np.ones(len(pts), bool))
    comp = dwb.window_problem_from_edges(
        qp, tp, cam_params, ptsp, oc, op, ouv, w, cam_free,
        np.ones(len(pts), bool), compact_free=True)
    n_free = int(cam_free.sum())
    assert comp.cam_q.shape[0] == n_free
    # compact rows are the free cams, in order
    np.testing.assert_array_equal(np.asarray(comp.cam_idx),
                                  np.flatnonzero(cam_free))

    rf = bw.run_window_ba_dense(full, cameras.PINHOLE, iters=10)
    rc = bw.run_window_ba_dense(comp, cameras.PINHOLE, iters=10)
    free_rows = np.flatnonzero(cam_free)
    np.testing.assert_allclose(np.asarray(rc.cam_t)[:n_free],
                               np.asarray(rf.cam_t)[free_rows], atol=1e-4)
    np.testing.assert_allclose(np.asarray(rc.pts), np.asarray(rf.pts),
                               atol=1e-3)


def test_dist_solve_dispatcher():
    """dist_solve_window_ba routes small windows to the dense solver and
    large free-cam counts to the psum-CG solver; both produce converged
    results."""
    from mam3slam_tpu.parallel import dist_window_ba as dwb

    q, t, pts, oc, op, ouv = make_scene(n_cams=6, n_pts=252, noise_px=0.5,
                                        seed=7)
    rng = np.random.default_rng(0)
    qp, tp = q.copy(), t.copy()
    tp[2:] += rng.normal(0, 0.05, tp[2:].shape)
    ptsp = (pts + rng.normal(0, 0.08, pts.shape)).astype(np.float32)
    cam_free = np.array([False, False] + [True] * (len(q) - 2))
    cam_params = np.broadcast_to(CAM_PARAMS, (len(q), 8))
    w = np.ones(len(oc), np.float32)
    prob = dwb.window_problem_from_edges(
        qp, tp, cam_params, ptsp, oc, op, ouv, w, cam_free,
        np.ones(len(pts), bool))
    mesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    # 4 free cams <= cap -> dense; force the psum branch with cap=0
    r_dense = dwb.dist_solve_window_ba(prob, mesh, cameras.PINHOLE,
                                       iters=10)
    r_psum = dwb.dist_solve_window_ba(prob, mesh, cameras.PINHOLE,
                                      iters=10, dense_free_cap=0)
    np.testing.assert_allclose(np.asarray(r_psum.cam_t)[: len(q)],
                               np.asarray(r_dense.cam_t)[: len(q)],
                               atol=5e-3)


def test_dist_global_ba_epoch_matches_single_chip():
    """Production multi-chip GBA epoch (dist_global_ba on a live
    MapState, ServerConfig.gba_mesh path) vs the single-chip global_ba
    program: same anchor/mask/build/write-back, distributed solve."""
    import jax.numpy as jnp

    from mam3slam_tpu.parallel import dist_window_ba as dwb
    from mam3slam_tpu.slam.system import OK, SlamConfig, SlamSystem
    from test_slam_e2e import (FX, FY, CX, CY, H, N_FEAT, W,
                               SyntheticWorld, make_trajectory)

    world = SyntheticWorld(n_mp=600, seed=3)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=64,
                     max_mp=4096, n_levels=4, min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()
    for i, (R, t) in enumerate(make_trajectory(40)):
        f, _ = world.render(R, t)
        st, _ = sys_.track(aid, f, float(i))
    assert st == OK
    ms0 = sys_.ms
    map_id = sys_.agents[aid].map_id

    local = sys_.fns["global_ba"](ms0, jnp.asarray(map_id))
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    # dense branch (few free cams -> dispatcher picks the dense solver)
    dist = dwb.dist_global_ba(ms0, cfg, mesh, map_id, cameras.PINHOLE)
    kf_sel = np.asarray(ms0.kf_valid)
    np.testing.assert_allclose(np.asarray(dist.kf_t)[kf_sel],
                               np.asarray(local.kf_t)[kf_sel], atol=5e-3)
    # psum-CG branch (forced): same solution within CG tolerance
    dist2 = dwb.dist_global_ba(ms0, cfg, mesh, map_id, cameras.PINHOLE,
                               dense_free_cap=0)
    np.testing.assert_allclose(np.asarray(dist2.kf_t)[kf_sel],
                               np.asarray(local.kf_t)[kf_sel], atol=2e-2)
    mp_sel = np.asarray(ms0.mp_valid)
    np.testing.assert_allclose(np.asarray(dist.mp_pos)[mp_sel],
                               np.asarray(local.mp_pos)[mp_sel],
                               atol=2e-2)
