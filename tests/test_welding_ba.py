"""Merge-welding BA (reference Optimizer::LocalBundleAdjustment merge
overload, src/Optimizer.cc:3505): the absorbed-side welding window is
adjusted while merge-target-side keyframes observing the fused points stay
bit-exactly fixed and provide the gauge.
"""

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras, lie
from mam3slam_tpu.mapstate import state as S
from mam3slam_tpu.slam.system import SlamConfig, _compiled

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

FX, FY, CX, CY = 458.0, 458.0, 376.0, 240.0
W, H = 752, 480


def _pose_for(ang, radius=2.5):
    c, s = np.cos(ang), np.sin(ang)
    # proper rotation (det=+1): camera on a circle of `radius`, optical
    # axis through the origin (a reflection here would make quaternion
    # state and uv synthesis disagree)
    R = np.stack([np.array([s, 0.0, -c]), np.array([0.0, 1.0, 0.0]),
                  np.array([c, 0.0, s])]).astype(np.float32)
    C = np.array([radius * c, 0.0, radius * s], np.float32)
    return R, (-R @ C).astype(np.float32)


def _build_welded_state(seed=0, n_pt=96, pose_noise=0.06):
    """A post-merge arena: 2 target-side KFs (0, 1) at ground truth and 2
    absorbed-side KFs (2, 3) with perturbed poses, all observing the same
    (already fused) points in map 0."""
    rng = np.random.default_rng(seed)
    n_feat = n_pt
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=n_feat, max_kf=8,
                     max_mp=4 * n_pt, n_levels=4, lba_window=8)
    fns = _compiled(cfg, cam.kind)

    th = rng.uniform(-0.4, 0.4, n_pt)
    r = rng.uniform(4.0, 5.0, n_pt)
    pts = np.stack([r * np.cos(th), rng.uniform(-1.0, 1.0, n_pt),
                    r * np.sin(th)], axis=1).astype(np.float32)
    desc = rng.integers(0, 256, (n_pt, 32), dtype=np.uint8)

    ms = S.init_map_state(cfg.map_config())
    Nmp = cfg.map_config().max_mp
    ms = ms._replace(
        mp_pos=ms.mp_pos.at[:n_pt].set(jnp.asarray(pts)),
        mp_valid=ms.mp_valid.at[:n_pt].set(True),
        mp_map=ms.mp_map,
        mp_desc=ms.mp_desc.at[:n_pt].set(jnp.asarray(desc)),
        mp_min_dist=jnp.full(Nmp, 0.1, jnp.float32),
        mp_max_dist=jnp.full(Nmp, 50.0, jnp.float32),
        map_valid=ms.map_valid.at[0].set(True))

    angles = [-0.06, -0.02, 0.02, 0.06]
    truth = []
    for k, ang in enumerate(angles):
        R, t = _pose_for(ang)
        truth.append((R, t))
        pc = pts @ R.T + t
        uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                       FY * pc[:, 1] / pc[:, 2] + CY], 1).astype(np.float32)
        uv += rng.normal(0, 0.2, uv.shape).astype(np.float32)
        q = lie.quat_from_matrix(jnp.asarray(R))
        tj = jnp.asarray(t)
        if k >= 2:  # absorbed side: perturbed initial pose
            dq = lie.so3_exp_quat(jnp.asarray(
                rng.normal(0, pose_noise / 3, 3), jnp.float32))
            q = lie.quat_mul(dq, q)
            tj = tj + jnp.asarray(rng.normal(0, pose_noise, 3), jnp.float32)
        ms, kf = S.add_keyframe(
            ms, q, tj, jnp.asarray(0), jnp.asarray(0),
            jnp.asarray(float(k), jnp.float32), jnp.asarray(k),
            jnp.asarray(uv), jnp.zeros(n_feat, jnp.int32),
            jnp.zeros(n_feat, jnp.float32), jnp.asarray(desc),
            jnp.ones(n_feat, bool),
            jnp.arange(n_pt, dtype=jnp.int32), cam_params=cam.params)
        ms = S.update_covis_for_kf(ms, kf)
    ms = S.rebuild_reverse_obs(ms)
    return ms, cfg, cam, fns, pts, truth


def _reproj_rmse(ms, kfs, cam):
    errs = []
    for k in kfs:
        fmp = np.asarray(ms.kf_feat_mp[k])
        sel = fmp >= 0
        P = np.asarray(ms.mp_pos)[fmp[sel]]
        q = ms.kf_q[k]
        t = ms.kf_t[k]
        pc = np.asarray(lie.quat_rotate(q[None], jnp.asarray(P))) + \
            np.asarray(t)
        uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                       FY * pc[:, 1] / pc[:, 2] + CY], 1)
        errs.append(uv - np.asarray(ms.kf_feat_uv[k])[sel])
    e = np.concatenate(errs)
    return float(np.sqrt(np.mean(np.sum(e ** 2, axis=1))))


def test_welding_ba_fixes_seam_keeps_target_side_fixed():
    ms, cfg, cam, fns, pts, truth = _build_welded_state()
    adjust = np.zeros(cfg.max_kf, bool)
    adjust[2:4] = True  # absorbed side

    q_before = np.asarray(ms.kf_q).copy()
    t_before = np.asarray(ms.kf_t).copy()
    err0 = _reproj_rmse(ms, [2, 3], cam)

    ms2, opt_mask, weld_pts = fns["welding_ba"](ms, jnp.asarray(3),
                                                jnp.asarray(adjust))
    opt_mask = np.asarray(opt_mask)
    assert opt_mask[2] and opt_mask[3]
    # the welded-point mask covers the window's points (spLocalWindowMPs)
    assert np.asarray(weld_pts)[:96].all()
    assert not opt_mask[0] and not opt_mask[1]

    # merge-target side bit-exactly fixed (the reference's vpFixedKF)
    np.testing.assert_array_equal(np.asarray(ms2.kf_q)[:2], q_before[:2])
    np.testing.assert_array_equal(np.asarray(ms2.kf_t)[:2], t_before[:2])

    # absorbed side pulled onto the fused geometry
    err1 = _reproj_rmse(ms2, [2, 3], cam)
    assert err1 < err0 * 0.25, (err0, err1)
    for k in (2, 3):
        R_gt, t_gt = truth[k]
        t_new = np.asarray(ms2.kf_t[k])
        assert np.linalg.norm(t_new - t_gt) < 0.02, (k, t_new, t_gt)


def test_welding_ba_no_adjust_side_noop():
    """With an empty adjust side nothing may move (guards the all-fixed
    degenerate case during a merge where the window is entirely on the
    target side)."""
    ms, cfg, cam, fns, pts, truth = _build_welded_state()
    adjust = np.zeros(cfg.max_kf, bool)
    ms2, opt_mask, _ = fns["welding_ba"](ms, jnp.asarray(3),
                                         jnp.asarray(adjust))
    assert not np.asarray(opt_mask).any()
    np.testing.assert_array_equal(np.asarray(ms2.kf_q), np.asarray(ms.kf_q))
    np.testing.assert_array_equal(np.asarray(ms2.kf_t), np.asarray(ms.kf_t))
