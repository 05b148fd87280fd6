"""Two-view reconstruction tests on synthetic scenes with known motion."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.solvers import twoview

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

K = np.array([[458.0, 0, 376.0], [0, 458.0, 240.0], [0, 0, 1.0]], np.float32)
RNG = np.random.default_rng(3)


def synth_pair(n=300, planar=False, rot_deg=5.0, baseline=0.3,
               noise=0.5, n_outliers=30, seed=0):
    rng = np.random.default_rng(seed)
    if planar:
        pts = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                        np.full(n, 5.0)], axis=1)
    else:
        pts = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                        rng.uniform(3, 10, n)], axis=1)
    R = Rsc.from_euler("xyz", [rot_deg, -rot_deg / 2, rot_deg / 3],
                       degrees=True).as_matrix()
    t = np.array([baseline, 0.02, 0.01])
    p2 = pts @ R.T + t

    def proj(p):
        uv = p @ K.T
        return uv[:, :2] / uv[:, 2:3]

    uv1 = proj(pts) + rng.normal(0, noise, (n, 2))
    uv2 = proj(p2) + rng.normal(0, noise, (n, 2))
    # inject outliers
    out_idx = rng.choice(n, n_outliers, replace=False)
    uv2[out_idx] += rng.uniform(-80, 80, (n_outliers, 2))
    inlier_mask = np.ones(n, bool)
    inlier_mask[out_idx] = False
    return (uv1.astype(np.float32), uv2.astype(np.float32), pts, R, t,
            inlier_mask)


def _run(uv1, uv2, seed=0):
    return twoview.reconstruct_two_views(
        jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(uv1.shape[0], bool), jnp.asarray(K),
        jax.random.PRNGKey(seed))


def _check_motion(res, R, t, pts, atol_rot=1.0, atol_dir=3.0):
    assert bool(res.ok)
    Rg = np.asarray(res.R21)
    rot_err = np.rad2deg(np.linalg.norm(Rsc.from_matrix(Rg @ R.T).as_rotvec()))
    assert rot_err < atol_rot, rot_err
    tg = np.asarray(res.t21)
    tdir = t / np.linalg.norm(t)
    ang = np.rad2deg(np.arccos(np.clip(abs(tg @ tdir), -1, 1)))
    assert ang < atol_dir, ang
    # structure: triangulated points match ground truth up to global scale
    tri = np.asarray(res.is_triangulated)
    assert tri.sum() > 150
    Xg = np.asarray(res.points3d)[tri]
    Xt = pts[tri]
    scale = np.median(np.linalg.norm(Xg, axis=1) / np.linalg.norm(Xt, axis=1))
    # expected depth noise at z~10m, 0.3m baseline, 0.5px: ~0.36m; median
    # over all depths well under that
    err = np.linalg.norm(Xg / scale - Xt, axis=1)
    assert np.median(err) < 0.25, np.median(err)


def test_general_scene_uses_fundamental():
    uv1, uv2, pts, R, t, _ = synth_pair(planar=False, seed=1)
    res = _run(uv1, uv2)
    assert not bool(res.used_homography)
    _check_motion(res, R, t, pts)


def test_planar_scene_uses_homography():
    uv1, uv2, pts, R, t, _ = synth_pair(planar=True, seed=2)
    res = _run(uv1, uv2)
    assert bool(res.used_homography)
    _check_motion(res, R, t, pts)


def test_pure_rotation_rejected():
    uv1, uv2, pts, R, t, _ = synth_pair(planar=False, baseline=0.0,
                                        noise=0.3, n_outliers=0, seed=3)
    res = _run(uv1, uv2)
    assert not bool(res.ok)  # no parallax -> init must be refused


def test_outlier_mask_excluded():
    uv1, uv2, pts, R, t, inl = synth_pair(planar=False, seed=4)
    res = _run(uv1, uv2)
    tri = np.asarray(res.is_triangulated)
    # outliers must not be triangulated
    assert (tri & ~inl).sum() <= 3


def test_triangulate_dlt_exact():
    pts = np.stack([RNG.uniform(-2, 2, 50), RNG.uniform(-2, 2, 50),
                    RNG.uniform(2, 9, 50)], axis=1).astype(np.float32)
    R = Rsc.from_euler("y", 8, degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.4, 0.0, 0.02], np.float32)
    P1 = np.concatenate([K, np.zeros((3, 1), np.float32)], axis=1)
    P2 = (K @ np.concatenate([R, t[:, None]], axis=1)).astype(np.float32)

    def proj(P, p):
        ph = np.concatenate([p, np.ones((len(p), 1))], axis=1)
        uv = ph @ P.T
        return (uv[:, :2] / uv[:, 2:3]).astype(np.float32)

    X = np.asarray(twoview.triangulate_dlt(
        jnp.broadcast_to(jnp.asarray(P1), (50, 3, 4)),
        jnp.broadcast_to(jnp.asarray(P2), (50, 3, 4)),
        jnp.asarray(proj(P1, pts)), jnp.asarray(proj(P2, pts))))
    np.testing.assert_allclose(X, pts, atol=5e-3)
