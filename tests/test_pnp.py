"""PnP RANSAC tests."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.geometry import cameras, lie
from mam3slam_tpu.solvers import pnp

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

CAM = cameras.make_pinhole(300.0, 300.0, 320.0, 240.0)
RNG = np.random.default_rng(23)


def test_ransac_pnp_with_outliers():
    n = 120
    pts = np.stack([RNG.uniform(-3, 3, n), RNG.uniform(-2, 2, n),
                    RNG.uniform(3, 10, n)], axis=1).astype(np.float32)
    R = Rsc.from_euler("xyz", [8, -5, 12], degrees=True).as_matrix()
    t = np.array([0.3, -0.2, 0.5])
    pc = pts @ R.T + t
    uv = (pc[:, :2] / pc[:, 2:3] * 300.0 + [320.0, 240.0]).astype(np.float32)
    uv += RNG.normal(0, 0.4, uv.shape)
    out = RNG.choice(n, 25, replace=False)
    uv[out] += RNG.uniform(20, 60, (25, 2))

    res = pnp.ransac_pnp(jnp.asarray(pts), jnp.asarray(uv),
                         jnp.ones(n, bool), CAM, jax.random.PRNGKey(0),
                         jnp.ones(n))
    assert bool(res.ok)
    Rg = np.asarray(lie.quat_to_matrix(res.q))
    rot_err = np.rad2deg(np.linalg.norm(Rsc.from_matrix(Rg @ R.T).as_rotvec()))
    assert rot_err < 1.0, rot_err
    assert np.linalg.norm(np.asarray(res.t) - t) < 0.05
    inl = np.asarray(res.inliers)
    assert inl[out].mean() < 0.1
    assert np.delete(inl, out).mean() > 0.85


def test_pnp_rejects_garbage():
    n = 60
    pts = RNG.uniform(-3, 3, (n, 3)).astype(np.float32)
    uv = RNG.uniform(0, 640, (n, 2)).astype(np.float32)
    res = pnp.ransac_pnp(jnp.asarray(pts), jnp.asarray(uv),
                         jnp.ones(n, bool), CAM, jax.random.PRNGKey(1),
                         jnp.ones(n))
    assert not bool(res.ok)


def test_ml_refine_beats_dlt_under_noise():
    """The MLPnP bearing-covariance GN (reference src/MLPnPsolver.cpp
    mlpnp_gn + Kll propagation) must tighten the DLT hypothesis under
    realistic pixel noise: rotation/translation errors drop vs the raw
    DLT estimate."""
    n = 80
    rng = np.random.default_rng(5)
    pts = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                    rng.uniform(3, 10, n)], axis=1).astype(np.float32)
    R = Rsc.from_euler("xyz", [10, -7, 4], degrees=True).as_matrix()
    t = np.array([0.2, 0.1, -0.3])
    pc = pts @ R.T + t
    uv = (pc[:, :2] / pc[:, 2:3] * 300.0 + [320.0, 240.0]).astype(
        np.float32)
    uv += rng.normal(0, 1.2, uv.shape)  # strong pixel noise

    # raw DLT on ALL points (one sample)
    rays = cameras.unproject(CAM, jnp.asarray(uv))[:, :2]
    Rd, td = pnp._dlt_pnp(jnp.asarray(pts)[None], rays[None])
    q_d = lie.quat_from_matrix(Rd[0])
    err_rot_dlt = np.rad2deg(np.linalg.norm(Rsc.from_matrix(
        np.asarray(lie.quat_to_matrix(q_d)) @ R.T).as_rotvec()))
    err_t_dlt = np.linalg.norm(np.asarray(td[0]) - t)

    q_m, t_m = pnp.ml_refine(jnp.asarray(pts), jnp.asarray(uv),
                             jnp.ones(n, bool), CAM, q_d, td[0],
                             jnp.full(n, 1.2 ** 2))
    err_rot_ml = np.rad2deg(np.linalg.norm(Rsc.from_matrix(
        np.asarray(lie.quat_to_matrix(q_m)) @ R.T).as_rotvec()))
    err_t_ml = np.linalg.norm(np.asarray(t_m) - t)
    assert err_rot_ml < err_rot_dlt * 0.8, (err_rot_ml, err_rot_dlt)
    assert err_t_ml < err_t_dlt * 0.8, (err_t_ml, err_t_dlt)
    assert err_rot_ml < 0.5 and err_t_ml < 0.03, (err_rot_ml, err_t_ml)
