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
