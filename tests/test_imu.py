"""IMU preintegration vs fine numerical integration + bias jacobians."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.solvers import imu

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

CAL = imu.ImuCalib(sigma_g=jnp.asarray(1.7e-4), sigma_a=jnp.asarray(2e-3),
                   walk_g=jnp.asarray(1.9e-5), walk_a=jnp.asarray(3e-3))


def simulate(n=200, dt=0.005, seed=0):
    """Body rotating at constant rate while accelerating; returns ideal
    body-frame measurements and ground-truth deltas (gravity-free world)."""
    rng = np.random.default_rng(seed)
    w = np.array([0.3, -0.2, 0.5])           # rad/s body rates
    a_w = np.array([0.4, 0.1, -0.3])         # constant world accel
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    gyro, acc = [], []
    R0 = R.copy()
    for k in range(n):
        # body-frame specific force (no gravity in this synthetic world)
        acc.append(R.T @ a_w)
        gyro.append(w)
        # integrate ground truth with midpoint rotation
        R_mid = R @ Rsc.from_rotvec(w * dt / 2).as_matrix()
        p = p + v * dt + 0.5 * (a_w) * dt * dt
        v = v + a_w * dt
        R = R @ Rsc.from_rotvec(w * dt).as_matrix()
    dR_gt = R0.T @ R
    dV_gt = R0.T @ v
    dP_gt = R0.T @ p
    return (np.array(gyro, np.float32), np.array(acc, np.float32),
            np.full(n, dt, np.float32), dR_gt, dV_gt, dP_gt)


def test_preintegration_matches_ground_truth():
    gyro, acc, dts, dR_gt, dV_gt, dP_gt = simulate()
    p = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(acc),
                         jnp.asarray(dts), jnp.ones(len(dts), bool),
                         jnp.zeros(3), jnp.zeros(3), CAL)
    assert abs(float(p.dt) - len(dts) * 0.005) < 1e-6
    np.testing.assert_allclose(np.asarray(p.dR), dR_gt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(p.dV), dV_gt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(p.dP), dP_gt, atol=2e-3)
    # covariance is PSD and grows with time
    ev = np.linalg.eigvalsh(np.asarray(p.cov))
    assert ev.min() > -1e-12


def test_bias_jacobians_first_order():
    gyro, acc, dts, *_ = simulate(seed=1)
    b0g = np.zeros(3, np.float32)
    b0a = np.zeros(3, np.float32)
    p0 = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(acc),
                          jnp.asarray(dts), jnp.ones(len(dts), bool),
                          jnp.asarray(b0g), jnp.asarray(b0a), CAL)
    db = np.array([3e-3, -2e-3, 1e-3], np.float32)
    # re-integrate at biased values = oracle
    p1 = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(acc),
                          jnp.asarray(dts), jnp.ones(len(dts), bool),
                          jnp.asarray(b0g + db), jnp.asarray(b0a + db), CAL)
    # first-order corrected getters from p0
    dR_c = np.asarray(imu.delta_rotation(p0, jnp.asarray(b0g + db)))
    dV_c = np.asarray(imu.delta_velocity(p0, jnp.asarray(b0g + db),
                                         jnp.asarray(b0a + db)))
    dP_c = np.asarray(imu.delta_position(p0, jnp.asarray(b0g + db),
                                         jnp.asarray(b0a + db)))
    np.testing.assert_allclose(dR_c, np.asarray(p1.dR), atol=5e-4)
    np.testing.assert_allclose(dV_c, np.asarray(p1.dV), atol=2e-3)
    np.testing.assert_allclose(dP_c, np.asarray(p1.dP), atol=2e-3)


def test_masked_padding_is_noop():
    gyro, acc, dts, *_ = simulate(n=100, seed=2)
    pad = 28
    g2 = np.concatenate([gyro, np.ones((pad, 3), np.float32)])
    a2 = np.concatenate([acc, np.ones((pad, 3), np.float32)])
    d2 = np.concatenate([dts, np.full(pad, 0.005, np.float32)])
    v2 = np.concatenate([np.ones(100, bool), np.zeros(pad, bool)])
    p_full = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(acc),
                              jnp.asarray(dts), jnp.ones(100, bool),
                              jnp.zeros(3), jnp.zeros(3), CAL)
    p_pad = imu.preintegrate(jnp.asarray(g2), jnp.asarray(a2),
                             jnp.asarray(d2), jnp.asarray(v2),
                             jnp.zeros(3), jnp.zeros(3), CAL)
    np.testing.assert_allclose(np.asarray(p_pad.dR), np.asarray(p_full.dR),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_pad.dP), np.asarray(p_full.dP),
                               atol=1e-6)
    assert abs(float(p_pad.dt) - float(p_full.dt)) < 1e-6


def test_inertial_residual_zero_at_truth():
    """Residual vanishes when states follow the preintegrated motion, and
    grows under perturbation (EdgeInertial semantics)."""
    import jax
    import jax.numpy as jnp

    gyro, acc, dts, dR_gt, dV_gt, dP_gt = simulate(seed=4)
    p = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(acc),
                         jnp.asarray(dts), jnp.ones(len(dts), bool),
                         jnp.zeros(3), jnp.zeros(3), CAL)
    # gravity-free synthetic world -> pass zero gravity
    g0 = jnp.zeros(3)
    R_i = jnp.eye(3)
    v_i = jnp.zeros(3)
    p_i = jnp.zeros(3)
    R_j, v_j, p_j = imu.predict_state(p, R_i, v_i, p_i, jnp.zeros(3),
                                      jnp.zeros(3), gravity=g0)
    r = imu.inertial_residual(p, R_i, v_i, p_i, R_j, v_j, p_j,
                              jnp.zeros(3), jnp.zeros(3), gravity=g0)
    assert float(jnp.abs(r).max()) < 1e-4

    # perturb the terminal state -> residual reflects it
    r2 = imu.inertial_residual(p, R_i, v_i, p_i, R_j, v_j + 0.1,
                               p_j, jnp.zeros(3), jnp.zeros(3), gravity=g0)
    assert float(jnp.abs(r2).max()) > 0.05

    # differentiable (for inertial BA)
    grad = jax.grad(lambda vj: jnp.sum(imu.inertial_residual(
        p, R_i, v_i, p_i, R_j, vj, p_j, jnp.zeros(3), jnp.zeros(3),
        gravity=g0) ** 2))(v_j)
    assert bool(jnp.all(jnp.isfinite(grad)))
