"""Unit tests for mam3slam_tpu.geometry.lie vs scipy/numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.geometry import lie

def _rng(seed):
    """Per-test generator: a shared module RNG makes draws depend on
    test execution ORDER, which pytest-xdist's load distribution does
    not preserve (a reordered draw once pushed a rotation past the pi
    log-branch and failed the roundtrip tolerance)."""
    return np.random.default_rng(seed)


def rand_quat(n):
    q = Rsc.random(n, random_state=42).as_quat()  # x,y,z,w scipy order
    return np.concatenate([q[:, 3:4], q[:, :3]], axis=1).astype(np.float32)


def test_quat_mul_rotate_matches_scipy():
    qa, qb = rand_quat(64), rand_quat(64)
    v = _rng(1).normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(lie.quat_rotate(jnp.asarray(qa), jnp.asarray(v)))
    ra = Rsc.from_quat(np.concatenate([qa[:, 1:], qa[:, :1]], axis=1))
    np.testing.assert_allclose(got, ra.apply(v), rtol=1e-4, atol=1e-4)

    qc = np.asarray(lie.quat_mul(jnp.asarray(qa), jnp.asarray(qb)))
    rb = Rsc.from_quat(np.concatenate([qb[:, 1:], qb[:, :1]], axis=1))
    rc = ra * rb
    got_m = np.asarray(lie.quat_to_matrix(jnp.asarray(qc)))
    np.testing.assert_allclose(got_m, rc.as_matrix(), rtol=1e-4, atol=1e-4)


def test_quat_matrix_roundtrip():
    q = rand_quat(128)
    m = lie.quat_to_matrix(jnp.asarray(q))
    q2 = np.asarray(lie.quat_from_matrix(m))
    # q and -q are the same rotation; quat_from_matrix canonicalizes w>=0
    qc = q * np.where(q[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q2, qc, atol=2e-5)


def test_so3_exp_log_roundtrip():
    phi = _rng(2).normal(size=(100, 3)).astype(np.float32)
    # keep |phi| < pi so log returns the same (principal) tangent
    n = np.linalg.norm(phi, axis=1, keepdims=True)
    phi = phi / np.maximum(n, 1.0) * np.minimum(n, 3.0)
    phi[0] = 0.0
    phi[1] = [1e-6, 0, 0]
    phi[2] = [3.1, 0.1, 0.0]  # near pi
    R = lie.so3_exp(jnp.asarray(phi))
    oracle = Rsc.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(np.asarray(R), oracle, atol=1e-5)
    phi2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(phi2, phi, atol=1e-4)


def test_so3_log_beyond_pi_gives_same_rotation():
    phi = np.array([[3.9, -1.0, 0.7]], np.float32)  # |phi| > pi
    R = lie.so3_exp(jnp.asarray(phi))
    phi2 = lie.so3_log(R)
    R2 = lie.so3_exp(phi2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_so3_exp_quat_consistent():
    phi = _rng(3).normal(size=(50, 3)).astype(np.float32)
    q = lie.so3_exp_quat(jnp.asarray(phi))
    np.testing.assert_allclose(
        np.asarray(lie.quat_to_matrix(q)),
        np.asarray(lie.so3_exp(jnp.asarray(phi))),
        atol=1e-5,
    )


def test_left_jacobian_inverse():
    # own generator (module RNG order is not stable under pytest-xdist) and
    # rotation magnitudes bounded away from the genuine 2*pi singularity
    rng = np.random.default_rng(7)
    phi = rng.normal(size=(50, 3)).astype(np.float32) * 2.0
    nrm = np.linalg.norm(phi, axis=1, keepdims=True)
    phi = np.where(nrm > 5.5, phi * (5.5 / nrm), phi).astype(np.float32)
    phi[0] = 0
    J = np.asarray(lie.so3_left_jacobian(jnp.asarray(phi)))
    Jinv = np.asarray(lie.so3_left_jacobian_inv(jnp.asarray(phi)))
    prod = J @ Jinv
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=1e-4)


def test_se3_exp_log_roundtrip_and_compose():
    tau = (_rng(4).normal(size=(64, 6)) * 0.6).astype(np.float32)
    tau[0] = 0
    T = lie.se3_exp(jnp.asarray(tau))
    tau2 = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(tau2, tau, atol=1e-4)

    # compose vs 4x4 matmul
    a = lie.se3_exp(jnp.asarray(tau[:32]))
    b = lie.se3_exp(jnp.asarray(tau[32:]))
    got = np.asarray(lie.se3_matrix(lie.se3_compose(a, b)))
    want = np.asarray(lie.se3_matrix(a)) @ np.asarray(lie.se3_matrix(b))
    np.testing.assert_allclose(got, want, atol=1e-4)

    # inverse
    ainv = lie.se3_inverse(a)
    ident = np.asarray(lie.se3_matrix(lie.se3_compose(a, ainv)))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4), ident.shape),
                               atol=1e-5)


def test_se3_apply_matches_matrix():
    tau = (_rng(5).normal(size=(16, 6))).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(tau))
    pts = _rng(6).normal(size=(16, 3)).astype(np.float32)
    got = np.asarray(lie.se3_apply(T, jnp.asarray(pts)))
    M = np.asarray(lie.se3_matrix(T))
    want = np.einsum("nij,nj->ni", M[:, :3, :3], pts) + M[:, :3, 3]
    np.testing.assert_allclose(got, want, atol=1e-5)


def _W_quadrature(phi, sigma, n=4000):
    """Oracle: W = int_0^1 e^{sigma u} exp(u phi^) du by trapezoid rule."""
    us = np.linspace(0.0, 1.0, n)
    mats = Rsc.from_rotvec(us[:, None] * phi[None, :]).as_matrix()
    w = np.ones(n)
    w[0] = w[-1] = 0.5
    acc = np.einsum("n,nij->ij", w * np.exp(sigma * us), mats)
    return acc / (n - 1)


@pytest.mark.parametrize(
    "phi,sigma",
    [
        ([0.0, 0.0, 0.0], 0.0),
        ([0.3, -0.2, 0.9], 0.0),
        ([0.0, 0.0, 0.0], 0.7),
        ([1e-6, 0.0, 0.0], -0.5),
        ([0.5, 0.5, -0.5], 0.4),
        ([2.0, -1.0, 0.5], -1.2),
    ],
)
def test_sim3_W_matches_quadrature(phi, sigma):
    phi = np.asarray(phi, np.float64)
    W = np.asarray(lie._sim3_W(jnp.asarray(phi, jnp.float32),
                               jnp.asarray(sigma, jnp.float32)))
    oracle = _W_quadrature(phi, sigma)
    np.testing.assert_allclose(W, oracle, atol=5e-4)


def test_sim3_exp_log_roundtrip():
    tau = (_rng(7).normal(size=(64, 7)) * 0.6).astype(np.float32)
    tau[0] = 0
    S = lie.sim3_exp(jnp.asarray(tau))
    tau2 = np.asarray(lie.sim3_log(S))
    np.testing.assert_allclose(tau2, tau, atol=2e-4)


def test_sim3_compose_inverse_apply():
    tau = (_rng(8).normal(size=(32, 7)) * 0.5).astype(np.float32)
    a = lie.sim3_exp(jnp.asarray(tau[:16]))
    b = lie.sim3_exp(jnp.asarray(tau[16:]))
    got = np.asarray(lie.sim3_matrix(lie.sim3_compose(a, b)))
    want = np.asarray(lie.sim3_matrix(a)) @ np.asarray(lie.sim3_matrix(b))
    np.testing.assert_allclose(got, want, atol=1e-4)

    ident = np.asarray(lie.sim3_matrix(lie.sim3_compose(a, lie.sim3_inverse(a))))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4), ident.shape),
                               atol=1e-4)

    pts = _rng(6).normal(size=(16, 3)).astype(np.float32)
    got_p = np.asarray(lie.sim3_apply(a, jnp.asarray(pts)))
    M = np.asarray(lie.sim3_matrix(a))
    want_p = np.einsum("nij,nj->ni", M[:, :3, :3], pts) + M[:, :3, 3]
    np.testing.assert_allclose(got_p, want_p, atol=1e-4)


def test_jit_and_grad_safe():
    tau = jnp.asarray(_rng(9).normal(size=(8, 6)).astype(np.float32))

    @jax.jit
    def f(tau):
        T = lie.se3_exp(tau)
        return jnp.sum(lie.se3_apply(T, jnp.ones((8, 3))) ** 2)

    g = jax.grad(f)(tau)
    assert np.all(np.isfinite(np.asarray(g)))

    # gradient at exactly zero tangent must be finite (Taylor guards)
    g0 = jax.grad(f)(jnp.zeros((8, 6)))
    assert np.all(np.isfinite(np.asarray(g0)))
