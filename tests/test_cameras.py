"""Camera model tests vs OpenCV oracles (cv2.projectPoints / cv2.fisheye)."""

import cv2
import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras

RNG = np.random.default_rng(1)

FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375  # EuRoC-like
DIST = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)
KB = (0.0034823894022493434, 0.0007150348452162257,
      -0.0020532361418706202, 0.00020293673591811182)  # TUM-VI-like


def rand_points(n=200):
    x = RNG.uniform(-2, 2, n)
    y = RNG.uniform(-1.5, 1.5, n)
    z = RNG.uniform(0.5, 8.0, n)
    return np.stack([x, y, z], axis=1).astype(np.float32)


def test_pinhole_project_matches_cv2():
    cam = cameras.make_pinhole(FX, FY, CX, CY, DIST)
    pts = rand_points()
    got = np.asarray(cameras.project(cam, jnp.asarray(pts)))
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
    want, _ = cv2.projectPoints(pts.reshape(-1, 1, 3), np.zeros(3),
                                np.zeros(3), K, np.array(DIST))
    np.testing.assert_allclose(got, want.reshape(-1, 2), atol=1e-2)


def test_pinhole_unproject_roundtrip():
    cam = cameras.make_pinhole(FX, FY, CX, CY, DIST)
    pts = rand_points()
    uv = np.asarray(cameras.project(cam, jnp.asarray(pts)))
    # operational envelope: keypoints lie inside the image
    keep = ((uv[:, 0] > 0) & (uv[:, 0] < 752) & (uv[:, 1] > 0)
            & (uv[:, 1] < 480))
    assert keep.sum() > 50
    rays = np.asarray(cameras.unproject(cam, jnp.asarray(uv[keep])))
    want = pts[keep] / pts[keep, 2:3]
    np.testing.assert_allclose(rays, want, atol=1e-4)


def test_pinhole_undistort_matches_cv2():
    cam = cameras.make_pinhole(FX, FY, CX, CY, DIST)
    uv = np.stack([RNG.uniform(50, 700, 300), RNG.uniform(50, 430, 300)],
                  axis=1).astype(np.float32)
    got = np.asarray(cameras.undistort_points(cam, jnp.asarray(uv)))
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
    # cv2.undistortPoints is itself iterative and ~0.25px off at image
    # corners, so compare loosely against it ...
    want = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, np.array(DIST),
                               P=K).reshape(-1, 2)
    np.testing.assert_allclose(got, want, atol=0.5)
    # ... and tightly against exact self-consistency: redistorting our
    # undistorted rays must reproduce the input pixels.
    rays = cameras.unproject(cam, jnp.asarray(uv))
    back = np.asarray(cameras.project(cam, rays))
    np.testing.assert_allclose(back, uv, atol=1e-3)


def test_kb8_project_matches_cv2_fisheye():
    cam = cameras.make_kb8(190.978, 190.973, 254.931, 256.897, *KB)
    pts = rand_points()
    got = np.asarray(cameras.project(cam, jnp.asarray(pts)))
    K = np.array([[190.978, 0, 254.931], [0, 190.973, 256.897], [0, 0, 1]])
    want, _ = cv2.fisheye.projectPoints(
        pts.reshape(-1, 1, 3).astype(np.float64), np.zeros(3), np.zeros(3),
        K, np.array(KB))
    np.testing.assert_allclose(got, want.reshape(-1, 2), atol=1e-2)


def test_kb8_unproject_roundtrip():
    cam = cameras.make_kb8(190.978, 190.973, 254.931, 256.897, *KB)
    pts = rand_points()
    uv = cameras.project(cam, jnp.asarray(pts))
    rays = np.asarray(cameras.unproject(cam, uv))
    want = pts / pts[:, 2:3]
    np.testing.assert_allclose(rays, want, atol=1e-3)


def test_project_jac_matches_autodiff():
    import jax

    for cam in [cameras.make_pinhole(FX, FY, CX, CY),
                cameras.make_kb8(190.978, 190.973, 254.931, 256.897, *KB)]:
        pts = jnp.asarray(rand_points(50))
        J = np.asarray(cameras.project_jac(cam, pts))
        Jad = np.asarray(jax.vmap(jax.jacfwd(
            lambda p: cameras.project_ideal(cam, p)))(pts))
        np.testing.assert_allclose(J, Jad, rtol=1e-3, atol=1e-3)
