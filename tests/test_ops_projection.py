"""Oracle tests: projection/undistortion vs cv2.projectPoints et al."""

import cv2
import numpy as np

from caliscope_tpu.ops import projection


K = np.array([[1400.0, 0.0, 960.0], [0.0, 1390.0, 540.0], [0.0, 0.0, 1.0]])
DIST = np.array([-0.21, 0.05, 0.001, -0.0005, 0.01])
DIST_FISH = np.array([0.05, -0.01, 0.002, -0.0005])


def scene_points(rng, n=200):
    X = rng.uniform(-1, 1, size=(n, 3))
    X[:, 2] += 3.0  # in front of camera
    return X


def test_project_brown_matches_cv2(rng):
    X = scene_points(rng)
    rvec = np.array([0.1, -0.2, 0.05])
    tvec = np.array([0.2, -0.1, 0.3])
    uv_cv = cv2.projectPoints(X, rvec, tvec, K, DIST)[0].reshape(-1, 2)
    uv = np.asarray(projection.project_points(X, rvec, tvec, K, DIST, fisheye=False))
    np.testing.assert_allclose(uv, uv_cv, atol=1e-8)


def test_project_fisheye_matches_cv2(rng):
    X = scene_points(rng)
    rvec = np.array([0.02, -0.1, 0.3])
    tvec = np.array([0.1, 0.2, 0.1])
    uv_cv = cv2.fisheye.projectPoints(X.reshape(-1, 1, 3), rvec, tvec, K, DIST_FISH)[0].reshape(-1, 2)
    uv = np.asarray(projection.project_points(X, rvec, tvec, K, DIST_FISH, fisheye=True))
    np.testing.assert_allclose(uv, uv_cv, atol=1e-6)


def test_undistort_brown_matches_cv2(rng):
    uv = rng.uniform([100, 100], [1800, 1000], size=(300, 2))
    xn_cv = cv2.undistortPoints(uv.reshape(-1, 1, 2).astype(np.float64), K, DIST).reshape(-1, 2)
    xn = np.asarray(projection.undistort_points(uv, K, DIST, fisheye=False, iters=60))
    # cv2.undistortPoints stops after 5 fixed-point iterations; agree with it
    # to its convergence limit, and beat it on exact inversion.
    np.testing.assert_allclose(xn, xn_cv, atol=5e-5)
    redistorted = np.asarray(
        projection.normalized_to_pixels(projection.distort_normalized(xn, DIST, fisheye=False), K)
    )
    assert np.abs(redistorted - uv).max() < 1e-9


def test_undistort_fisheye_matches_cv2(rng):
    uv = rng.uniform([300, 200], [1600, 900], size=(300, 2))
    xn_cv = cv2.fisheye.undistortPoints(uv.reshape(-1, 1, 2).astype(np.float64), K, DIST_FISH).reshape(-1, 2)
    xn = np.asarray(projection.undistort_points(uv, K, DIST_FISH, fisheye=True))
    np.testing.assert_allclose(xn, xn_cv, atol=1e-6)


def test_undistort_pixels_roundtrip(rng):
    """distort(undistort(uv)) == uv in pixel space."""
    uv = rng.uniform([100, 100], [1800, 1000], size=(100, 2))
    xn = np.asarray(projection.undistort_points(uv, K, DIST, fisheye=False))
    xd = np.asarray(projection.distort_normalized(xn, DIST, fisheye=False))
    uv_back = np.asarray(projection.normalized_to_pixels(xd, K))
    np.testing.assert_allclose(uv_back, uv, atol=1e-6)


def test_projection_is_differentiable():
    import jax

    def f(X):
        return projection.project_points(X, np.zeros(3), np.array([0.0, 0.0, 2.0]), K, DIST, fisheye=False).sum()

    g = jax.grad(f)(np.array([[0.1, 0.2, 0.5]]))
    assert np.isfinite(np.asarray(g)).all()
