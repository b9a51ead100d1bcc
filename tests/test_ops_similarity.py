"""Umeyama alignment + similarity transform semantics (incl. camera update)."""

import numpy as np

from caliscope_tpu.ops import lie, similarity


def test_umeyama_exact(rng):
    X = rng.normal(size=(40, 3))
    R_true = np.asarray(lie.so3_exp(np.array([0.2, -0.3, 0.5])))
    s_true, t_true = 1.7, np.array([0.5, -1.0, 2.0])
    Y = s_true * (R_true @ X.T).T + t_true
    s, R, t = similarity.umeyama(X, Y)
    assert abs(float(s) - s_true) < 1e-9
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-9)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-9)


def test_umeyama_no_scale(rng):
    X = rng.normal(size=(40, 3))
    R_true = np.asarray(lie.so3_exp(np.array([0.1, 0.2, -0.1])))
    Y = (R_true @ X.T).T + np.array([1.0, 2.0, 3.0])
    s, R, t = similarity.umeyama(X, Y, with_scale=False)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-9)


def test_umeyama_reflection_guard(rng):
    """Degenerate-ish correspondences must still yield det(R) = +1."""
    X = rng.normal(size=(4, 3)) * np.array([1.0, 1.0, 0.01])
    Y = -X + rng.normal(scale=0.01, size=X.shape)
    _, R, _ = similarity.umeyama(X, Y)
    assert float(np.linalg.det(np.asarray(R))) > 0.99


def test_camera_extrinsics_update_consistency(rng):
    """After a world similarity transform, reprojection must be invariant:
    projecting transformed points through transformed cameras gives the same
    normalized coords (scale does not enter rotation — reference
    alignment.py:178-190)."""
    R_cam = np.asarray(lie.so3_exp(np.array([0.1, -0.4, 0.2])))
    t_cam = np.array([0.3, 0.1, 2.0])
    X = rng.uniform(-0.5, 0.5, size=(20, 3))

    s, Rw, tw = 2.5, np.asarray(lie.so3_exp(np.array([-0.2, 0.3, 0.7]))), np.array([1.0, -2.0, 0.5])
    Xp = similarity.apply_similarity_to_points(s, Rw, tw, X)
    R_new, t_new = similarity.apply_similarity_to_extrinsics(s, Rw, tw, R_cam, t_cam)

    xc_before = (R_cam @ X.T).T + t_cam
    xc_after = (np.asarray(R_new) @ np.asarray(Xp).T).T + np.asarray(t_new)
    uv_before = xc_before[:, :2] / xc_before[:, 2:3]
    uv_after = xc_after[:, :2] / xc_after[:, 2:3]
    np.testing.assert_allclose(uv_after, uv_before, atol=1e-9)
    # rotation stayed orthonormal (no scale leakage)
    np.testing.assert_allclose(np.asarray(R_new) @ np.asarray(R_new).T, np.eye(3), atol=1e-12)


def test_similarity_params_inverse():
    R = np.asarray(lie.so3_exp(np.array([0.3, 0.1, -0.2])))
    p = similarity.SimilarityParams(1.5, R, np.array([1.0, 2.0, 3.0]))
    X = np.random.default_rng(0).normal(size=(10, 3))
    np.testing.assert_allclose(p.inverse().apply(p.apply(X)), X, atol=1e-12)
    np.testing.assert_allclose(p.matrix()[:3, :3], 1.5 * R, atol=1e-12)
