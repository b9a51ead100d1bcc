"""Oracle tests: SO(3)/SE(3) ops vs cv2.Rodrigues / scipy.spatial.transform.

cv2/scipy are used here ONLY as independent test oracles — the framework's
compute path is pure JAX.
"""

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from caliscope_tpu.ops import lie


def random_rvecs(rng, n=50, max_angle=np.pi - 0.05):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=n)
    rvecs = axes * angles[:, None]
    rvecs[0] = 0.0  # include identity
    rvecs[1] = [1e-9, 0, 0]  # near-identity
    return rvecs


def test_so3_exp_matches_cv2(rng):
    rvecs = random_rvecs(rng)
    R_cv = np.stack([cv2.Rodrigues(r)[0] for r in rvecs])
    R_ours = np.asarray(lie.so3_exp(rvecs))
    np.testing.assert_allclose(R_ours, R_cv, atol=1e-10)


def test_so3_log_roundtrip(rng):
    rvecs = random_rvecs(rng)
    R = np.asarray(lie.so3_exp(rvecs))
    back = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(back, rvecs, atol=1e-7)


def test_so3_log_near_pi(rng):
    # Classic failure zone for trace-based formulas
    axis = np.array([1.0, 0.0, 0.0])
    for angle in [np.pi - 1e-6, np.pi - 1e-3]:
        rvec = axis * angle
        R = cv2.Rodrigues(rvec)[0]
        back = np.asarray(lie.so3_log(R))
        R_back = cv2.Rodrigues(back)[0]
        np.testing.assert_allclose(R_back, R, atol=1e-6)


def test_quat_matrix_roundtrip(rng):
    rvecs = random_rvecs(rng)
    R = np.asarray(lie.so3_exp(rvecs))
    q = np.asarray(lie.quat_from_matrix(R))
    # Compare against scipy (scipy uses [x,y,z,w])
    q_sp = Rotation.from_matrix(R).as_quat()
    q_sp = np.column_stack([q_sp[:, 3], q_sp[:, :3]])
    sign = np.sign(np.sum(q * q_sp, axis=1, keepdims=True))
    np.testing.assert_allclose(q, q_sp * sign, atol=1e-8)
    R_back = np.asarray(lie.matrix_from_quat(q))
    np.testing.assert_allclose(R_back, R, atol=1e-9)


def test_quaternion_average(rng):
    # Average of rotations clustered around a mean should recover the mean
    base = Rotation.from_rotvec([0.3, -0.2, 0.5])
    perturbed = []
    for _ in range(100):
        delta = Rotation.from_rotvec(rng.normal(scale=0.05, size=3))
        perturbed.append((base * delta).as_matrix())
    quats = np.asarray(lie.quat_from_matrix(np.asarray(perturbed)))
    q_avg = np.asarray(lie.quaternion_average(quats))
    R_avg = np.asarray(lie.matrix_from_quat(q_avg))
    angle_err = np.rad2deg(np.asarray(lie.rotation_geodesic_angle(R_avg, base.as_matrix())))
    assert angle_err < 1.5


def test_se3_compose_inverse(rng):
    R1 = cv2.Rodrigues(rng.normal(size=3))[0]
    t1 = rng.normal(size=3)
    R2 = cv2.Rodrigues(rng.normal(size=3))[0]
    t2 = rng.normal(size=3)
    Rc, tc = lie.se3_compose(R1, t1, R2, t2)
    M = np.asarray(lie.se3_matrix(R1, t1)) @ np.asarray(lie.se3_matrix(R2, t2))
    np.testing.assert_allclose(np.asarray(lie.se3_matrix(Rc, tc)), M, atol=1e-12)
    Ri, ti = lie.se3_inverse(R1, t1)
    np.testing.assert_allclose(
        np.asarray(lie.se3_matrix(*lie.se3_compose(np.asarray(Ri), np.asarray(ti), R1, t1))), np.eye(4), atol=1e-12
    )


def test_geodesic_angle(rng):
    R1 = cv2.Rodrigues(np.array([0.0, 0.0, 0.0]))[0]
    R2 = cv2.Rodrigues(np.array([0.0, 0.3, 0.0]))[0]
    ang = float(lie.rotation_geodesic_angle(R1, R2))
    assert ang == pytest.approx(0.3, abs=1e-9)
