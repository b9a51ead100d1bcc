"""Intrinsic calibration tests: ground-truth recovery + cv2 oracle parity
(reference tests/synthetic/test_intrinsic_recovery.py; the cv2 oracle is the
independent-path trick of tests/oracle_ffmpeg.py applied to calibration)."""

import numpy as np
import pytest

from caliscope_tpu.cameras import CameraData
from caliscope_tpu.observations import ImagePoints
from caliscope_tpu.pipelines.calibrate_intrinsics import run_intrinsic_calibration
from caliscope_tpu.solvers.intrinsics import solve_intrinsics


def _single_cam_dataset(
    K_true,
    dist_true,
    n_frames=25,
    rows=5,
    cols=7,
    spacing=0.054,
    noise_px=0.3,
    seed=11,
    fisheye=False,
    size=(1280, 720),
):
    """Board waved through varied poses in front of one camera at the origin."""
    import jax.numpy as jnp

    from caliscope_tpu.ops.lie import so3_exp, so3_log
    from caliscope_tpu.ops.projection import project_points

    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(cols), np.arange(rows))
    board = np.zeros((rows * cols, 3))
    board[:, 0] = xs.ravel() * spacing
    board[:, 1] = ys.ravel() * spacing
    board -= board.mean(axis=0)

    frames_obj, frames_img, syncs = [], [], []
    w, h = size
    for f in range(n_frames):
        # varied tilt (up to ~50 deg), position across the frame, depth 0.4-1.2m
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0.1, 0.9)
        R = np.asarray(so3_exp(axis * ang))
        t = np.array(
            [rng.uniform(-0.25, 0.25), rng.uniform(-0.15, 0.15), rng.uniform(0.4, 1.2)]
        )
        rvec = np.asarray(so3_log(R))
        uv = np.asarray(
            project_points(jnp.asarray(board), jnp.asarray(rvec), jnp.asarray(t), jnp.asarray(K_true), jnp.asarray(dist_true), fisheye)
        )
        uv = uv + rng.normal(scale=noise_px, size=uv.shape)
        vis = (uv[:, 0] > 5) & (uv[:, 0] < w - 5) & (uv[:, 1] > 5) & (uv[:, 1] < h - 5)
        if vis.sum() < 6:
            continue
        frames_obj.append(board[vis])
        frames_img.append(uv[vis])
        syncs.append(f)
    return frames_obj, frames_img, syncs


def _pack(frames_obj, frames_img):
    F = len(frames_obj)
    kmax = max(len(o) for o in frames_obj)
    obj = np.zeros((F, kmax, 3))
    img = np.zeros((F, kmax, 2))
    mask = np.zeros((F, kmax), bool)
    for i, (o, u) in enumerate(zip(frames_obj, frames_img)):
        obj[i, : len(o)] = o
        img[i, : len(o)] = u
        mask[i, : len(o)] = True
    return obj, img, mask


K_TRUE = np.array([[870.0, 0, 648.0], [0, 865.0, 352.0], [0, 0, 1.0]])
DIST_TRUE = np.array([-0.21, 0.05, 0.001, -0.0008, 0.01])


class TestBrownModel:
    def test_recovers_ground_truth(self):
        fo, fi, _ = _single_cam_dataset(K_TRUE, DIST_TRUE)
        obj, img, mask = _pack(fo, fi)
        res = solve_intrinsics(obj, img, mask, (1280, 720))
        assert res.rmse < 0.5
        assert abs(res.K[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0] < 0.01
        assert abs(res.K[1, 1] - K_TRUE[1, 1]) / K_TRUE[1, 1] < 0.01
        assert abs(res.K[0, 2] - K_TRUE[0, 2]) < 8
        assert abs(res.K[1, 2] - K_TRUE[1, 2]) < 8
        assert abs(res.dist[0] - DIST_TRUE[0]) < 0.02
        assert abs(res.dist[1] - DIST_TRUE[1]) < 0.08

    def test_matches_cv2_oracle(self):
        cv2 = pytest.importorskip("cv2")
        fo, fi, _ = _single_cam_dataset(K_TRUE, DIST_TRUE, n_frames=20)
        obj, img, mask = _pack(fo, fi)
        res = solve_intrinsics(obj, img, mask, (1280, 720))
        obj_cv = [o.astype(np.float32) for o in fo]
        img_cv = [u.astype(np.float32).reshape(-1, 1, 2) for u in fi]
        rms, K_cv, d_cv, _, _ = cv2.calibrateCamera(obj_cv, img_cv, (1280, 720), None, None)
        # Same data, independent engines: answers agree closely
        assert res.rmse == pytest.approx(rms, rel=0.05)
        assert res.K[0, 0] == pytest.approx(K_cv[0, 0], rel=0.005)
        assert res.K[1, 1] == pytest.approx(K_cv[1, 1], rel=0.005)
        assert res.K[0, 2] == pytest.approx(K_cv[0, 2], abs=3.0)
        assert res.K[1, 2] == pytest.approx(K_cv[1, 2], abs=3.0)
        np.testing.assert_allclose(res.dist[:2], np.ravel(d_cv)[:2], atol=0.01)


class TestRobustLoss:
    def test_soft_l1_resists_gross_outliers(self):
        """2% of corners snapped to spurious X-responses (5-20 px off): the
        soft_l1 production default must hold focal accuracy where the
        quadratic loss degrades (the real-extraction failure mode that
        motivated it)."""
        fo, fi, _ = _single_cam_dataset(K_TRUE, DIST_TRUE, n_frames=30, seed=5)
        rng = np.random.default_rng(99)
        fi = [u.copy() for u in fi]
        for u in fi:
            hit = rng.random(len(u)) < 0.02
            u[hit] += rng.uniform(5, 20, size=(hit.sum(), 2)) * rng.choice([-1, 1], size=(hit.sum(), 2))
        obj, img, mask = _pack(fo, fi)
        plain = solve_intrinsics(obj, img, mask, (1280, 720))
        robust = solve_intrinsics(obj, img, mask, (1280, 720), f_scale_px=1.0)
        err_plain = abs(plain.K[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0]
        err_robust = abs(robust.K[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0]
        assert err_robust < 0.01, err_robust
        assert err_robust <= err_plain + 1e-12

    def test_robust_noop_on_clean_data(self):
        """On outlier-free data the robust solve matches the plain one."""
        fo, fi, _ = _single_cam_dataset(K_TRUE, DIST_TRUE, n_frames=20)
        obj, img, mask = _pack(fo, fi)
        plain = solve_intrinsics(obj, img, mask, (1280, 720))
        robust = solve_intrinsics(obj, img, mask, (1280, 720), f_scale_px=1.0)
        assert robust.K[0, 0] == pytest.approx(plain.K[0, 0], rel=0.005)
        assert robust.K[1, 1] == pytest.approx(plain.K[1, 1], rel=0.005)


class TestFisheyeModel:
    def test_recovers_ground_truth(self):
        K = np.array([[620.0, 0, 640.0], [0, 618.0, 360.0], [0, 0, 1.0]])
        d = np.array([0.08, -0.02, 0.005, -0.001])
        fo, fi, _ = _single_cam_dataset(K, d, fisheye=True, n_frames=25)
        obj, img, mask = _pack(fo, fi)
        res = solve_intrinsics(obj, img, mask, (1280, 720), fisheye=True)
        assert res.rmse < 0.5
        assert abs(res.K[0, 0] - K[0, 0]) / K[0, 0] < 0.01
        assert abs(res.dist[0] - d[0]) < 0.03


class TestUseCase:
    def test_run_intrinsic_calibration(self):
        fo, fi, syncs = _single_cam_dataset(K_TRUE, DIST_TRUE, n_frames=40)
        rows = []
        sync_col, kp_col, img_col, obj_col = [], [], [], []
        for si, (o, u) in zip(syncs, zip(fo, fi)):
            for k in range(len(o)):
                sync_col.append(si)
                kp_col.append(k)
                img_col.append(u[k])
                obj_col.append(o[k])
        n = len(sync_col)
        ip = ImagePoints(
            np.array(sync_col), np.zeros(n), np.zeros(n), np.array(kp_col),
            np.array(img_col), np.array(obj_col),
        )
        cam = CameraData(cam_id=0, size=(1280, 720))
        out = run_intrinsic_calibration(ip, cam, target_frames=30)
        assert out.camera.has_intrinsics
        assert out.report.rmse < 0.5
        assert out.report.frames_used <= 30
        assert out.report.coverage_fraction > 0.3
        assert abs(out.camera.matrix[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0] < 0.02
