"""Pose-decode kernels, model cards/registry, gravity solver, repositories."""

from pathlib import Path

import numpy as np
import pytest

from caliscope_tpu.estimators import estimate_vertical_from_fields, fit_gravity
from caliscope_tpu.pose import ModelCard, decode_heatmap, decode_simcc
from caliscope_tpu.pose.registry import available_trackers, scan_onnx_models, tracker_factory

CARDS_DIR = Path(__file__).parent.parent / "caliscope_tpu" / "pose" / "model_cards"


class TestDecode:
    def test_simcc_recovers_subpixel_peaks(self, rng):
        B, K, W, H = 2, 5, 384, 512
        split = 2.0
        gt_x = rng.uniform(10, W - 10, size=(B, K))
        gt_y = rng.uniform(10, H - 10, size=(B, K))
        xs = np.arange(W)
        ys = np.arange(H)
        simcc_x = np.exp(-((xs[None, None] - gt_x[..., None]) ** 2) / (2 * 4.0))
        simcc_y = np.exp(-((ys[None, None] - gt_y[..., None]) ** 2) / (2 * 4.0))
        kps, conf = decode_simcc(simcc_x, simcc_y, split)
        kps = np.asarray(kps)
        np.testing.assert_allclose(kps[..., 0], gt_x / split, atol=0.25)
        np.testing.assert_allclose(kps[..., 1], gt_y / split, atol=0.25)
        assert (np.asarray(conf) > 0.9).all()

    def test_heatmap_subpixel_refinement(self, rng):
        B, K, H, W = 1, 4, 64, 48
        gt = np.stack([rng.uniform(5, W - 5, (B, K)), rng.uniform(5, H - 5, (B, K))], axis=-1)
        ys, xs = np.mgrid[0:H, 0:W]
        hm = np.exp(
            -((xs[None, None] - gt[..., 0, None, None]) ** 2 + (ys[None, None] - gt[..., 1, None, None]) ** 2)
            / (2 * 2.0**2)
        )
        kps, conf = decode_heatmap(hm)
        err = np.linalg.norm(np.asarray(kps) - gt, axis=-1)
        assert err.max() < 0.3
        # refinement beats plain argmax
        kps0, _ = decode_heatmap(hm, refine=False)
        err0 = np.linalg.norm(np.asarray(kps0) - gt, axis=-1)
        assert err.mean() < err0.mean()


class TestModelCards:
    def test_builtin_card_loads(self):
        card = ModelCard.from_toml(CARDS_DIR / "rtmpose_m_halpe26.toml")
        assert card.format == "simcc"
        assert card.input_width == 192 and card.input_height == 256
        assert card.point_name_to_id["left_ankle"] == 15
        assert card.wireframe is not None
        assert len(card.wireframe.segments) == 13
        assert card.keypoint_id_to_name[0] == "nose"
        assert not card.onnx_exists  # model not downloaded in CI

    def test_registry_scan_and_builtin(self, tmp_path):
        assert {"CHARUCO", "ARUCO", "CHESSBOARD"} <= set(available_trackers())
        found = scan_onnx_models(CARDS_DIR, models_dir=tmp_path)
        assert "RTMPOSE_M_HALPE26" in found
        assert "RTMPOSE_M_HALPE26" in available_trackers()
        with pytest.raises(KeyError):
            tracker_factory("NOPE")


class TestGravitySolver:
    def _synthetic_field(self, g_cam, K, H=240, W=320, noise=0.01, seed=0):
        """Exact perspective up-field for a known camera-frame gravity."""
        rng = np.random.default_rng(seed)
        ys, xs = np.mgrid[0:H, 0:W]
        pnx = (xs - K[0, 2]) / K[0, 0]
        pny = (ys - K[1, 2]) / K[1, 1]
        ux = g_cam[0] - pnx * g_cam[2]
        uy = g_cam[1] - pny * g_cam[2]
        f = np.stack([ux, uy], axis=-1)
        f /= np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-9)
        f += rng.normal(scale=noise, size=f.shape)
        return f

    def test_recovers_gravity_direction(self):
        K = np.array([[600.0, 0, 160], [0, 600.0, 120], [0, 0, 1]])
        g_true = np.array([0.15, 0.97, 0.19])
        g_true /= np.linalg.norm(g_true)
        field = self._synthetic_field(g_true, K)
        fit = fit_gravity(field, K)
        ang = np.degrees(np.arccos(abs(np.clip(fit.gravity_cam @ g_true, -1, 1))))
        assert ang < 1.0, (fit.gravity_cam, g_true)
        assert fit.inlier_fraction > 0.9

    def test_robust_to_outlier_pixels(self):
        K = np.array([[600.0, 0, 160], [0, 600.0, 120], [0, 0, 1]])
        g_true = np.array([0.0, 0.95, 0.3])
        g_true /= np.linalg.norm(g_true)
        field = self._synthetic_field(g_true, K, noise=0.02, seed=1)
        rng = np.random.default_rng(2)
        mask = rng.uniform(size=field.shape[:2]) < 0.15
        field[mask] = rng.normal(size=(mask.sum(), 2))
        fit = fit_gravity(field, K)
        ang = np.degrees(np.arccos(abs(np.clip(fit.gravity_cam @ g_true, -1, 1))))
        assert ang < 2.0

    def test_per_camera_aggregation(self):
        K = np.array([[600.0, 0, 160], [0, 600.0, 120], [0, 0, 1]])
        g = np.array([0.1, 0.98, 0.15])
        g /= np.linalg.norm(g)
        fields = {3: [self._synthetic_field(g, K, seed=s) for s in range(3)]}
        est = estimate_vertical_from_fields(fields, {3: K})
        assert est.cam_ids == [3]
        up = est.up_by_camera[3]
        ang = np.degrees(np.arccos(abs(np.clip(up @ g, -1, 1))))
        assert abs(ang - 180.0) < 1.0 or ang < 1.0  # up is anti-parallel to gravity


class TestRepositories:
    def test_repository_round_trips(self, tmp_path):
        from caliscope_tpu.cameras import CameraArray, CameraData
        from caliscope_tpu.repositories import (
            CameraArrayRepository,
            IntrinsicReportRepository,
            ProjectSettingsRepository,
            TargetRouting,
            CalibrationTargetsRepository,
        )
        from caliscope_tpu.pipelines.calibrate_intrinsics import IntrinsicCalibrationReport
        from caliscope_tpu.targets import Charuco

        cams = CameraArrayRepository(tmp_path / "camera_array.toml")
        assert not cams.exists()
        cams.save(CameraArray({0: CameraData(0, (640, 480))}))
        cams.save_camera(CameraData(1, (640, 480), matrix=np.eye(3) * 500, distortions=np.zeros(5)))
        loaded = cams.load()
        assert set(loaded.cameras) == {0, 1}
        assert loaded.cameras[1].has_intrinsics

        targets = CalibrationTargetsRepository(tmp_path / "targets")
        targets.initialize_defaults()
        assert targets.get_routing() == TargetRouting()
        targets.save_routing(TargetRouting(extrinsic="aruco", extrinsic_charuco_same_as_intrinsic=False))
        assert targets.get_routing().extrinsic == "aruco"
        ch = Charuco(rows=6, columns=8, square_size_m=0.03)
        targets.save_intrinsic_charuco(ch)
        assert targets.load_intrinsic_charuco() == ch

        settings = ProjectSettingsRepository(tmp_path / "project_settings.toml")
        settings.save({"fps": 30, "note": "hello"})
        settings2 = ProjectSettingsRepository(tmp_path / "project_settings.toml")
        assert settings2.get("fps") == 30

        reports = IntrinsicReportRepository(tmp_path / "reports")
        rep = IntrinsicCalibrationReport(0.4, 28, 0.9, 0.8, 0.5, True, 5, (1, 2, 3))
        reports.save(2, rep)
        assert reports.load(2) == rep
        assert reports.load_all() == {2: rep}
        assert reports.delete(2) and reports.load(2) is None


class TestVerticalLiveInference:
    def test_estimate_vertical_executes_through_jax_onnx(self, tmp_path):
        """The FULL vertical path — video sampling -> ONNX inference (JAX
        executor) -> gravity fits -> per-camera up vectors — executes live
        with a surrogate perspective-field network (constant upward field =
        camera level, gravity along -y in camera coords)."""
        cv2 = pytest.importorskip("cv2")
        import numpy as np

        from caliscope_tpu.estimators import vertical as V
        from caliscope_tpu.pose.onnx_proto import save_model
        from caliscope_tpu.pose.torch_onnx import GraphBuilder

        # surrogate: 1x1 conv, zero weights, bias = (0, -1) -> uniform
        # up-field pointing to -y (image up) at every pixel
        b = GraphBuilder("input", (1, 3, 240, 320))
        w = np.zeros((2, 3, 1, 1), np.float32)
        bias = np.asarray([0.0, -1.0], np.float32)
        out = b.node("Conv", ["input", b.init(w, "w"), b.init(bias, "b")],
                     kernel_shape=[1, 1], strides=[1, 1], pads=[0, 0, 0, 0])[0]
        model = b.finish([out])
        models_dir = tmp_path / "models"
        models_dir.mkdir()
        save_model(model, models_dir / V.GEOCALIB_FILENAME)

        video = tmp_path / "cam_0.mp4"
        vw = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (128, 96))
        rng = np.random.default_rng(0)
        for _ in range(8):
            vw.write(rng.integers(0, 255, (96, 128, 3)).astype(np.uint8))
        vw.release()

        K = np.array([[120.0, 0, 64.0], [0, 120.0, 48.0], [0, 0, 1.0]])
        est = V.estimate_vertical({0: video}, {0: K}, models_dir, n_sample_frames=3)
        assert 0 in est.up_by_camera
        up = est.up_by_camera[0]
        # a uniform image up-field (0,-1) = a level camera; the solver's
        # camera-frame 'up' convention for that is +y (dominant component)
        assert up[1] > 0.7 and abs(up[0]) < 0.3 and abs(up[2]) < 0.3, up
