"""Frame undistortion, board rendering, synthetic fixtures, CLI smoke."""

import subprocess
import sys

import numpy as np
import pytest

from caliscope_tpu.cameras import CameraData
from caliscope_tpu.synthetic.factories import default_ring_scene
from caliscope_tpu.synthetic.fixture_repository import (
    load_fixture_observations,
    load_scene_fixture,
    save_scene_fixture,
)
from caliscope_tpu.targets import Charuco


class TestUndistortFrame:
    def test_round_trip_identity_when_undistorted(self):
        cam = CameraData(0, (64, 48), matrix=[[60, 0, 32], [0, 60, 24], [0, 0, 1]], distortions=np.zeros(5))
        frame = np.random.default_rng(0).integers(0, 255, (48, 64), np.uint8)
        out = cam.undistort_frame(frame)
        assert out.shape == frame.shape
        # zero distortion: near-identity map
        assert np.abs(out.astype(int) - frame.astype(int)).mean() < 1.0

    def test_straightens_distorted_grid(self):
        cv2 = pytest.importorskip("cv2")
        K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        dist = np.array([-0.3, 0.08, 0, 0, 0])
        cam = CameraData(0, (320, 240), matrix=K, distortions=dist)
        # render a distorted straight line: project collinear world points
        line_world = np.stack([np.linspace(-0.5, 0.5, 50), np.full(50, 0.2), np.full(50, 1.0)], axis=1)
        cam2 = CameraData(0, (320, 240), matrix=K, distortions=dist, rotation=np.eye(3), translation=np.zeros(3))
        uv = cam2.project_points(line_world)
        img = np.zeros((240, 320), np.uint8)
        for x, y in uv:
            if 0 <= int(y) < 240 and 0 <= int(x) < 320:
                cv2.circle(img, (int(x), int(y)), 1, 255, -1)
        und = cam.undistort_frame(img)
        ys, xs = np.where(und > 100)
        # after undistortion the points are collinear: tiny line-fit residual
        A = np.stack([xs, np.ones_like(xs)], axis=1).astype(float)
        coeff, res, *_ = np.linalg.lstsq(A, ys.astype(float), rcond=None)
        rms = np.sqrt(res[0] / len(xs)) if len(res) else 0.0
        assert rms < 1.5

        ys0, xs0 = np.where(img > 100)
        A0 = np.stack([xs0, np.ones_like(xs0)], axis=1).astype(float)
        _, res0, *_ = np.linalg.lstsq(A0, ys0.astype(float), rcond=None)
        rms0 = np.sqrt(res0[0] / len(xs0)) if len(res0) else 0.0
        assert rms < rms0  # straighter than the distorted input


class TestBoardRendering:
    def test_board_image_detectable_by_both_engines(self):
        cv2 = pytest.importorskip("cv2")
        import jax

        from caliscope_tpu.trackers import CharucoTracker

        ch = Charuco(rows=5, columns=7, square_size_m=0.054)
        img = cv2.GaussianBlur(ch.board_image(px_per_square=80), (3, 3), 0.7)
        pkt = CharucoTracker(ch).get_points(img)
        assert len(pkt) == ch.n_corners
        cvd = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
        board = cv2.aruco.CharucoBoard((7, 5), 0.054, 0.054 * 0.75, cvd)
        _c, ids, _, _ = cv2.aruco.CharucoDetector(board).detectBoard(img)
        assert ids is not None and len(ids) == ch.n_corners

    def test_mirror_image_is_flipped(self):
        ch = Charuco(rows=4, columns=5, square_size_m=0.05, thickness_m=0.004)
        np.testing.assert_array_equal(ch.mirror_image(40), ch.board_image(40)[:, ::-1])


class TestFixtures:
    def test_scene_fixture_round_trip(self, tmp_path):
        scene = default_ring_scene(n_frames=4, noise_sigma_px=0.3)
        save_scene_fixture(scene, tmp_path / "fx")
        scene2 = load_scene_fixture(tmp_path / "fx")
        ip1 = scene.image_points_noisy()
        ip2 = scene2.image_points_noisy()
        np.testing.assert_allclose(ip1.img_xy, ip2.img_xy, atol=1e-12)
        perfect, noisy, world = load_fixture_observations(tmp_path / "fx")
        assert len(perfect) == len(ip1)
        np.testing.assert_allclose(noisy.img_xy, ip1.img_xy, atol=1e-9)


class TestImportBoundary:
    def test_headless_imports_stay_light(self):
        """Core modules import without optional/GUI dependencies (reference
        tests/test_import_boundary.py): no PySide6, no onnxruntime, and the
        base package does not eagerly initialize cv2."""
        import subprocess
        import sys as _sys

        code = (
            "import sys\n"
            "import caliscope_tpu\n"
            "import caliscope_tpu.api\n"
            "import caliscope_tpu.volume\n"
            "import caliscope_tpu.targets.charuco\n"
            "import caliscope_tpu.logger\n"
            "forbidden = [m for m in ('PySide6', 'onnxruntime', 'cv2') if m in sys.modules]\n"
            "assert not forbidden, forbidden\n"
            "print('OK')\n"
        )
        r = subprocess.run(
            [_sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo", timeout=180
        )
        assert r.returncode == 0, r.stderr
        assert "OK" in r.stdout


class TestCLI:
    def test_init_and_status(self, tmp_path):
        env_ws = tmp_path / "proj"
        for args in (["init", str(env_ws)], ["status", str(env_ws)]):
            r = subprocess.run(
                [sys.executable, "-m", "caliscope_tpu", *args],
                capture_output=True, text=True, cwd="/root/repo", timeout=120,
            )
            assert r.returncode == 0, r.stderr
        assert (env_ws / "calibration" / "targets" / "config.toml").exists()


class TestBoardExport:
    def test_save_image_round_trips(self, tmp_path):
        from PIL import Image

        from caliscope_tpu.targets import Charuco

        ch = Charuco(rows=4, columns=5, square_size_m=0.05)
        out = tmp_path / "board.png"
        ch.save_image(out, px_per_square=40)
        back = np.asarray(Image.open(out))
        np.testing.assert_array_equal(back, ch.board_image(px_per_square=40))
        mirrored = tmp_path / "mirror.png"
        ch.save_mirror_image(mirrored, px_per_square=40)
        back_m = np.asarray(Image.open(mirrored))
        np.testing.assert_array_equal(back_m, ch.board_image(px_per_square=40)[:, ::-1])

    def test_cli_export_board(self, tmp_path):
        from caliscope_tpu.__main__ import main as cli_main

        ws_dir = tmp_path / "ws"
        assert cli_main(["init", str(ws_dir)]) == 0
        out = tmp_path / "board.png"
        assert cli_main(["export-board", str(ws_dir), str(out)]) == 0
        assert out.exists() and out.stat().st_size > 1000


class TestLogging:
    """Rotating-file + console logging and the global excepthook
    (reference logger.py:69-113)."""

    def test_file_handler_receives_records(self, tmp_path):
        import logging

        from caliscope_tpu.logger import setup_logging

        setup_logging(log_dir=tmp_path, console=False)
        try:
            logging.getLogger("caliscope_tpu.some.module").warning("calibration drift detected")
            for h in logging.getLogger("caliscope_tpu").handlers:
                h.flush()
            text = (tmp_path / "caliscope_tpu.log").read_text()
            assert "calibration drift detected" in text
            assert "WARNING" in text
        finally:
            logging.getLogger("caliscope_tpu").handlers.clear()

    def test_excepthook_logs_uncaught(self, tmp_path):
        import logging
        import sys

        from caliscope_tpu.logger import setup_logging

        prev_hook = sys.excepthook
        setup_logging(log_dir=tmp_path, console=False)
        try:
            try:
                raise RuntimeError("boom from excepthook test")
            except RuntimeError:
                sys.excepthook(*sys.exc_info())
            for h in logging.getLogger("caliscope_tpu").handlers:
                h.flush()
            text = (tmp_path / "caliscope_tpu.log").read_text()
            assert "Uncaught exception" in text
            assert "boom from excepthook test" in text
        finally:
            sys.excepthook = prev_hook
            logging.getLogger("caliscope_tpu").handlers.clear()

    def test_reconfiguration_does_not_duplicate_handlers(self, tmp_path):
        import logging

        from caliscope_tpu.logger import setup_logging

        try:
            setup_logging(log_dir=tmp_path, console=True)
            setup_logging(log_dir=tmp_path, console=True)
            assert len(logging.getLogger("caliscope_tpu").handlers) == 2
        finally:
            logging.getLogger("caliscope_tpu").handlers.clear()
