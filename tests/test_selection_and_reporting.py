"""Frame selection, terminal reporting, report objects, and TOML persistence.

Direct unit coverage for the support modules the pipelines lean on
(reference analogs: tests around core/frame_selector.py, reporting.py,
core/reprojection_report.py, persistence.py).
"""

from __future__ import annotations

import io
import tomllib

import numpy as np
import pytest

from caliscope_tpu.frame_selector import (
    GRID_SIZE,
    IntrinsicCoverageReport,
    MIN_CORNERS_PER_FRAME,
    select_calibration_frames,
)
from caliscope_tpu.observations import ImagePoints

IMAGE_SIZE = (1280, 720)
K = np.array([[800.0, 0, 640], [0, 800.0, 360], [0, 0, 1]])


def _board_xy(cols: int = 9, rows: int = 6, spacing: float = 0.03) -> np.ndarray:
    xs, ys = np.meshgrid(np.arange(cols) * spacing, np.arange(rows) * spacing)
    return np.stack([xs.ravel(), ys.ravel()], axis=1)


def _frame_points(tilt_deg: float, azimuth_deg: float, center_px: tuple[float, float], dist: float = 1.0):
    """Project the planar board through K [r1 r2 t]: exact planar imaging."""
    board = _board_xy()
    board_c = board - board.mean(axis=0)
    az = np.radians(azimuth_deg)
    axis = np.array([np.cos(az), np.sin(az), 0.0])
    ang = np.radians(tilt_deg)
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * (Kx @ Kx)
    t = np.linalg.inv(K) @ np.array([center_px[0], center_px[1], 1.0]) * dist
    H = K @ np.column_stack([R[:, 0], R[:, 1], t])
    p = (H @ np.column_stack([board_c, np.ones(len(board_c))]).T).T
    img = p[:, :2] / p[:, 2:3]
    return board, img


def _make_image_points(frame_specs, cam_id: int = 0) -> ImagePoints:
    """frame_specs: list of (tilt_deg, azimuth_deg, center_px) per sync index."""
    rows = {"si": [], "kp": [], "img": [], "obj": []}
    for si, (tilt, azim, center) in enumerate(frame_specs):
        board, img = _frame_points(tilt, azim, center)
        inb = (img[:, 0] >= 0) & (img[:, 0] < IMAGE_SIZE[0]) & (img[:, 1] >= 0) & (img[:, 1] < IMAGE_SIZE[1])
        idx = np.where(inb)[0]
        rows["si"].append(np.full(len(idx), si))
        rows["kp"].append(idx)
        rows["img"].append(img[idx])
        rows["obj"].append(np.column_stack([board[idx], np.zeros(len(idx))]))
    n = sum(len(a) for a in rows["si"])
    return ImagePoints(
        sync_index=np.concatenate(rows["si"]),
        cam_id=np.full(n, cam_id),
        object_id=np.zeros(n),
        keypoint_id=np.concatenate(rows["kp"]),
        img_xy=np.concatenate(rows["img"]),
        obj_loc=np.concatenate(rows["obj"]),
    )


def _diverse_specs():
    """40 frames: 8 tilt azimuths x strong tilt + board swept over the image."""
    specs = []
    for k in range(8):
        specs.append((30.0, k * 45.0, (640, 360)))
    rng = np.random.default_rng(11)
    for _ in range(32):
        cx = rng.uniform(200, 1080)
        cy = rng.uniform(140, 580)
        specs.append((rng.uniform(5, 20), rng.uniform(0, 360), (cx, cy)))
    return specs


class TestFrameSelector:
    def test_deterministic(self):
        ip = _make_image_points(_diverse_specs())
        sel1, rep1 = select_calibration_frames(ip, 0, IMAGE_SIZE)
        sel2, rep2 = select_calibration_frames(ip, 0, IMAGE_SIZE)
        assert sel1 == sel2
        assert rep1 == rep2

    def test_orientation_diversity_and_budget(self):
        ip = _make_image_points(_diverse_specs())
        sel, rep = select_calibration_frames(ip, 0, IMAGE_SIZE, target_frames=20)
        assert len(sel) <= 20
        assert rep.orientation_sufficient
        assert rep.orientation_count >= 4
        assert 0.0 < rep.coverage_fraction <= 1.0
        assert set(sel) <= set(range(40))
        # every strong-tilt azimuth bin should contribute an anchor
        assert len(set(sel) & set(range(8))) >= 4

    def test_rejects_sparse_frames(self):
        specs = _diverse_specs()
        ip = _make_image_points(specs)
        # cripple frame 12 to fewer than MIN_CORNERS_PER_FRAME points
        keep = ~((ip.sync_index == 12) & (ip.keypoint_id >= MIN_CORNERS_PER_FRAME - 1))
        ip = ip.select(keep)
        sel, rep = select_calibration_frames(ip, 0, IMAGE_SIZE)
        assert 12 not in sel
        assert rep.n_candidate_frames == len(specs) - 1

    def test_frontal_only_falls_back_to_all_frames(self):
        # no tilted views: orientation-starved sessions must keep EVERY
        # candidate (planar self-calibration needs the redundancy)
        rng = np.random.default_rng(3)
        specs = [(0.5, 0.0, (rng.uniform(300, 1000), rng.uniform(200, 520))) for _ in range(15)]
        ip = _make_image_points(specs)
        sel, rep = select_calibration_frames(ip, 0, IMAGE_SIZE, target_frames=8)
        assert not rep.orientation_sufficient
        assert len(sel) == rep.n_candidate_frames  # fallback: all frames

    def test_empty_input(self):
        sel, rep = select_calibration_frames(ImagePoints.empty(), 0, IMAGE_SIZE)
        assert sel == []
        assert rep == IntrinsicCoverageReport(0.0, 0.0, 0.0, False, 0, (), 0)

    def test_coverage_grid_cells_respond_to_placement(self):
        # corner-hugging boards must raise corner coverage vs a centered-only set
        centered = _make_image_points([(30.0, k * 45.0, (640, 360)) for k in range(8)])
        corners = _make_image_points(
            [(30.0, k * 90.0, c) for k, c in enumerate([(130, 90), (1150, 90), (130, 630), (1150, 630)])]
        )
        _, rep_c = select_calibration_frames(centered, 0, IMAGE_SIZE)
        _, rep_k = select_calibration_frames(corners, 0, IMAGE_SIZE)
        assert rep_k.corner_coverage_fraction > rep_c.corner_coverage_fraction


class TestReporting:
    def _reprojection_report(self):
        from caliscope_tpu.reports import RawErrors, ReprojectionReport

        n = 6
        raw = RawErrors(
            sync_index=np.arange(n),
            cam_id=np.array([0, 0, 0, 1, 1, 1]),
            object_id=np.zeros(n, int),
            keypoint_id=np.arange(n),
            error_xy=np.column_stack([np.full(n, 0.3), np.full(n, 0.4)]),
        )
        return ReprojectionReport(
            overall_rmse=0.5,
            by_camera={0: 0.45, 1: 0.55},
            by_point={(0, 0): 0.5},
            n_unmatched_observations=2,
            unmatched_rate=0.25,
            unmatched_by_camera={0: 2},
            raw_errors=raw,
            n_observations_matched=n,
            n_observations_total=n + 2,
            n_cameras=2,
            n_points=3,
        )

    def test_raw_errors_euclidean(self):
        rep = self._reprojection_report()
        assert np.allclose(rep.raw_errors.euclidean_error, 0.5)
        assert len(rep.raw_errors) == 6

    def test_report_summary_text(self):
        s = self._reprojection_report().summary()
        assert "0.500 px" in s
        assert "cam 0: 0.450" in s
        assert "unmatched observations: 2 (25.0%)" in s

    def test_print_intrinsic_report(self):
        from caliscope_tpu.cameras import CameraData
        from caliscope_tpu.pipelines.calibrate_intrinsics import (
            IntrinsicCalibrationOutput,
            IntrinsicCalibrationReport,
        )
        from caliscope_tpu.reporting import print_intrinsic_report

        cam = CameraData(cam_id=3, size=IMAGE_SIZE, matrix=K.copy())
        rep = IntrinsicCalibrationReport(
            rmse=0.42,
            frames_used=18,
            coverage_fraction=0.84,
            edge_coverage_fraction=0.75,
            corner_coverage_fraction=0.5,
            orientation_sufficient=True,
            orientation_count=5,
            selected_frames=tuple(range(20)),
        )
        buf = io.StringIO()
        print_intrinsic_report(IntrinsicCalibrationOutput(camera=cam, report=rep), file=buf)
        text = buf.getvalue()
        assert "camera 3" in text
        assert "0.420 px (excellent)" in text
        assert "5/8 bins" in text
        assert "f = (800.0, 800.0)" in text

    def test_quality_badges(self):
        from caliscope_tpu.reporting import _quality_badge

        assert _quality_badge(0.3) == "excellent"
        assert _quality_badge(0.7) == "good"
        assert _quality_badge(1.5) == "acceptable"
        assert _quality_badge(5.0) == "poor"

    def test_print_coverage_grid_and_pairs(self):
        from caliscope_tpu.coverage import ExtrinsicCoverageReport
        from caliscope_tpu.reporting import print_camera_pair_coverage, print_coverage_grid

        mat = np.array([[0, 300, 10], [300, 0, 60], [10, 60, 0]], float)
        rep = ExtrinsicCoverageReport(
            pairwise_observations=mat,
            cam_ids=(0, 1, 2),
            isolated_cameras=[],
            n_connected_components=1,
            leaf_cameras=[],
        )
        buf = io.StringIO()
        print_camera_pair_coverage(rep, file=buf)
        pairs = buf.getvalue()
        assert "cam 0 <-> cam 1: 300" in pairs
        assert "cam 0 <-> cam 2: 10" in pairs
        buf2 = io.StringIO()
        print_coverage_grid(rep, file=buf2)
        grid = buf2.getvalue()
        assert "C0" in grid and "C2" in grid
        assert "300" in grid

    def test_plain_progress_throttles_frames(self):
        from caliscope_tpu.reporting import PlainProgress

        buf = io.StringIO()
        with PlainProgress(stream=buf, every=50) as p:
            p.on_video_start(0, 200)
            for i in range(200):
                p.on_frame(0, i, 8)
            p.on_video_complete(0)
            p.on_stage(40, "triangulating")
        text = buf.getvalue()
        assert text.count("frame") <= 6  # throttled, not 200 lines
        assert "triangulating" in text


class TestPersistence:
    def test_toml_round_trip_nested(self, tmp_path):
        from caliscope_tpu.persistence import load_toml, safe_write_toml, toml_dumps

        data = {
            "name": 'board "A"',
            "count": 7,
            "scale": 0.054,
            "flag": True,
            "matrix": [[1.0, 0.0], [0.0, 1.0]],
            "nested": {"inner": {"values": [1, 2, 3]}, "label": "x"},
            "items": [{"id": 1, "w": 0.5}, {"id": 2, "w": 1.5}],
            "weird key": {"a": 1},
        }
        text = toml_dumps(data)
        assert tomllib.loads(text) == data
        p = tmp_path / "sub" / "data.toml"
        safe_write_toml(data, p)
        assert load_toml(p) == data

    def test_atomic_write_leaves_no_temp_files(self, tmp_path):
        from caliscope_tpu.persistence import safe_write_text

        p = tmp_path / "out.csv"
        safe_write_text("a,b\n1,2\n", p)
        safe_write_text("a,b\n3,4\n", p)  # overwrite
        assert p.read_text() == "a,b\n3,4\n"
        assert [f.name for f in tmp_path.iterdir()] == ["out.csv"]

    def test_special_floats_and_empty(self):
        from caliscope_tpu.persistence import toml_dumps

        text = toml_dumps({"neg": -1.5e-8, "big": 1e30, "empty_list": [], "empty_table": {}})
        parsed = tomllib.loads(text)
        assert parsed["neg"] == pytest.approx(-1.5e-8)
        assert parsed["big"] == pytest.approx(1e30)
        assert parsed["empty_list"] == []
        assert parsed["empty_table"] == {}
