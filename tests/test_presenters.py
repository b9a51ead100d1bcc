"""Presenter state machines (reference tests/gui/presenters/ drive the same
state machines without rendering)."""

import time

import numpy as np
import pytest

from caliscope_tpu.presenters import (
    ExtrinsicCalibrationPresenter,
    ExtrinsicCalibrationState,
    FilterPreviewData,
)
from caliscope_tpu.synthetic.camera_synthesizer import strip_extrinsics
from caliscope_tpu.synthetic.factories import default_ring_scene


@pytest.fixture(scope="module")
def scene_data():
    scene = default_ring_scene(noise_sigma_px=0.5, n_frames=8)
    return scene, scene.image_points_noisy(), strip_extrinsics(scene.cameras)


class TestExtrinsicPresenter:
    def test_state_progression_and_signals(self, scene_data):
        scene, ip, cams = scene_data
        p = ExtrinsicCalibrationPresenter(ip, cams, None)
        assert p.state is ExtrinsicCalibrationState.NEEDS_CALIBRATION
        states, progress = [], []
        p.state_changed.connect(states.append)
        p.progress_updated.connect(lambda pct, msg: progress.append(pct))
        p.set_refine_intrinsics(False)
        handle = p.run_calibration(block=True)
        deadline = time.time() + 60
        while p.state is ExtrinsicCalibrationState.CALIBRATING and time.time() < deadline:
            time.sleep(0.1)
        assert p.state is ExtrinsicCalibrationState.CALIBRATED, states
        assert ExtrinsicCalibrationState.CALIBRATING in states
        assert progress and progress[-1] == 100
        assert p.capture_volume is not None

    def test_filter_preview_and_origin_options(self, scene_data):
        scene, ip, cams = scene_data
        p = ExtrinsicCalibrationPresenter(ip, cams, None)
        assert p.get_filter_preview().percent_above_threshold(1.0) == 0.0  # empty
        p.set_refine_intrinsics(False)
        p.run_calibration(block=True)
        deadline = time.time() + 60
        while p.state is ExtrinsicCalibrationState.CALIBRATING and time.time() < deadline:
            time.sleep(0.1)
        preview = p.get_filter_preview()
        assert len(preview.errors) > 0
        assert 0 <= preview.percent_above_threshold(0.5) <= 100
        options = p.get_origin_options()
        assert options and options[0].object_id == 0

    def test_post_calibration_transforms_emit(self, scene_data):
        scene, ip, cams = scene_data
        p = ExtrinsicCalibrationPresenter(ip, cams, None)
        p.set_refine_intrinsics(False)
        p.run_calibration(block=True)
        deadline = time.time() + 60
        while p.state is ExtrinsicCalibrationState.CALIBRATING and time.time() < deadline:
            time.sleep(0.1)
        volumes = []
        p.capture_volume_changed.connect(volumes.append)
        r0 = p.capture_volume.reprojection_report.overall_rmse
        p.rotate("z", 45.0)
        assert len(volumes) == 1
        assert volumes[0].reprojection_report.overall_rmse == pytest.approx(r0, rel=1e-6)
        p.align_to_origin(0, int(np.unique(ip.sync_index)[0]))
        assert len(volumes) == 2

    def test_no_data_state(self):
        p = ExtrinsicCalibrationPresenter(None, None, None)
        assert p.state is ExtrinsicCalibrationState.NO_DATA
        assert p.run_calibration() is None
        assert p.state is ExtrinsicCalibrationState.FAILED  # surfaced missing data
