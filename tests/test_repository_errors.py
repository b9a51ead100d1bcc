"""Repository failure modes: corrupted files, missing artifacts, legacy routing.

The reference wraps persistence failures in actionable errors
(repositories/*, persistence.py PersistenceError); these tests pin that
corruption and absence fail LOUDLY with typed errors, never half-loaded
state.
"""

from __future__ import annotations

import numpy as np
import pytest

from caliscope_tpu.cameras import CameraArray, CameraData
from caliscope_tpu.repositories import (
    CameraArrayRepository,
    CaptureVolumeRepository,
    CalibrationTargetsRepository,
)


def _one_cam_array() -> CameraArray:
    cam = CameraData(
        cam_id=0,
        size=(640, 480),
        matrix=np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]),
        distortions=np.zeros(5),
        rotation=np.eye(3),
        translation=np.zeros(3),
    )
    return CameraArray({0: cam})


class TestCameraArrayRepository:
    def test_exists_tracks_file(self, tmp_path):
        repo = CameraArrayRepository(tmp_path / "camera_array.toml")
        assert not repo.exists()
        repo.save(_one_cam_array())
        assert repo.exists()
        loaded = repo.load()
        assert 0 in loaded.cameras
        np.testing.assert_allclose(loaded.cameras[0].matrix, _one_cam_array().cameras[0].matrix)

    def test_corrupted_toml_raises_value_error(self, tmp_path):
        p = tmp_path / "camera_array.toml"
        p.write_text("this is [ not = valid TOML {{{")
        with pytest.raises(Exception) as ei:
            CameraArrayRepository(p).load()
        assert "camera" in str(ei.value).lower() or "toml" in str(ei.value).lower()

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(Exception):
            CameraArrayRepository(tmp_path / "nope.toml").load()

    def test_save_camera_merges_into_existing(self, tmp_path):
        repo = CameraArrayRepository(tmp_path / "camera_array.toml")
        repo.save(_one_cam_array())
        cam1 = CameraData(cam_id=1, size=(640, 480))
        repo.save_camera(cam1)
        loaded = repo.load()
        assert set(loaded.cameras) == {0, 1}
        # camera 0's calibration survives the merge
        assert loaded.cameras[0].matrix is not None


class TestCaptureVolumeRepository:
    def test_missing_volume_raises_value_error(self, tmp_path):
        repo = CaptureVolumeRepository(tmp_path / "capture_volume")
        assert not repo.exists()
        with pytest.raises(ValueError, match="[Cc]apture volume"):
            repo.load()

    def test_partially_present_volume_fails_loudly(self, tmp_path):
        base = tmp_path / "capture_volume"
        base.mkdir()
        (base / "camera_array.toml").write_text("")  # artifact present but empty
        repo = CaptureVolumeRepository(base)
        with pytest.raises(Exception):
            repo.load()


class TestCalibrationTargetsRepository:
    def test_defaults_then_roundtrip(self, tmp_path):
        repo = CalibrationTargetsRepository(tmp_path / "targets")
        repo.initialize_defaults()
        ch = repo.load_intrinsic_charuco()
        assert ch.rows >= 2 and ch.columns >= 2
        routing = repo.get_routing()
        assert repo.get_extrinsic_tracker_name()
        repo.save_routing(routing)
        assert repo.get_routing() == routing

    def test_corrupted_target_file(self, tmp_path):
        repo = CalibrationTargetsRepository(tmp_path / "targets")
        repo.initialize_defaults()
        # corrupt the intrinsic charuco spec on disk
        files = list((tmp_path / "targets").glob("*.toml"))
        assert files
        for f in files:
            f.write_text("rows = }{ garbage")
        with pytest.raises(Exception):
            repo.load_intrinsic_charuco()
