"""API surface + export + reconstruction + coverage tests
(reference tests/test_api.py, test_multicam_extraction_oracle.py,
coverage_analysis tests)."""

from pathlib import Path

import numpy as np
import pytest

from caliscope_tpu.api import (
    CalibrationError,
    extract_image_points,
    extract_image_points_multicam,
)
from caliscope_tpu.coverage import (
    LinkQuality,
    WarningSeverity,
    analyze_multi_camera_coverage,
    classify_link_quality,
    detect_structural_warnings,
)
from caliscope_tpu.observations import ImagePoints
from caliscope_tpu.packets import PixelFormat, PointPacket
from caliscope_tpu.synthetic.factories import default_ring_scene
from caliscope_tpu.tracker import Tracker


class BlobTracker(Tracker):
    """Finds the centroid of bright pixels — a deterministic test tracker."""

    @property
    def name(self):
        return "BLOB"

    @property
    def pixel_format(self):
        return PixelFormat.GRAY

    def _detect(self, frame, cam_id=0, rotation_count=0):
        ys, xs = np.where(frame > 128)
        if len(xs) == 0:
            return PointPacket.empty()
        return PointPacket(
            object_id=np.array([0]),
            keypoint_id=np.array([0]),
            img_loc=np.array([[xs.mean(), ys.mean()]]),
        )

    def get_point_name(self, keypoint_id):
        return f"blob_{keypoint_id}"


def _make_video(path, n_frames=8, blob_xs=None):
    cv2 = pytest.importorskip("cv2")
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (96, 64))
    for i in range(n_frames):
        frame = np.zeros((64, 96, 3), np.uint8)
        x = blob_xs[i] if blob_xs is not None else 10 + 8 * i
        cv2.circle(frame, (int(x), 32), 5, (255, 255, 255), -1)
        w.write(frame)
    w.release()
    return path


class TestExtraction:
    def test_single_video_extraction(self, tmp_path):
        video = _make_video(tmp_path / "a.mp4")
        ip = extract_image_points(video, cam_id=2, tracker=BlobTracker(), progress=None)
        assert len(ip) == 8
        assert (ip.cam_id == 2).all()
        # blob moves right by ~8px per frame
        dx = np.diff(ip.img_xy[np.argsort(ip.sync_index), 0])
        assert np.all(dx > 4)

    def test_frame_step(self, tmp_path):
        video = _make_video(tmp_path / "a.mp4")
        ip = extract_image_points(video, cam_id=0, tracker=BlobTracker(), frame_step=3, progress=None)
        assert sorted(np.unique(ip.sync_index)) == [0, 3, 6]

    def test_multicam_extraction(self, tmp_path):
        videos = {
            0: _make_video(tmp_path / "cam0.mp4"),
            1: _make_video(tmp_path / "cam1.mp4"),
        }
        ip = extract_image_points_multicam(videos, BlobTracker(), progress=None)
        assert set(np.unique(ip.cam_id)) == {0, 1}
        # same sync indices for both cameras
        for si in np.unique(ip.sync_index):
            assert set(ip.cam_id[ip.sync_index == si]) == {0, 1}

    def test_no_detection_raises(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        path = tmp_path / "dark.mp4"
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (96, 64))
        for _ in range(4):
            w.write(np.zeros((64, 96, 3), np.uint8))
        w.release()
        with pytest.raises(CalibrationError, match="zero landmarks"):
            extract_image_points(path, 0, BlobTracker(), progress=None)


class TestCoverage:
    def test_full_ring_coverage(self):
        scene = default_ring_scene(n_frames=6, noise_sigma_px=0.0)
        rep = analyze_multi_camera_coverage(scene.image_points_perfect())
        assert rep.n_connected_components == 1
        assert not rep.isolated_cameras
        assert not rep.has_critical_issues
        assert (np.diag(rep.pairwise_observations) > 0).all()

    def test_isolated_camera_detected(self):
        ip = ImagePoints(
            np.array([0, 0, 1]), np.array([0, 1, 5]), np.zeros(3), np.array([0, 0, 0]),
            np.zeros((3, 2)),
        )
        rep = analyze_multi_camera_coverage(ip)
        assert 5 in rep.isolated_cameras
        warnings = detect_structural_warnings(rep, rep.n_cameras)
        assert warnings[0].severity is WarningSeverity.CRITICAL

    def test_link_quality_badges(self):
        assert classify_link_quality(500) is LinkQuality.GOOD
        assert classify_link_quality(100) is LinkQuality.MARGINAL
        assert classify_link_quality(5) is LinkQuality.INSUFFICIENT


class TestExports:
    @pytest.fixture(scope="class")
    def world_points(self):
        scene = default_ring_scene(n_frames=6, noise_sigma_px=0.0)
        wp = scene.world_points()
        wp.frame_time[:] = wp.sync_index / 30.0
        return wp

    def test_wide_labelled(self, world_points):
        from caliscope_tpu.export import xyz_to_wide_labelled

        wide = xyz_to_wide_labelled(world_points, BlobTracker())
        assert len(wide) == 6
        assert any(c.endswith("_x") for c in wide.columns)

    def test_trc_export(self, world_points, tmp_path):
        from caliscope_tpu.export import xyz_to_trc

        trc = xyz_to_trc(world_points, BlobTracker(), tmp_path / "out.trc")
        lines = trc.read_text().splitlines()
        assert lines[0].startswith("PathFileType\t4\t(X/Y/Z)")
        assert lines[1].split("\t")[0] == "DataRate"
        # 35 markers on the 5x7 board
        assert int(lines[2].split("\t")[3]) == 35

    def test_blender_scene(self, world_points, tmp_path):
        import json

        from caliscope_tpu.export import write_blender_scene

        scene = default_ring_scene(n_frames=6)
        script = write_blender_scene(scene.cameras, world_points, tmp_path / "scene.py", tracker=BlobTracker())
        assert script.exists()
        data = json.loads(script.with_suffix(".json").read_text())
        assert len(data["cameras"]) == 4
        assert len(data["frames"]) == 6
        compile(script.read_text(), str(script), "exec")  # emitted bpy script parses

    def test_reconstruct_xyz(self, tmp_path):
        from caliscope_tpu.reconstruction import reconstruct_xyz

        scene = default_ring_scene(n_frames=6, noise_sigma_px=0.2)
        ip = scene.image_points_noisy()
        ip.frame_time = ip.sync_index / 30.0
        reconstruct_xyz(ip, scene.cameras, BlobTracker(), tmp_path)
        assert (tmp_path / "xyz_BLOB.csv").exists()
        assert (tmp_path / "xyz_BLOB_labelled.csv").exists()
        assert (tmp_path / "xyz_BLOB.trc").exists()

    def test_reconstruct_empty_writes_nothing(self, tmp_path):
        from caliscope_tpu.reconstruction import reconstruct_xyz

        scene = default_ring_scene(n_frames=2)
        reconstruct_xyz(ImagePoints.empty(), scene.cameras, BlobTracker(), tmp_path / "sub")
        assert not (tmp_path / "sub").exists() or not list((tmp_path / "sub").iterdir())


class TestAniposelibExport:
    """aniposelib/Pose2Sim interop format (reference camera_array.py:491-534,
    tests/test_aniposelib_export.py)."""

    def _rig(self):
        from caliscope_tpu.cameras import CameraArray, CameraData

        K = np.array([[800.0, 0, 640], [0, 800.0, 360], [0, 0, 1.0]])
        R = np.eye(3)
        posed = CameraData(
            cam_id=0, size=(1280, 720), matrix=K, distortions=np.zeros(5),
            rotation=R, translation=np.array([0.1, -0.2, 2.0]),
        )
        th = 0.3
        Ry = np.array([
            [np.cos(th), 0, np.sin(th)],
            [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)],
        ])
        posed2 = CameraData(
            cam_id=2, size=(1280, 720), matrix=K.copy(), distortions=np.array([0.1, -0.05, 0.001, 0.002, 0.0]),
            rotation=Ry, translation=np.array([-0.5, 0.0, 2.2]),
        )
        unposed = CameraData(cam_id=1, size=(640, 480), matrix=K.copy())
        return CameraArray({0: posed, 1: unposed, 2: posed2})

    def test_sections_and_fields(self, tmp_path):
        import tomllib

        rig = self._rig()
        path = tmp_path / "anipose.toml"
        rig.to_aniposelib_toml(path)
        data = tomllib.loads(path.read_text())

        # posed cameras only, flat [cam_N] sections + [metadata]
        assert set(data.keys()) == {"cam_0", "cam_2", "metadata"}
        assert data["metadata"] == {"adjusted": False, "error": 0.0}

        c0 = data["cam_0"]
        assert c0["name"] == "cam_0"
        assert c0["size"] == [1280, 720]
        np.testing.assert_allclose(np.array(c0["matrix"]), rig.cameras[0].matrix)
        assert len(c0["distortions"]) == 5
        # identity rotation must survive as an explicit zero rodrigues vector,
        # not be dropped as falsy
        assert c0["rotation"] == [0.0, 0.0, 0.0]
        np.testing.assert_allclose(c0["translation"], [0.1, -0.2, 2.0])
        assert c0["fisheye"] is False

    def test_rotation_is_rodrigues_of_world_to_cam(self, tmp_path):
        import tomllib

        from caliscope_tpu.ops.lie import so3_exp

        rig = self._rig()
        path = tmp_path / "anipose.toml"
        rig.to_aniposelib_toml(path)
        data = tomllib.loads(path.read_text())
        rvec = np.array(data["cam_2"]["rotation"])
        assert rvec.shape == (3,)
        np.testing.assert_allclose(np.asarray(so3_exp(rvec)), rig.cameras[2].rotation, atol=1e-9)


class TestDocumentedScriptingSurface:
    def test_reference_scripting_imports_resolve(self, tmp_path):
        """The reference's documented import block (docs/scripting.md) must
        work verbatim against our api/reporting modules, plus the
        camera-array-from-videos entry point it builds on."""
        from caliscope_tpu.api import (  # noqa: F401
            CameraArray,
            CaptureVolume,
            Charuco,
            CharucoTracker,
            ConstraintSet,
            calibrate_extrinsics,
            calibrate_intrinsics,
            extract_image_points,
            extract_image_points_multicam,
        )
        from caliscope_tpu.reporting import (  # noqa: F401
            print_camera_pair_coverage,
            print_extrinsic_report,
            print_intrinsic_report,
        )

        cv2 = pytest.importorskip("cv2")
        import numpy as np

        w = cv2.VideoWriter(str(tmp_path / "c0.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (96, 64))
        for _ in range(3):
            w.write(np.zeros((64, 96, 3), np.uint8))
        w.release()
        arr = CameraArray.from_video_metadata({0: tmp_path / "c0.mp4"})
        assert arr.cameras[0].size == (96, 64)
        assert arr.cameras[0].matrix is None  # uncalibrated, as documented
