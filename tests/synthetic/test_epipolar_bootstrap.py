"""Markerless (essential-matrix) bootstrap tests
(reference tests/synthetic/test_epipolar_bootstrap.py).

Scenes strip obj_loc so the dispatch takes the epipolar path. The result is
correct up to a similarity transform; assertions Procrustes-align first.
"""

import numpy as np
import pytest

from caliscope_tpu.observations import ImagePoints
from caliscope_tpu.ops.similarity import umeyama
from caliscope_tpu.synthetic.camera_synthesizer import strip_extrinsics
from caliscope_tpu.synthetic.factories import default_ring_scene
from caliscope_tpu.volume import CaptureVolume


def _strip_obj_loc(ip: ImagePoints) -> ImagePoints:
    return ImagePoints(
        ip.sync_index, ip.cam_id, ip.object_id, ip.keypoint_id, ip.img_xy,
        np.full((len(ip), 3), np.nan), ip.frame_time,
    )


@pytest.fixture(scope="module")
def markerless_volume(tmp_path_factory):
    # many frames so pooled correspondences span a volume (coplanarity breaker)
    from tests.fixture_cache import per_run_cached

    scene = default_ring_scene(noise_sigma_px=0.5, n_frames=25)

    def compute():
        ip = _strip_obj_loc(scene.image_points_noisy())
        cams = strip_extrinsics(scene.cameras)  # keeps true intrinsics (epipolar precondition)
        return CaptureVolume.bootstrap(ip, cams)

    return scene, per_run_cached(tmp_path_factory, "epipolar_markerless", compute)


def _aligned_center_errors(scene, volume):
    gt = {cid: -c.rotation.T @ c.translation for cid, c in scene.cameras.cameras.items()}
    est = {cid: -c.rotation.T @ c.translation for cid, c in volume.camera_array.posed_cameras.items()}
    ids = sorted(set(gt) & set(est))
    src = np.array([est[c] for c in ids])
    dst = np.array([gt[c] for c in ids])
    s, R, t = umeyama(src, dst, with_scale=True)
    aligned = float(np.asarray(s)) * (np.asarray(R) @ src.T).T + np.asarray(t)
    return np.linalg.norm(aligned - dst, axis=1)


class TestEpipolarBootstrap:
    def test_all_cameras_posed(self, markerless_volume):
        scene, volume = markerless_volume
        assert len(volume.camera_array.posed_cameras) == len(scene.cameras.cameras)

    def test_rig_shape_recovered_up_to_similarity(self, markerless_volume):
        scene, volume = markerless_volume
        errs = _aligned_center_errors(scene, volume)
        # scale is arbitrary; after similarity alignment centers within 2 cm
        assert errs.max() < 0.02, errs

    def test_ba_refines_markerless_rig(self, markerless_volume):
        scene, volume = markerless_volume
        optimized = volume.optimize()
        assert optimized.reprojection_report.overall_rmse < volume.reprojection_report.overall_rmse
        errs = _aligned_center_errors(scene, optimized)
        assert errs.max() < 0.01

    def test_dispatch_requires_real_intrinsics(self):
        """Pipeline gate: markerless + blind intrinsics must refuse
        (reference calibrate_extrinsics.py:84-93)."""
        from caliscope_tpu.exceptions import CalibrationError
        from caliscope_tpu.pipelines import calibrate_extrinsics
        from caliscope_tpu.synthetic.camera_synthesizer import strip_intrinsics

        scene = default_ring_scene(noise_sigma_px=0.5, n_frames=6)
        ip = _strip_obj_loc(scene.image_points_noisy())
        blind = strip_intrinsics(strip_extrinsics(scene.cameras))
        with pytest.raises(CalibrationError, match="[Ee]pipolar"):
            calibrate_extrinsics(ip, blind, None)
