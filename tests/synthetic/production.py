"""Drive synthetic scenes through the REAL production pipeline, then
Procrustes-align to ground truth (reference tests/synthetic/production.py:36,
assertions.py:35)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from caliscope_tpu.constraints import ConstraintSet
from caliscope_tpu.observations import ImagePoints
from caliscope_tpu.ops import lie
from caliscope_tpu.ops.similarity import SimilarityParams, umeyama
from caliscope_tpu.pipelines import CalibrationRun, calibrate_extrinsics
from caliscope_tpu.synthetic.camera_synthesizer import strip_extrinsics, strip_intrinsics
from caliscope_tpu.synthetic.scene import SyntheticScene
from caliscope_tpu.volume import CaptureVolume


@dataclass
class PoseError:
    rotation_deg: float
    translation_m: float


def pose_error(estimated, ground_truth) -> PoseError:
    """Geodesic SO(3) degrees + camera-center Euclidean meters."""
    ang = float(np.asarray(lie.rotation_geodesic_angle(estimated.rotation, ground_truth.rotation)))
    pos_est = -estimated.rotation.T @ estimated.translation
    pos_gt = -ground_truth.rotation.T @ ground_truth.translation
    return PoseError(np.degrees(ang), float(np.linalg.norm(pos_est - pos_gt)))


def _camera_centers(camera_array) -> dict[int, np.ndarray]:
    return {cid: -c.rotation.T @ c.translation for cid, c in camera_array.posed_cameras.items()}


def _collinear(pts: np.ndarray) -> bool:
    c = pts - pts.mean(axis=0)
    s = np.linalg.svd(c, compute_uv=False)
    return s[1] < 1e-6 * max(s[0], 1e-12)


def align_to_ground_truth(optimized: CaptureVolume, scene: SyntheticScene) -> CaptureVolume:
    """Umeyama on camera centers (well-spread in 3D for rings); world-point
    fallback for < 3 or collinear camera sets."""
    opt_centers = _camera_centers(optimized.camera_array)
    gt_centers = _camera_centers(scene.cameras)
    shared = sorted(set(opt_centers) & set(gt_centers))
    use_cameras = len(shared) >= 3 and not _collinear(np.array([gt_centers[c] for c in shared]))
    if use_cameras:
        src = np.array([opt_centers[c] for c in shared])
        dst = np.array([gt_centers[c] for c in shared])
    else:
        gt = scene.world_points()
        gt_map = {tuple(k): x for k, x in zip(gt.keys(), gt.xyz)}
        src, dst = [], []
        for k, x in zip(optimized.world_points.keys(), optimized.world_points.xyz):
            if tuple(k) in gt_map:
                src.append(x)
                dst.append(gt_map[tuple(k)])
        src, dst = np.asarray(src), np.asarray(dst)
    s, R, t = umeyama(src, dst, with_scale=True)
    return optimized._apply_similarity(SimilarityParams(float(s), np.asarray(R), np.asarray(t)))


@dataclass(frozen=True)
class ProductionRun:
    result: CalibrationRun
    aligned_volume: CaptureVolume
    pose_errors: dict[int, PoseError]

    @property
    def max_rotation_deg(self) -> float:
        return max(e.rotation_deg for e in self.pose_errors.values())

    @property
    def max_translation_m(self) -> float:
        return max(e.translation_m for e in self.pose_errors.values())


def run_production_pipeline(
    scene: SyntheticScene,
    *,
    image_points: ImagePoints | None = None,
    constraints: ConstraintSet | None = None,
    blind: bool = False,
    refine_intrinsics: bool = True,
    filter_percentile: float = 2.5,
) -> ProductionRun:
    """Production defaults only — no solver knobs the GUI presenter lacks."""
    cameras = strip_extrinsics(scene.cameras)
    if blind:
        cameras = strip_intrinsics(cameras)
    result = calibrate_extrinsics(
        image_points if image_points is not None else scene.image_points_noisy(),
        cameras,
        constraints,
        refine_intrinsics=refine_intrinsics,
        filter_percentile=filter_percentile,
    )
    aligned = align_to_ground_truth(result.capture_volume, scene)
    errors = {
        cid: pose_error(aligned.camera_array.cameras[cid], scene.cameras.cameras[cid])
        for cid in aligned.camera_array.posed_cameras
    }
    return ProductionRun(result=result, aligned_volume=aligned, pose_errors=errors)
