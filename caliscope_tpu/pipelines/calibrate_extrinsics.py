"""Production extrinsic-calibration pipeline with all gates and guards.

Parity: reference src/caliscope/core/calibrate_extrinsics.py:44-391 —
blind-intrinsics synthesis, epipolar intrinsic-quality gate (:84-93),
two-sided identity validation (:328), point remaps, bootstrap, cross-face
linkage guard (:132-143), static-marker rigidity guard with re-bootstrap
(:148-198), linear BA -> depth-ratio gate (:215-226) -> robust soft_l1 BA
(f_scale = 1 px) -> percentile filter (2.5%) -> final BA -> CalibrationRun.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from caliscope_tpu.cameras import CameraArray
from caliscope_tpu.constraints import ConstraintSet, RigidityReport
from caliscope_tpu.exceptions import CalibrationError
from caliscope_tpu.observations import ImagePoints
from caliscope_tpu.scale import compute_depth_ratios
from caliscope_tpu.tasks import CancellationToken
from caliscope_tpu.volume import CaptureVolume

logger = logging.getLogger(__name__)

# Below this per-camera near/far depth ratio, focal length is not jointly
# observable with extrinsics: refining drifts f and couples scale error into
# translation (reference calibrate_extrinsics.py:27-32).
MIN_DEPTH_RATIO_FOR_INTRINSIC_REFINEMENT = 2.0


@dataclass(frozen=True)
class IntrinsicEstimate:
    """Recovered vs initial free intrinsics for one camera
    (reference bundle_parameterization.py:26)."""

    cam_id: int
    f_recovered: float
    k1_recovered: float
    k2_recovered: float
    f_initial: float
    k1_initial: float
    k2_initial: float

    @property
    def f_change_pct(self) -> float:
        return 100.0 * (self.f_recovered - self.f_initial) / self.f_initial


@dataclass(frozen=True)
class CalibrationRun:
    capture_volume: CaptureVolume
    intrinsic_estimates: tuple[IntrinsicEstimate, ...]
    synthesized_cam_ids: frozenset[int]
    dropped_static_markers: tuple[int, ...]
    intrinsic_refinement_gated: bool


def calibrate_extrinsics(
    image_points: ImagePoints,
    camera_array: CameraArray,
    constraints: Optional[ConstraintSet],
    *,
    refine_intrinsics: bool = True,
    filter_percentile: float = 2.5,
    cancellation_token: Optional[CancellationToken] = None,
    progress: Optional[Callable[[int, str], None]] = None,
) -> CalibrationRun:
    """Run the full extrinsic calibration pipeline (see module docstring)."""

    def _progress(pct: int, msg: str) -> None:
        if progress is not None:
            progress(pct, msg)

    def _check_cancelled() -> None:
        if cancellation_token is not None and cancellation_token.is_cancelled:
            raise InterruptedError("Calibration cancelled")

    # 1. Prepare cameras: synthesize blind intrinsics where missing
    _progress(5, "Preparing cameras")
    cameras = camera_array.copy()
    synthesized: set[int] = set()
    for cam in cameras.cameras.values():
        if cam.ignore:
            continue
        if cam.matrix is None or cam.distortions is None:
            synthesized.add(cam.cam_id)
            cam.synthesize_default_intrinsics()

    # Epipolar intrinsic-quality gate: with no obj_loc anchor the
    # essential-matrix decomposition cannot absorb focal error, so blind
    # intrinsics yield geometrically wrong (not merely mis-scaled) poses.
    obj_absent = not image_points.any_obj_loc
    if obj_absent and synthesized:
        raise CalibrationError(
            f"Epipolar bootstrap requires calibrated intrinsics, but cameras {sorted(synthesized)} "
            f"have none and fell back to blind defaults (f=width/2). The essential-matrix "
            f"decomposition has no object-geometry anchor to absorb focal-length error, so blind "
            f"intrinsics yield geometrically wrong poses (not merely mis-scaled ones). Supply real "
            f"intrinsics first -- run charuco intrinsic calibration for these cameras -- then "
            f"re-run extrinsic calibration."
        )

    # 2. Capture initial intrinsic anchors
    anchors: dict[int, tuple[float, float, float]] = {}
    for cam in cameras.cameras.values():
        if cam.ignore or cam.matrix is None or cam.distortions is None:
            continue
        anchors[cam.cam_id] = (float(cam.matrix[0, 0]), float(cam.distortions[0]), float(cam.distortions[1]))

    # Two-sided identity guard: extraction identity scheme must match the
    # configured thickness, else cross-face rows silently vanish.
    if constraints is not None and constraints.back_face_thickness_m is not None:
        _validate_two_sided_extraction(image_points, constraints.back_face_thickness_m)

    # Apply zero-thickness mirror remaps before any bootstrap/PnP stage.
    if constraints is not None:
        image_points = constraints.remap_image_points(image_points)

    _check_cancelled()

    # 3. Bootstrap
    _progress(15, "Bootstrapping poses")
    capture_volume = CaptureVolume.bootstrap(image_points, cameras, constraints=constraints)

    # Cross-face linkage guard for thick two-sided boards.
    if constraints is not None and (constraints.back_face_thickness_m or 0) > 0:
        firing = _count_firing_cross_face_rows(capture_volume.world_points, constraints.distances)
        total = sum(1 for d in constraints.distances if d.object_id_a != d.object_id_b)
        logger.info(f"Cross-face constraints firing: {firing}/{total} rows across all sync indices")
        if firing == 0:
            raise CalibrationError(
                "No cross-face constraint fires: no sync index has both the front and the "
                "mirrored face triangulated (each face needs >= 2 cameras simultaneously). "
                "The front-viewing and back-viewing camera groups have no rigid link, so "
                "calibration would be arbitrary. Capture footage where the board is seen "
                "from both sides at the same instants."
            )

    _check_cancelled()

    # 4. Static-marker guard: drop static markers that moved, re-bootstrap
    dropped_markers: list[int] = []
    if constraints is not None and constraints.static_object_ids:
        report = capture_volume.rigidity_report()
        intra = report.object_pairs[:, 0] == report.object_pairs[:, 1]
        intra_report = RigidityReport(
            report.expected[intra], report.actual[intra], report.object_pairs[intra]
        )
        obj_rmse = intra_report.per_object_rmse_mm
        for obj_id in sorted(constraints.static_object_ids):
            rmse = obj_rmse.get(obj_id, 0.0)
            max_intra_mm = _max_intra_distance_mm(constraints, obj_id)
            if max_intra_mm > 0 and rmse > 0.25 * max_intra_mm:
                logger.warning(
                    f"Dropping static marker {obj_id}: rigidity RMSE {rmse:.1f}mm "
                    f"> 25% of max intra-distance {max_intra_mm:.1f}mm"
                )
                dropped_markers.append(obj_id)

        if dropped_markers:
            dropped_set = set(dropped_markers)
            image_points = image_points.select(~np.isin(image_points.object_id, list(dropped_set)))
            constraints = ConstraintSet(
                distances=tuple(
                    d for d in constraints.distances
                    if d.object_id_a not in dropped_set and d.object_id_b not in dropped_set
                ),
                static_object_ids=constraints.static_object_ids - frozenset(dropped_set),
                centroid_distances=tuple(
                    c for c in constraints.centroid_distances
                    if c.object_id_a not in dropped_set and c.object_id_b not in dropped_set
                ),
                point_remaps=constraints.point_remaps,
            )
            _progress(20, "Re-bootstrapping after dropping markers")
            cameras = camera_array.copy()
            for cam in cameras.cameras.values():
                if cam.ignore:
                    continue
                if cam.cam_id in synthesized:
                    cam.synthesize_default_intrinsics()
            capture_volume = CaptureVolume.bootstrap(image_points, cameras, constraints=constraints)

    _check_cancelled()

    # 5. Linear optimize — reach the basin; always extrinsics-only.
    _progress(40, "Optimizing")
    capture_volume = capture_volume.optimize(refine_intrinsics=False)

    _check_cancelled()

    # Depth-ratio gate: NaN >= threshold is False, so a degenerate camera
    # gates refinement off naturally via all().
    depth_ratios = compute_depth_ratios(capture_volume.camera_array, capture_volume.world_points)
    effective_refine = (
        refine_intrinsics
        and bool(depth_ratios)
        and all(r >= MIN_DEPTH_RATIO_FOR_INTRINSIC_REFINEMENT for r in depth_ratios.values())
    )
    intrinsic_refinement_gated = refine_intrinsics and not effective_refine
    if intrinsic_refinement_gated:
        logger.warning(
            f"Intrinsic refinement requested but gated off (need every camera >= "
            f"{MIN_DEPTH_RATIO_FOR_INTRINSIC_REFINEMENT}). Per-camera depth ratios: {depth_ratios}"
        )

    # 6. Robust refinement (soft_l1 at 1 px inlier scale, warm-started)
    _progress(55, "Robust refinement")
    f_scale = capture_volume.pixel_f_scale(px=1.0)
    capture_volume = capture_volume.optimize(
        refine_intrinsics=effective_refine,
        loss="soft_l1",
        f_scale=f_scale,
        max_nfev=200,
        ftol=1e-4,
        strict=False,
    )

    _check_cancelled()

    # 7. Filter outliers
    _progress(75, "Filtering outliers")
    capture_volume = capture_volume.filter_by_percentile_error(filter_percentile)

    _check_cancelled()

    # 8. Final optimize on clean data
    _progress(90, "Re-optimizing")
    capture_volume = capture_volume.optimize(refine_intrinsics=effective_refine)

    _progress(100, "Optimization complete")
    return _build_run(
        capture_volume=capture_volume,
        anchors=anchors,
        synthesized_cam_ids=frozenset(synthesized),
        dropped_static_markers=tuple(dropped_markers),
        intrinsic_refinement_gated=intrinsic_refinement_gated,
    )


def refresh_run(previous: CalibrationRun, capture_volume: CaptureVolume) -> CalibrationRun:
    """Rebuild the run around a re-optimized capture volume (anchors and
    provenance preserved, estimates recomputed)."""
    anchors = {e.cam_id: (e.f_initial, e.k1_initial, e.k2_initial) for e in previous.intrinsic_estimates}
    return _build_run(
        capture_volume=capture_volume,
        anchors=anchors,
        synthesized_cam_ids=previous.synthesized_cam_ids,
        dropped_static_markers=previous.dropped_static_markers,
        intrinsic_refinement_gated=previous.intrinsic_refinement_gated,
    )


def _build_run(capture_volume, anchors, synthesized_cam_ids, dropped_static_markers, intrinsic_refinement_gated):
    estimates = []
    for cam_id, cam in capture_volume.camera_array.posed_cameras.items():
        if cam_id not in anchors or cam.matrix is None or cam.distortions is None:
            continue
        f0, k10, k20 = anchors[cam_id]
        estimates.append(
            IntrinsicEstimate(
                cam_id=cam_id,
                f_recovered=float(cam.matrix[0, 0]),
                k1_recovered=float(cam.distortions[0]),
                k2_recovered=float(cam.distortions[1]),
                f_initial=f0,
                k1_initial=k10,
                k2_initial=k20,
            )
        )
    return CalibrationRun(
        capture_volume=capture_volume,
        intrinsic_estimates=tuple(estimates),
        synthesized_cam_ids=synthesized_cam_ids,
        dropped_static_markers=dropped_static_markers,
        intrinsic_refinement_gated=intrinsic_refinement_gated,
    )


def _max_intra_distance_mm(constraints: ConstraintSet, object_id: int) -> float:
    max_d = 0.0
    for dc in constraints.distances:
        if dc.object_id_a == object_id and dc.object_id_b == object_id:
            max_d = max(max_d, dc.distance)
    return max_d * 1000.0


def _validate_two_sided_extraction(image_points: ImagePoints, thickness_m: float) -> None:
    """Extraction identity scheme vs configured thickness — a drift between
    the two silently drops cross-face rows while mis-calibrating
    (reference calibrate_extrinsics.py:328-391)."""
    observed = {int(o) for o in np.unique(image_points.object_id)}
    expected = {0, 1} if thickness_m > 0 else {0}
    if observed != expected:
        if thickness_m > 0 and 1 not in observed:
            detail = (
                "board thickness is set but the extraction has no back-face observations "
                "(object_id 1). Either the extraction predates the thickness setting "
                "(re-extract), or no camera ever saw the mirrored face (a two-sided "
                "calibration needs both faces in view; if only one face was filmed, "
                "set thickness to 0)."
            )
        elif thickness_m == 0 and 1 in observed:
            detail = (
                "the extraction contains back-face observations (object_id 1) but board "
                "thickness is 0. Re-extract, or restore the thickness the extraction was made with."
            )
        else:
            detail = "re-extract with the current board configuration."
        raise CalibrationError(
            f"Extraction/config identity mismatch: observed object_ids {sorted(observed)}, "
            f"configured thickness implies {sorted(expected)} — {detail}"
        )
    if thickness_m > 0:
        back_z = image_points.obj_loc[image_points.object_id == 1, 2]
        extracted_t = float(back_z[0])
        if abs(extracted_t - thickness_m) > 1e-9:
            raise CalibrationError(
                f"Board thickness changed since extraction: extraction carries back-face "
                f"obj_loc z={extracted_t * 100:.2f}cm but configured thickness is "
                f"{thickness_m * 100:.2f}cm. Re-extract, or restore the original thickness."
            )


def _count_firing_cross_face_rows(world_points, distances) -> int:
    lookup: dict[tuple[int, int], set[int]] = {}
    for si, oid, kid in zip(world_points.sync_index, world_points.object_id, world_points.keypoint_id):
        lookup.setdefault((int(oid), int(kid)), set()).add(int(si))
    firing = 0
    for d in distances:
        if d.object_id_a == d.object_id_b:
            continue
        if lookup.get((d.object_id_a, d.keypoint_id_a), set()) & lookup.get((d.object_id_b, d.keypoint_id_b), set()):
            firing += 1
    return firing
