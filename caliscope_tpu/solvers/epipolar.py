"""Markerless (epipolar) pose bootstrap: essential matrix + scaffold resection.

Parity: reference src/caliscope/core/bootstrap_pose/epipolar_pose_builder.py
(pooled_correspondences:67, recover_pair_pose:110, triangulate_scaffold:164,
resection_camera:183, build_epipolar_pose_network:281). Used when observations
carry no obj_loc (markerless pose tracking data).
"""

from __future__ import annotations

from caliscope_tpu.cameras import CameraArray
from caliscope_tpu.exceptions import CalibrationError
from caliscope_tpu.observations import ImagePoints

RANSAC_THRESHOLD_PX = 3.0
MIN_CORRESPONDENCES = 8
MIN_RESECTION_POINTS = 50
MAX_SCAFFOLD_CANDIDATES = 12


def build_epipolar_pose_network(image_points: ImagePoints, camera_array: CameraArray):
    """Vmapped-RANSAC essential-matrix bootstrap (implementation landing with
    the epipolar milestone)."""
    raise CalibrationError(
        "Epipolar (markerless) bootstrap is not yet available in this build; "
        "use a calibration target with known geometry (obj_loc) for now."
    )
