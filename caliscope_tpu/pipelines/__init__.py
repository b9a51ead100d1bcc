"""Use-case pipelines (L4): production calibration + reconstruction flows.

Parity: reference src/caliscope/core/calibrate_extrinsics.py,
core/calibrate_intrinsics.py, core/process_synchronized_recording.py,
reconstruction/reconstruct_xyz.py.
"""

from caliscope_tpu.pipelines.calibrate_extrinsics import (  # noqa: F401
    CalibrationRun,
    calibrate_extrinsics,
    refresh_run,
    MIN_DEPTH_RATIO_FOR_INTRINSIC_REFINEMENT,
)
