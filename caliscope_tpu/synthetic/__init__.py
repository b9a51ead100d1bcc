"""Synthetic ground-truth scene engine — the test backbone.

Parity: reference src/caliscope/synthetic/ (SE3Pose, Trajectory,
CalibrationObject, CameraSynthesizer, SyntheticScene, scene factories,
outlier/visibility fault injection). Scenes fabricate exact ground truth so
the entire solver stack is tested end-to-end deterministically — the same
role "fake backends" play in distributed-systems test suites.
"""

from caliscope_tpu.synthetic.se3 import SE3Pose  # noqa: F401
from caliscope_tpu.synthetic.trajectory import Trajectory  # noqa: F401
from caliscope_tpu.synthetic.calibration_object import CalibrationObject  # noqa: F401
from caliscope_tpu.synthetic.camera_synthesizer import CameraSynthesizer, LensProfile  # noqa: F401
from caliscope_tpu.synthetic.scene import SyntheticScene  # noqa: F401
from caliscope_tpu.synthetic import factories  # noqa: F401
