"""Concrete trackers: charuco, aruco, chessboard.

Parity: reference src/caliscope/trackers/ (charuco_tracker.py:16,
aruco_tracker.py:33, chessboard_tracker.py:50). Detection delegates to the
TPU-native kernels in caliscope_tpu.detect instead of OpenCV's C++ stack.
"""

from caliscope_tpu.trackers.charuco_tracker import CharucoTracker  # noqa: F401
from caliscope_tpu.trackers.aruco_tracker import ArucoTracker  # noqa: F401
from caliscope_tpu.trackers.chessboard_tracker import ChessboardTracker  # noqa: F401
