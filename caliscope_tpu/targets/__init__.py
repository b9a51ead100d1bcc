"""Calibration-target definitions (geometry-first, detection-agnostic).

Parity: reference src/caliscope/core/charuco.py, core/aruco_marker.py,
core/chessboard.py. Unlike the reference, the domain objects here carry no
OpenCV handles — board geometry, identity schemes, and constraint compilation
are pure; rendering/detection lives in caliscope_tpu.detect.
"""

from caliscope_tpu.targets.charuco import Charuco, ARUCO_DICTIONARY_CAPACITY, fit_dictionary_pool  # noqa: F401
from caliscope_tpu.targets.chessboard import Chessboard  # noqa: F401
from caliscope_tpu.targets.aruco import ArucoMarker, ArucoMarkerSet, DistanceLink, MirrorPair  # noqa: F401
