"""TPU-native detection kernels (perception layer compute).

Replaces the OpenCV C++ detection stack the reference delegates to
(cv2.aruco.ArucoDetector/CharucoDetector, findChessboardCorners,
cornerSubPix — reference src/caliscope/trackers/*.py) with batched,
statically-shaped JAX/XLA programs:

- threshold + connected components + quad extraction (kernels.py)
- ArUco bit sampling + dictionary decode (decode.py, dictionaries.py)
- chessboard X-corner response + NMS + subpixel refinement (corners.py)

Everything batches over a (frames, H, W) stack — per-frame Python loops only
exist at the host orchestration layer (trackers/), never in the hot path.
"""

from caliscope_tpu.detect.dictionaries import get_dictionary, ArucoDictionary  # noqa: F401
