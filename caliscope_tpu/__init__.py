"""caliscope-tpu: TPU-native multicamera calibration + 3D reconstruction.

A ground-up JAX/XLA/Pallas framework with the capabilities of mprib/caliscope
(multicamera intrinsic/extrinsic calibration, pose-network bootstrapping,
sparse bundle adjustment, triangulation, reconstruction + export), re-designed
TPU-first:

- One differentiable projection function (Brown-Conrady + fisheye-equidistant)
  from which residuals, Jacobians, PnP, and triangulation all derive.
- Batched, padded, statically-shaped kernels (vmap over groups) in place of
  per-item OpenCV calls.
- Bundle adjustment as Levenberg-Marquardt with matrix-free normal equations
  (segment-sum J^T J products) + Schur/block-Jacobi preconditioned CG,
  distributable over a `jax.sharding.Mesh` by sharding the observation axis.

Precision note: calibration mathematics is dtype-polymorphic. Accuracy-critical
CPU runs should enable x64 (`JAX_ENABLE_X64=1`); TPU runs use float32 with
Jacobi column scaling (see solvers/bundle.py).
"""

__version__ = "0.1.0"

from caliscope_tpu.cameras import CameraData, CameraArray  # noqa: F401
from caliscope_tpu.observations import ImagePoints, WorldPoints, STATIC_SYNC_INDEX  # noqa: F401
from caliscope_tpu.exceptions import CalibrationError, CalibrationWarning  # noqa: F401
