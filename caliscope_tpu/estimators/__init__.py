"""Estimators: markerless gravity (vertical) estimation.

Parity: reference src/caliscope/estimators/ (vertical.py:292,
vertical_solver.py:297, model_store.py). The perspective-field network
(GeoCalib ONNX) stays a host-side inference step (gated on onnxruntime /
network); the gravity fit itself is a jitted JAX Levenberg-Marquardt on the
sphere with Huber loss — batched over frames.
"""

from caliscope_tpu.estimators.vertical_solver import fit_gravity, GravityFit  # noqa: F401
from caliscope_tpu.estimators.vertical import (  # noqa: F401
    VerticalEstimate,
    estimate_vertical,
    estimate_vertical_from_fields,
)
