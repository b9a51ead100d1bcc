"""Markerless pose tracking: model cards, decode kernels, ONNX host runtime.

Parity: reference src/caliscope/trackers/onnx_tracker.py:24, model_card.py,
model_decode.py (decode_simcc:13, decode_heatmap:69), model_download.py,
tracker_registry.py, onnx_session.py. Decoding (SimCC / heatmap) runs as
batched JAX kernels; model inference stays on the host via onnxruntime when
present (the reference keeps ORT on host too; porting specific model weights
to JAX is a per-model exercise, not framework plumbing).
"""

from caliscope_tpu.pose.model_card import ModelCard  # noqa: F401
from caliscope_tpu.pose.decode import decode_simcc, decode_heatmap  # noqa: F401
