"""Per-camera vertical (gravity "up") estimation from footage.

Parity: reference src/caliscope/estimators/vertical.py (GeoCalib
perspective-field ONNX spec :56-62, sampled frames, per-frame gravity fit,
aggregated per-camera up vector estimate_vertical:226) and model_store.py
(ensure_model:40).

The network inference is host-side (onnxruntime, gated); the per-frame
gravity fit is the JAX solver (vertical_solver.py). For environments without
the model, `estimate_vertical_from_fields` accepts precomputed up-fields —
the estimator math is fully exercised without the network.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Mapping, Optional

import numpy as np

from caliscope_tpu.exceptions import CalibrationError
from caliscope_tpu.estimators.vertical_solver import GravityFit, fit_gravity

logger = logging.getLogger(__name__)

# Public GeoCalib perspective-field export (same model the reference pins).
GEOCALIB_URL = "https://github.com/mprib/caliscope/releases/download/v0.9.0/geocalib_perspective_fields.onnx"
GEOCALIB_FILENAME = "geocalib_perspective_fields.onnx"

# GeoCalib's fixed preprocessing geometry (reference estimators/vertical.py:
# NET_SHORT_SIDE/EDGE_MULTIPLE): frames are resized so the short side is 320
# with both edges multiples of 32 before entering the field network.
NET_SHORT_SIDE = 320
EDGE_MULTIPLE = 32

# The four dense outputs the network emits, in the ONNX graph's output
# order (reference estimators/vertical.py::FIELD_NAMES; the architecture
# mirror in estimators/geocalib_arch.py emits exactly this contract).
FIELD_NAMES = ("up_field", "up_confidence", "latitude_field", "latitude_confidence")


@dataclass(frozen=True)
class VerticalEstimate:
    """Per-camera up vector (camera frame, unit) + agreement diagnostics."""

    up_by_camera: dict[int, np.ndarray]
    residual_deg_by_camera: dict[int, float]
    n_frames_by_camera: dict[int, int]

    @property
    def cam_ids(self) -> list[int]:
        return sorted(self.up_by_camera)


def ensure_model(models_dir: Path | str) -> Path:
    """Download the perspective-field model if absent (reference
    model_store.py:40)."""
    from caliscope_tpu.pose.model_card import ModelCard
    from caliscope_tpu.pose.model_download import ensure_model as _ensure

    models_dir = Path(models_dir)
    card = ModelCard(
        name="GeoCalib perspective fields",
        model_path=models_dir / GEOCALIB_FILENAME,
        format="heatmap",
        input_width=320,
        input_height=240,
        confidence_threshold=0.0,
        point_name_to_id={},
        wireframe=None,
        source_url=GEOCALIB_URL,
        extraction="direct",
    )
    return _ensure(card)


def _infer_up_field(session, frame: np.ndarray) -> tuple[np.ndarray, Optional[np.ndarray]]:
    """Run the perspective-field network -> (up_field (H, W, 2), weights)."""
    import cv2

    inp = session.get_inputs()[0]
    _n, _c, h, w = inp.shape
    img = cv2.resize(frame, (int(w), int(h)))
    if img.ndim == 2:
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    blob = (img.astype(np.float32) / 255.0).transpose(2, 0, 1)[None]
    outputs = session.run(None, {inp.name: blob})
    up = np.asarray(outputs[0])[0]  # (2, h, w) expected
    field = np.moveaxis(up[:2], 0, -1)
    weights = None
    if len(outputs) > 1:
        conf = np.asarray(outputs[1])[0]
        weights = conf[0] if conf.ndim == 3 else conf
    return field, weights


def estimate_vertical_from_fields(
    fields_by_camera: Mapping[int, list[np.ndarray]],
    K_by_camera: Mapping[int, np.ndarray],
) -> VerticalEstimate:
    """Aggregate per-frame gravity fits into a per-camera up vector.

    fields are (H, W, 2) up-fields in each camera's (possibly resized) frame;
    K must correspond to the field resolution.
    """
    ups: dict[int, np.ndarray] = {}
    residuals: dict[int, float] = {}
    counts: dict[int, int] = {}
    for cid, fields in fields_by_camera.items():
        fits: list[GravityFit] = [fit_gravity(f, np.asarray(K_by_camera[cid])) for f in fields]
        good = [f for f in fits if f.inlier_fraction > 0.5]
        if not good:
            logger.warning(f"Camera {cid}: no usable gravity fits; skipping")
            continue
        vecs = np.stack([f.gravity_cam for f in good])
        # robust average on the sphere: normalize mean after sign alignment
        ref = vecs[0]
        vecs = vecs * np.sign(vecs @ ref)[:, None]
        mean = vecs.mean(axis=0)
        mean /= np.linalg.norm(mean)
        # camera "up" is opposite gravity
        ups[cid] = -mean
        residuals[cid] = float(np.median([f.residual_deg for f in good]))
        counts[cid] = len(good)
    if not ups:
        raise CalibrationError("Vertical estimation produced no usable per-camera fits.")
    return VerticalEstimate(ups, residuals, counts)


def estimate_vertical(
    videos: Mapping[int, Path],
    K_by_camera: Mapping[int, np.ndarray],
    models_dir: Path | str,
    n_sample_frames: int = 6,
) -> VerticalEstimate:
    """Full path: sample frames -> perspective-field network -> gravity fits.

    Requires onnxruntime + the GeoCalib model (downloaded on first use)."""
    from caliscope_tpu.media import FrameSource, read_video_properties
    from caliscope_tpu.pose.onnx_tracker import create_inference_session

    model_path = ensure_model(models_dir)
    session = create_inference_session(model_path)

    fields: dict[int, list[np.ndarray]] = {}
    Ks: dict[int, np.ndarray] = {}
    for cid, video in videos.items():
        props = read_video_properties(video)
        wanted = set(np.linspace(0, max(props.frame_count - 1, 0), n_sample_frames, dtype=int).tolist())
        cam_fields = []
        with FrameSource(video, cid, wanted_indices=wanted) as src:
            for pkt in src:
                field, _w = _infer_up_field(session, pkt.frame)
                cam_fields.append(field)
                if len(cam_fields) == 1:
                    fh, fw = field.shape[:2]
                    K = np.asarray(K_by_camera[cid], dtype=float).copy()
                    sx, sy = fw / props.width, fh / props.height
                    K[0] *= sx
                    K[1] *= sy
                    Ks[cid] = K
        fields[cid] = cam_fields
    return estimate_vertical_from_fields(fields, Ks)
