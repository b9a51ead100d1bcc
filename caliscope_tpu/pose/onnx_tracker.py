"""Generic ONNX pose tracker driven by a model card.

Parity: reference src/caliscope/trackers/onnx_tracker.py:24-395 — letterbox
preprocessing (:82-129), per-camera bbox tracking state (:69), scan-positions
fallback (:252), rotation handling — and onnx_session.py:18 (EP selection).
Inference runs on the host via onnxruntime (gated import: environments
without ORT get a clear error at construction, not at import). Decoding is
the batched JAX kernel (pose/decode.py).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import numpy as np

from caliscope_tpu.exceptions import CalibrationError
from caliscope_tpu.packets import PixelFormat, PointPacket
from caliscope_tpu.pose.decode import decode_heatmap, decode_simcc
from caliscope_tpu.pose.model_card import ModelCard
from caliscope_tpu.tracker import Tracker, WireFrameView

logger = logging.getLogger(__name__)


def create_inference_session(model_path, prefer_gpu: bool = True, engine: str = "auto"):
    """Inference session for an .onnx model.

    engine:
      'auto' (default) — the first-party JAX executor (pose/onnx_jax.py):
          the whole network compiles to one XLA program and runs on the
          default JAX device (the TPU when present). Falls back to
          onnxruntime only when the graph uses ops the executor lacks AND
          ORT is installed.
      'jax' — JAX executor, no fallback.
      'ort' — onnxruntime with provider auto-select (reference
          onnx_session.py:18 behavior).
    """
    if engine in ("auto", "jax"):
        from caliscope_tpu.pose.onnx_jax import OnnxJaxSession, _Executor
        from caliscope_tpu.pose.onnx_proto import load_model

        model = load_model(model_path)
        missing = sorted(
            {n.op_type for n in model.graph.nodes if not hasattr(_Executor, f"op_{n.op_type}")}
        )
        if not missing:
            return OnnxJaxSession(model)
        if engine == "jax":
            raise CalibrationError(
                f"The JAX ONNX executor does not implement: {', '.join(missing)} "
                f"(model {model_path})."
            )
        logger.warning(f"JAX executor lacks ops {missing}; trying onnxruntime for {model_path}")

    try:
        import onnxruntime as ort
    except ImportError as e:
        raise CalibrationError(
            "This model needs onnxruntime (ops missing from the built-in JAX "
            "executor), which is not installed. Install onnxruntime, or use a "
            "calibration-target tracker (charuco/aruco/chessboard) instead."
        ) from e
    providers = ort.get_available_providers()
    chosen = [p for p in ("CUDAExecutionProvider", "CPUExecutionProvider") if p in providers]
    if not prefer_gpu:
        chosen = ["CPUExecutionProvider"]
    return ort.InferenceSession(str(model_path), providers=chosen or None)


@dataclass
class _BBox:
    x0: float
    y0: float
    x1: float
    y1: float

    def expand(self, frac: float, w: int, h: int) -> "_BBox":
        dx = (self.x1 - self.x0) * frac
        dy = (self.y1 - self.y0) * frac
        return _BBox(
            max(0.0, self.x0 - dx), max(0.0, self.y0 - dy),
            min(float(w), self.x1 + dx), min(float(h), self.y1 + dy),
        )


def letterbox(frame: np.ndarray, box: _BBox, out_w: int, out_h: int):
    """Crop box -> aspect-preserving resize onto a padded canvas.

    Returns (canvas (out_h, out_w, 3) float32, scale, offset (2,)) with
    image_xy = offset + model_xy / scale (reference onnx_tracker.py:82-129).
    """
    import cv2

    x0, y0 = int(box.x0), int(box.y0)
    x1, y1 = int(np.ceil(box.x1)), int(np.ceil(box.y1))
    crop = frame[y0:y1, x0:x1]
    if crop.ndim == 2:
        crop = np.repeat(crop[..., None], 3, axis=2)
    ch, cw = crop.shape[:2]
    if ch == 0 or cw == 0:
        return np.zeros((out_h, out_w, 3), np.float32), 1.0, np.zeros(2)
    scale = min(out_w / cw, out_h / ch)
    nw, nh = int(round(cw * scale)), int(round(ch * scale))
    resized = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((out_h, out_w, 3), np.float32)
    px, py = (out_w - nw) // 2, (out_h - nh) // 2
    canvas[py : py + nh, px : px + nw] = resized
    offset = np.array([x0 - px / scale, y0 - py / scale])
    return canvas, scale, offset


class OnnxTracker(Tracker):
    """Model-card-driven pose tracker with per-camera bbox tracking."""

    def __init__(self, card: ModelCard, prefer_gpu: bool = True):
        self.card = card
        if not card.onnx_exists:
            raise CalibrationError(
                f"Model file not found: {card.model_path}. Download it first "
                f"(pose/model_download.py) or point the card at an existing file."
            )
        self._session = create_inference_session(card.model_path, prefer_gpu)
        self._input_name = self._session.get_inputs()[0].name
        self._bbox: dict[int, Optional[_BBox]] = {}

    @property
    def name(self) -> str:
        return self.card.name.upper().replace(" ", "_").replace("-", "_")

    @property
    def pixel_format(self) -> PixelFormat:
        return PixelFormat.BGR

    @property
    def wireframe(self) -> Optional[WireFrameView]:
        return self.card.wireframe

    def _scan_boxes(self, w: int, h: int) -> list[_BBox]:
        """Full-frame + centered crops fallback when tracking is lost
        (reference onnx_tracker.py:252)."""
        full = _BBox(0, 0, w, h)
        cx, cy = w / 2, h / 2
        half = min(w, h) / 2
        center = _BBox(cx - half, cy - half, cx + half, cy + half)
        return [full, center]

    def _infer(self, frame: np.ndarray, box: _BBox):
        canvas, scale, offset = letterbox(frame, box, self.card.input_width, self.card.input_height)
        blob = canvas.transpose(2, 0, 1)[None]  # NCHW, BGR as RTMPose SDK expects
        outputs = self._session.run(None, {self._input_name: blob})
        if self.card.format == "simcc":
            kps, conf = decode_simcc(outputs[0], outputs[1])
        elif self.card.format == "heatmap":
            hm = outputs[0]
            kps, conf = decode_heatmap(hm if hm.ndim == 4 else hm[None])
        else:
            raise CalibrationError(f"Unknown model output format: {self.card.format}")
        kps = np.asarray(kps)[0]
        conf = np.asarray(conf)[0]
        img_xy = offset[None, :] + kps / scale
        return img_xy, conf

    def _detect(self, frame: np.ndarray, cam_id: int = 0, rotation_count: int = 0) -> PointPacket:
        rot = rotation_count % 4
        work = np.rot90(frame, k=-rot) if rot else frame
        h, w = work.shape[:2]

        boxes = []
        tracked = self._bbox.get(cam_id)
        if tracked is not None:
            boxes.append(tracked.expand(0.15, w, h))
        boxes += self._scan_boxes(w, h)

        best = None
        for box in boxes:
            img_xy, conf = self._infer(work, box)
            good = conf >= self.card.confidence_threshold
            if best is None or good.sum() > best[2].sum():
                best = (img_xy, conf, good)
            if good.sum() >= 0.5 * len(conf):
                break
        img_xy, conf, good = best

        if good.any():
            pts = img_xy[good]
            self._bbox[cam_id] = _BBox(pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        else:
            self._bbox[cam_id] = None
            return PointPacket.empty()

        kp_ids = np.flatnonzero(good)
        xy = img_xy[good]
        if rot:
            xy = self._unrotate(xy, rot, frame.shape[:2], work.shape[:2])
        return PointPacket(
            object_id=np.zeros(len(kp_ids), np.int64),
            keypoint_id=kp_ids.astype(np.int64),
            img_loc=xy,
            obj_loc=None,
            confidence=conf[good],
        )

    @staticmethod
    def _unrotate(xy: np.ndarray, rot: int, orig_shape, work_shape) -> np.ndarray:
        """Map coords from the rotated working frame back to the original."""
        out = xy.copy()
        wh, ww = work_shape
        for _ in range(rot):
            # work = rot90(orig, k=-1) one step: orig_x = y, orig_y = (W_work - 1) - x
            out = np.stack([out[:, 1], ww - 1 - out[:, 0]], axis=1)
            wh, ww = ww, wh
        return out

    def get_point_name(self, keypoint_id: int) -> str:
        return self.card.keypoint_id_to_name.get(int(keypoint_id), f"kp_{keypoint_id}")

    def get_connected_points(self) -> set[tuple[int, int]]:
        if self.card.wireframe is None:
            return set()
        return set(self.card.wireframe.edges_by_id())

    def cleanup(self) -> None:
        self._session = None
