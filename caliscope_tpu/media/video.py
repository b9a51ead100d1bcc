"""Host-side video decode: forward-only FrameSource + metadata probe + overlay
writer.

Parity: reference src/caliscope/recording/frame_source.py:28-222 (forward-only
decode, wanted_indices skip-set that decodes but skips conversion of unwanted
frames, gray extraction for GRAY trackers, thread-safe), video_utils.py
(read_video_properties:26), overlay_video_writer.py (OverlayVideoWriter:27).

The reference decodes through PyAV/FFmpeg; this build uses OpenCV's
FFmpeg-backed VideoCapture — still a host-side C decode path feeding the
device pipeline. Decode NEVER runs on the TPU; frames flow host -> device as
batched uint8 tensors via the extraction pipelines.
"""

from __future__ import annotations

import logging
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from caliscope_tpu.exceptions import CalibrationError
from caliscope_tpu.packets import FramePacket, PixelFormat

logger = logging.getLogger(__name__)


def _require_cv2():
    try:
        import cv2  # noqa: F401

        return cv2
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise CalibrationError(
            "Video decode requires OpenCV (cv2) on the host. Install opencv-python, "
            "or supply pre-extracted observations (xy CSV) instead of video."
        ) from e


@dataclass(frozen=True)
class VideoProperties:
    path: Path
    width: int
    height: int
    fps: float
    frame_count: int

    @property
    def size(self) -> tuple[int, int]:
        return (self.width, self.height)


def read_video_properties(path: Path | str) -> VideoProperties:
    """Size/fps/frame_count from container metadata (no full decode)."""
    cv2 = _require_cv2()
    path = Path(path)
    if not path.exists():
        raise CalibrationError(f"Video file not found: {path}")
    cap = cv2.VideoCapture(str(path))
    try:
        if not cap.isOpened():
            raise CalibrationError(f"Could not open video: {path}")
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
        count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if count <= 0:
            # some containers misreport; count by decoding headers only
            count = 0
            while cap.grab():
                count += 1
        return VideoProperties(path, w, h, fps, count)
    finally:
        cap.release()


class FrameSource:
    """Forward-only decoder yielding FramePackets.

    wanted_indices: frames outside the set are still decoded (forward-only
    codecs require it) but skipped without color conversion — the reference's
    decode-but-don't-convert trick (frame_source.py:142-178). GRAY output
    converts once per wanted frame. Thread-safe: one internal lock.
    """

    def __init__(
        self,
        path: Path | str,
        cam_id: int,
        *,
        wanted_indices: Optional[set[int]] = None,
        pixel_format: PixelFormat = PixelFormat.BGR,
        frame_times: Optional[dict[int, float]] = None,
        fps_fallback: float = 30.0,
        decode_threads: Optional[int] = None,
    ):
        """decode_threads caps the decoder's internal thread pool — the
        reference's per-stream thread budget (frame_source.py:28-76,
        cpu_count // n_cams) so N concurrent camera streams don't each spawn
        a full core-count ffmpeg pool. None keeps the decoder default."""
        cv2 = _require_cv2()
        self.path = Path(path)
        self.cam_id = cam_id
        self.pixel_format = pixel_format
        self.wanted_indices = wanted_indices
        self._frame_times = frame_times
        if decode_threads is not None and hasattr(cv2, "CAP_PROP_N_THREADS"):
            self._cap = cv2.VideoCapture(
                str(self.path), cv2.CAP_ANY, [cv2.CAP_PROP_N_THREADS, max(1, int(decode_threads))]
            )
        else:
            self._cap = cv2.VideoCapture(str(self.path))
        if not self._cap.isOpened():
            raise CalibrationError(f"Could not open video: {self.path}")
        self._fps = float(self._cap.get(cv2.CAP_PROP_FPS)) or fps_fallback
        self._next_index = 0
        self._lock = threading.Lock()
        self._cv2 = cv2

    @classmethod
    def from_path(cls, path: Path | str, cam_id: int = 0, **kwargs) -> "FrameSource":
        return cls(path, cam_id, **kwargs)

    def _time_for(self, index: int) -> float:
        if self._frame_times is not None and index in self._frame_times:
            return self._frame_times[index]
        return index / self._fps

    def next_frame(self) -> Optional[FramePacket]:
        """Next wanted frame, or None at end of stream."""
        with self._lock:
            while True:
                idx = self._next_index
                wanted = self.wanted_indices is None or idx in self.wanted_indices
                if wanted:
                    ok, frame = self._cap.read()
                else:
                    ok = self._cap.grab()  # decode, skip conversion
                    frame = None
                if not ok:
                    return None
                self._next_index += 1
                if not wanted:
                    continue
                if self.pixel_format is PixelFormat.GRAY and frame.ndim == 3:
                    frame = self._cv2.cvtColor(frame, self._cv2.COLOR_BGR2GRAY)
                return FramePacket(
                    cam_id=self.cam_id,
                    frame_index=idx,
                    frame_time=self._time_for(idx),
                    frame=frame,
                    pixel_format=self.pixel_format,
                )

    def __iter__(self) -> Iterator[FramePacket]:
        while True:
            pkt = self.next_frame()
            if pkt is None:
                return
            yield pkt

    def close(self) -> None:
        with self._lock:
            self._cap.release()

    def __enter__(self) -> "FrameSource":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class OverlayVideoWriter:
    """QA artifact: per-camera video with tracked points drawn on each frame
    (reference overlay_video_writer.py:27)."""

    def __init__(self, out_path: Path | str, size: tuple[int, int], fps: float):
        cv2 = _require_cv2()
        self._cv2 = cv2
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self._writer = cv2.VideoWriter(str(out_path), fourcc, fps, size)
        if not self._writer.isOpened():
            raise CalibrationError(f"Could not open video writer: {out_path}")

    def write(self, frame: np.ndarray, points: Optional[np.ndarray] = None, radius: int = 4) -> None:
        cv2 = self._cv2
        if frame.ndim == 2:
            frame = cv2.cvtColor(frame, cv2.COLOR_GRAY2BGR)
        else:
            frame = frame.copy()
        if points is not None:
            for x, y in np.asarray(points).reshape(-1, 2):
                if np.isfinite(x) and np.isfinite(y):
                    cv2.circle(frame, (int(round(x)), int(round(y))), radius, (0, 220, 40), -1)
        self._writer.write(frame)

    def close(self) -> None:
        self._writer.release()

    def __enter__(self) -> "OverlayVideoWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
