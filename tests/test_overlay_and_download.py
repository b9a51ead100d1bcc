"""OverlayVideoWriter and model-download coverage.

The overlay writer is the QA artifact path (reference
overlay_video_writer.py:27); the download module is the model-provisioning
path (reference trackers/model_download.py:36-173). Both are exercised
offline: the writer round-trips through a real encoder, the downloader is
driven with file:// URLs so checksum/extraction/error handling run without
network access.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

import numpy as np
import pytest

from caliscope_tpu.exceptions import CalibrationError
from caliscope_tpu.media.video import OverlayVideoWriter, read_video_properties
from caliscope_tpu.pose.model_card import ModelCard
from caliscope_tpu.pose.model_download import download_model, ensure_model, sha256_of


class TestOverlayVideoWriter:
    def _read_frames(self, path: Path):
        import cv2

        cap = cv2.VideoCapture(str(path))
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)
        cap.release()
        return frames

    def test_writes_points_onto_gray_frames(self, tmp_path):
        out = tmp_path / "overlay" / "cam0.mp4"
        w, h = 128, 96
        pts = np.array([[30.0, 40.0], [90.0, 20.0]])
        with OverlayVideoWriter(out, size=(w, h), fps=12.0) as writer:
            for _ in range(5):
                writer.write(np.zeros((h, w), np.uint8), points=pts)
        frames = self._read_frames(out)
        assert len(frames) == 5
        assert frames[0].shape == (h, w, 3)
        # the overlay circle should leave bright green pixels at the point
        for x, y in pts:
            patch = frames[0][int(y) - 2 : int(y) + 3, int(x) - 2 : int(x) + 3]
            assert patch[..., 1].max() > 150, f"no overlay drawn at ({x},{y})"
        # background stays dark
        assert frames[0][5:15, 5:15].max() < 40

    def test_nonfinite_points_are_skipped(self, tmp_path):
        out = tmp_path / "cam1.mp4"
        with OverlayVideoWriter(out, size=(64, 64), fps=10.0) as writer:
            writer.write(
                np.zeros((64, 64, 3), np.uint8),
                points=np.array([[np.nan, 10.0], [np.inf, 5.0], [20.0, 20.0]]),
            )
        frames = self._read_frames(out)
        assert len(frames) == 1
        assert frames[0][18:23, 18:23, 1].max() > 150

    def test_video_properties_of_output(self, tmp_path):
        out = tmp_path / "cam2.mp4"
        with OverlayVideoWriter(out, size=(80, 60), fps=25.0) as writer:
            for _ in range(7):
                writer.write(np.full((60, 80), 128, np.uint8))
        props = read_video_properties(out)
        assert props.size == (80, 60)
        assert props.frame_count == 7
        assert abs(props.fps - 25.0) < 0.5

    def test_unwritable_target_raises(self, tmp_path):
        bad = tmp_path / "file_not_dir"
        bad.write_text("x")
        with pytest.raises((CalibrationError, OSError, NotADirectoryError)):
            OverlayVideoWriter(bad / "sub" / "out.mp4", size=(32, 32), fps=10.0)


def _card(tmp_path: Path, **kw) -> ModelCard:
    defaults = dict(
        name="toy",
        model_path=tmp_path / "models" / "toy.onnx",
        format="simcc",
        input_width=192,
        input_height=256,
        confidence_threshold=0.3,
        point_name_to_id={"nose": 0},
        wireframe=None,
    )
    defaults.update(kw)
    return ModelCard(**defaults)


class TestModelDownload:
    def test_existing_model_short_circuits(self, tmp_path):
        card = _card(tmp_path)
        card.model_path.parent.mkdir(parents=True)
        card.model_path.write_bytes(b"weights")
        assert ensure_model(card) == card.model_path

    def test_missing_without_url_raises_with_remedy(self, tmp_path):
        card = _card(tmp_path, source_url=None)
        with pytest.raises(CalibrationError, match="manually"):
            ensure_model(card)

    def test_direct_download_from_file_url(self, tmp_path):
        src = tmp_path / "payload.onnx"
        src.write_bytes(b"onnx-bytes" * 100)
        card = _card(tmp_path, source_url=src.as_uri(), sha256=sha256_of(src))
        got = ensure_model(card)
        assert got == card.model_path
        assert card.model_path.read_bytes() == src.read_bytes()

    def test_checksum_mismatch_raises_and_cleans_up(self, tmp_path):
        src = tmp_path / "payload.onnx"
        src.write_bytes(b"corrupted")
        card = _card(tmp_path, source_url=src.as_uri(), sha256="0" * 64)
        with pytest.raises(CalibrationError, match="[Cc]hecksum"):
            download_model(card)
        assert not card.model_path.exists()
        # no stray temp files left behind
        leftovers = list(card.model_path.parent.glob("*.download"))
        assert leftovers == []

    def test_zip_extraction_prefers_end2end_member(self, tmp_path):
        archive = tmp_path / "bundle.zip"
        with zipfile.ZipFile(archive, "w") as z:
            z.writestr("other/readme.txt", "hi")
            z.writestr("other/model.onnx", "decoy")
            z.writestr("deploy/end2end.onnx", "the-real-model")
        card = _card(
            tmp_path,
            source_url=archive.as_uri(),
            sha256=sha256_of(archive),
            extraction="zip_end2end",
        )
        got = download_model(card)
        assert got.read_text() == "the-real-model"

    def test_zip_falls_back_to_any_onnx(self, tmp_path):
        archive = tmp_path / "bundle.zip"
        with zipfile.ZipFile(archive, "w") as z:
            z.writestr("model.onnx", "only-model")
        card = _card(tmp_path, source_url=archive.as_uri(), extraction="zip_end2end")
        assert download_model(card).read_text() == "only-model"

    def test_zip_without_onnx_raises(self, tmp_path):
        archive = tmp_path / "bundle.zip"
        with zipfile.ZipFile(archive, "w") as z:
            z.writestr("readme.txt", "nothing here")
        card = _card(tmp_path, source_url=archive.as_uri(), extraction="zip_end2end")
        with pytest.raises(CalibrationError, match="onnx"):
            download_model(card)

    def test_unreachable_url_raises_with_manual_remedy(self, tmp_path):
        card = _card(tmp_path, source_url=(tmp_path / "absent.onnx").as_uri())
        with pytest.raises(CalibrationError, match="manually"):
            download_model(card)

    def test_progress_callback_reports_completion(self, tmp_path):
        src = tmp_path / "payload.onnx"
        src.write_bytes(b"x" * (1 << 12))
        card = _card(tmp_path, source_url=src.as_uri())
        seen: list[int] = []
        download_model(card, progress=lambda pct, msg: seen.append(pct))
        if seen:  # Content-Length is present for file:// URLs on CPython
            assert seen[-1] == 100
