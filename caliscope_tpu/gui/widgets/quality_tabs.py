"""Calibration-quality inspector: reprojection / rigidity / scale tabs.

Parity: reference gui/widgets/calibration_quality_tabs.py (+
scale_detail_dialog.py, distance_sparkline.py) — per-camera RMSE table,
error histogram strip, constraint-rigidity detail, scale-cue agreement.
"""

from __future__ import annotations

import numpy as np

from caliscope_tpu.gui.qt import (
    QLabel,
    QTableWidget,
    QTableWidgetItem,
    QTabWidget,
    QVBoxLayout,
    QWidget,
)
from caliscope_tpu.gui.rendering import colorize, to_pixmap


class DistanceSparkline(QLabel):
    """Tiny inline histogram of reprojection errors (reference
    distance_sparkline.py renders with QPainter; this rasterizes to numpy)."""

    def __init__(self, parent=None, width: int = 320, height: int = 48):
        super().__init__(parent)
        self._w, self._h = width, height
        self.bin_counts: np.ndarray = np.zeros(0)

    def set_errors(self, errors: np.ndarray, n_bins: int = 48) -> None:
        errors = np.asarray(errors)
        if len(errors) == 0:
            self.bin_counts = np.zeros(0)
            self.setPixmap(to_pixmap(np.zeros((self._h, self._w, 3), np.uint8)))
            return
        hi = max(float(np.percentile(errors, 99)), 1e-6)
        hist, _ = np.histogram(errors, bins=n_bins, range=(0.0, hi))
        self.bin_counts = hist
        img = np.zeros((self._h, self._w, 3), np.uint8)
        img[:] = (18, 20, 26)
        peak = hist.max()
        bw = self._w // n_bins
        for i, c in enumerate(hist):
            bar = 0 if peak == 0 else int(round((self._h - 2) * c / peak))
            if bar:
                color = colorize(np.array([[i / n_bins]]))[0, 0]
                img[self._h - bar :, i * bw : (i + 1) * bw] = color
        self.setPixmap(to_pixmap(img))


class CalibrationQualityTabs(QTabWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        # reprojection tab
        repro = QWidget()
        rl = QVBoxLayout(repro)
        self.summary = QLabel("No calibration yet.")
        self.summary.setWordWrap(True)
        rl.addWidget(self.summary)
        self.sparkline = DistanceSparkline()
        rl.addWidget(self.sparkline)
        self.rmse_table = QTableWidget(0, 3)
        self.rmse_table.setHorizontalHeaderLabels(["camera", "RMSE px", "unmatched"])
        rl.addWidget(self.rmse_table)
        self.addTab(repro, "Reprojection")

        # rigidity tab
        rigid = QWidget()
        gl = QVBoxLayout(rigid)
        self.rigidity_summary = QLabel("No constraints in play.")
        self.rigidity_summary.setWordWrap(True)
        gl.addWidget(self.rigidity_summary)
        self.rigidity_table = QTableWidget(0, 2)
        self.rigidity_table.setHorizontalHeaderLabels(["object", "RMSE mm"])
        gl.addWidget(self.rigidity_table)
        self.addTab(rigid, "Rigidity")

        # scale tab
        scale = QWidget()
        sl = QVBoxLayout(scale)
        self.scale_summary = QLabel("No scale cues.")
        self.scale_summary.setWordWrap(True)
        sl.addWidget(self.scale_summary)
        self.addTab(scale, "Scale")

    def update_from_volume(self, volume) -> None:
        rep = volume.reprojection_report
        self.summary.setText(rep.summary())
        self.sparkline.set_errors(rep.raw_errors.euclidean_error)
        by_cam = sorted(rep.by_camera.items())
        self.rmse_table.setRowCount(len(by_cam))
        for i, (cid, rmse) in enumerate(by_cam):
            self.rmse_table.setItem(i, 0, QTableWidgetItem(str(cid)))
            self.rmse_table.setItem(i, 1, QTableWidgetItem(f"{rmse:.3f}"))
            self.rmse_table.setItem(i, 2, QTableWidgetItem(str(rep.unmatched_by_camera.get(cid, 0))))

        if volume.constraints is not None:
            rr = volume.rigidity_report()
            if rr.n_violations:
                self.rigidity_summary.setText(
                    f"{rr.n_violations} constrained distances: RMSE {rr.rmse_mm:.2f} mm "
                    f"({rr.relative_rmse_pct:.2f}%), worst {rr.max_violation_mm:.2f} mm"
                )
                per_obj = sorted(rr.per_object_rmse_mm.items())
                self.rigidity_table.setRowCount(len(per_obj))
                for i, (oid, mm) in enumerate(per_obj):
                    self.rigidity_table.setItem(i, 0, QTableWidgetItem(str(oid)))
                    self.rigidity_table.setItem(i, 1, QTableWidgetItem(f"{mm:.2f}"))
            else:
                self.rigidity_summary.setText("Constraints present, none measurable yet.")
        else:
            self.rigidity_summary.setText("No constraints in play.")

        sr = volume.compute_volumetric_scale_accuracy()
        if sr.n_frames_sampled:
            worst = sr.worst_frame
            self.scale_summary.setText(
                f"Volumetric scale over {sr.n_frames_sampled} frames: pooled RMSE "
                f"{sr.pooled_rmse_mm:.2f} mm, median {sr.median_rmse_mm:.2f} mm, bias "
                f"{sr.mean_signed_error_mm:+.2f} mm; worst frame sync {worst.sync_index} "
                f"({worst.distance_rmse_mm:.2f} mm)"
            )
        else:
            self.scale_summary.setText("No scale cues (no known-geometry targets observed).")
