"""Main window + tab views (reference gui/main_widget.py:36, workspace
coordinator wiring :121-191, presenter-per-tab architecture).

Threading model: presenter work runs on TaskManager threads and presenter
signals fire there; every signal is funneled through one Qt signal
(SignalBridge.relay), which Qt delivers queued on the GUI thread — the
single cross-thread seam, mirroring the reference's Qt-signal-per-event
design without widgets ever touching worker threads.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

from PySide6.QtCore import QObject, Qt, Signal as QtSignal
from PySide6.QtWidgets import (
    QApplication,
    QCheckBox,
    QComboBox,
    QDoubleSpinBox,
    QFileDialog,
    QGridLayout,
    QGroupBox,
    QHBoxLayout,
    QLabel,
    QMainWindow,
    QMessageBox,
    QPlainTextEdit,
    QProgressBar,
    QPushButton,
    QTableWidget,
    QTableWidgetItem,
    QTabWidget,
    QVBoxLayout,
    QWidget,
)

from caliscope_tpu.workspace import Workspace

logger = logging.getLogger(__name__)


class SignalBridge(QObject):
    """Funnels presenter callbacks (worker threads) onto the GUI thread."""

    relay = QtSignal(str, tuple)

    def forward(self, name: str):
        def _fn(*args):
            self.relay.emit(name, args)

        return _fn


class LogDock(QPlainTextEdit):
    """Live log view fed by a logging.Handler (reference docked log)."""

    def __init__(self):
        super().__init__()
        self.setReadOnly(True)
        self.setMaximumBlockCount(2000)
        bridge = SignalBridge()
        bridge.relay.connect(self._append, Qt.QueuedConnection)
        self._bridge = bridge

        class _Handler(logging.Handler):
            def emit(h, record):
                bridge.relay.emit("log", (h.format(record),))

        handler = _Handler()
        handler.setFormatter(logging.Formatter("%(levelname)s %(name)s: %(message)s"))
        handler.setLevel(logging.INFO)
        logging.getLogger("caliscope_tpu").addHandler(handler)
        self._handler = handler

    def _append(self, _name, args):
        self.appendPlainText(args[0])


class ProjectTab(QWidget):
    """Workspace overview: workflow step status + camera table."""

    def __init__(self, window: "MainWindow"):
        super().__init__()
        self.window = window
        layout = QVBoxLayout(self)
        self.status_label = QLabel("No workspace open.")
        self.status_label.setWordWrap(True)
        layout.addWidget(self.status_label)
        self.cam_table = QTableWidget(0, 5)
        self.cam_table.setHorizontalHeaderLabels(["cam", "size", "fx", "error", "posed"])
        layout.addWidget(self.cam_table)
        refresh = QPushButton("Refresh")
        refresh.clicked.connect(self.refresh)
        layout.addWidget(refresh)

    def refresh(self):
        ws = self.window.ws
        if ws is None:
            return
        status = ws.get_workflow_status()
        lines = [f"Workspace: {ws.root}"]
        lines.append(f"Intrinsics: {status.intrinsic_step_status.name}")
        lines.append(f"Extraction: {status.extrinsic_2d_step_status.name}")
        lines.append(f"Extrinsics: {status.extrinsic_calibration_step_status.name}")
        self.status_label.setText("\n".join(lines))
        cams = ws.cameras.load() if ws.cameras.exists() else None
        rows = sorted(cams.cameras.values(), key=lambda c: c.cam_id) if cams else []
        self.cam_table.setRowCount(len(rows))
        for i, c in enumerate(rows):
            fx = f"{c.matrix[0, 0]:.1f}" if c.matrix is not None else "—"
            err = f"{c.error:.3f}" if c.error is not None else "—"
            for j, text in enumerate(
                [str(c.cam_id), f"{c.size[0]}x{c.size[1]}", fx, err, "yes" if c.is_posed else "no"]
            ):
                self.cam_table.setItem(i, j, QTableWidgetItem(text))


class IntrinsicTab(QWidget):
    """Per-camera intrinsic calibration (reference intrinsic widget)."""

    def __init__(self, window: "MainWindow"):
        super().__init__()
        self.window = window
        self.presenter = None
        layout = QVBoxLayout(self)
        row = QHBoxLayout()
        row.addWidget(QLabel("Camera:"))
        self.cam_box = QComboBox()
        row.addWidget(self.cam_box)
        self.run_btn = QPushButton("Calibrate")
        self.run_btn.clicked.connect(self.run)
        row.addWidget(self.run_btn)
        layout.addLayout(row)
        self.progress = QProgressBar()
        layout.addWidget(self.progress)
        self.result = QLabel("")
        self.result.setWordWrap(True)
        layout.addWidget(self.result)
        layout.addStretch(1)
        self.bridge = SignalBridge()
        self.bridge.relay.connect(self.on_event, Qt.QueuedConnection)

    def refresh(self):
        self.cam_box.clear()
        ws = self.window.ws
        if ws:
            for cid in ws.get_cam_ids():
                self.cam_box.addItem(str(cid))

    def run(self):
        ws = self.window.ws
        if ws is None or self.cam_box.currentText() == "":
            return
        cam_id = int(self.cam_box.currentText())
        from caliscope_tpu.cameras import CameraArray, CameraData
        from caliscope_tpu.media import read_video_properties
        from caliscope_tpu.presenters import IntrinsicCalibrationPresenter

        video = ws.video_path("intrinsic", cam_id)
        if not video.exists():
            QMessageBox.warning(self, "Missing video", f"No intrinsic video at {video}")
            return
        array = ws.cameras.load() if ws.cameras.exists() else CameraArray({})
        cam = array.cameras.get(cam_id)
        if cam is None:
            props = read_video_properties(video)
            cam = CameraData(cam_id=cam_id, size=props.size)
        p = IntrinsicCalibrationPresenter(cam, video, ws.make_intrinsic_tracker())
        p.calibration_completed.connect(self.bridge.forward("done"))
        p.error_occurred.connect(self.bridge.forward("error"))
        self.presenter = p
        self.run_btn.setEnabled(False)
        self.progress.setRange(0, 0)  # busy indicator
        self.result.setText(f"Calibrating camera {cam_id}…")
        p.run()

    def _stop_busy(self):
        self.progress.setRange(0, 1)
        self.progress.setValue(1)

    def on_event(self, name, args):
        if name == "done":
            self._stop_busy()
            out = args[0]
            cam = out.camera
            self.result.setText(
                f"fx={cam.matrix[0, 0]:.1f} fy={cam.matrix[1, 1]:.1f} "
                f"cx={cam.matrix[0, 2]:.1f} cy={cam.matrix[1, 2]:.1f} "
                f"RMSE={out.report.rmse:.3f}px coverage={out.report.coverage_fraction:.0%}"
            )
            ws = self.window.ws
            ws.cameras.save_camera(cam)
            ws.intrinsic_reports.save(cam.cam_id, out.report)
            self.run_btn.setEnabled(True)
            self.window.project_tab.refresh()
        elif name == "error":
            self._stop_busy()
            self.result.setText(f"Error: {args[0]}")
            self.run_btn.setEnabled(True)


class ExtrinsicTab(QWidget):
    """Extraction + extrinsic calibration + filter/anchor operations
    (reference extrinsic view + quality dialog, headless presenter)."""

    def __init__(self, window: "MainWindow"):
        super().__init__()
        self.window = window
        self.presenter = None
        layout = QVBoxLayout(self)

        row = QHBoxLayout()
        self.extract_btn = QPushButton("Extract 2D points")
        self.extract_btn.clicked.connect(self.extract)
        row.addWidget(self.extract_btn)
        self.refine_box = QCheckBox("Refine intrinsics")
        self.refine_box.setChecked(True)
        row.addWidget(self.refine_box)
        self.calib_btn = QPushButton("Calibrate")
        self.calib_btn.clicked.connect(self.calibrate)
        row.addWidget(self.calib_btn)
        layout.addLayout(row)

        self.progress = QProgressBar()
        layout.addWidget(self.progress)
        self.summary = QLabel("")
        self.summary.setWordWrap(True)
        layout.addWidget(self.summary)
        self.rmse_table = QTableWidget(0, 2)
        self.rmse_table.setHorizontalHeaderLabels(["camera", "RMSE px"])
        layout.addWidget(self.rmse_table)

        ops = QGroupBox("Quality / anchoring")
        grid = QGridLayout(ops)
        grid.addWidget(QLabel("Filter percentile:"), 0, 0)
        self.pct_box = QDoubleSpinBox()
        self.pct_box.setRange(0.0, 50.0)
        self.pct_box.setValue(2.5)
        grid.addWidget(self.pct_box, 0, 1)
        fbtn = QPushButton("Filter + re-optimize")
        fbtn.clicked.connect(self.filter_points)
        grid.addWidget(fbtn, 0, 2)
        for col, (label, fn) in enumerate(
            [("Orient (gravity up)", self.orient), ("Ground (floor z=0)", self.ground), ("Center", self.center)]
        ):
            b = QPushButton(label)
            b.clicked.connect(fn)
            grid.addWidget(b, 1, col)
        layout.addWidget(ops)
        layout.addStretch(1)

        self.bridge = SignalBridge()
        self.bridge.relay.connect(self.on_event, Qt.QueuedConnection)

    def extract(self):
        ws = self.window.ws
        if ws is None:
            return
        from caliscope_tpu.tasks import TaskManager

        self.extract_btn.setEnabled(False)
        self.summary.setText("Extracting…")
        tm = getattr(self, "_tm", None) or TaskManager(max_workers=1)
        self._tm = tm

        handle = tm.submit(lambda: ws.extract_extrinsic_points(), name="extract")

        def on_done(fut):
            if fut.exception():
                self.bridge.relay.emit("error", (str(fut.exception()),))
            else:
                self.bridge.relay.emit("extracted", (fut.result(),))

        handle.future.add_done_callback(on_done)

    def calibrate(self):
        ws = self.window.ws
        if ws is None:
            return
        from caliscope_tpu.observations import ImagePoints
        from caliscope_tpu.presenters import ExtrinsicCalibrationPresenter

        csv = ws.xy_csv_path(ws.targets.get_extrinsic_tracker_name())
        if not csv.exists():
            QMessageBox.warning(self, "No extraction", "Run extraction first.")
            return
        points = ImagePoints.from_csv(csv)
        cameras = ws.ensure_cameras_from_videos() if not ws.cameras.exists() else ws.cameras.load()
        p = ExtrinsicCalibrationPresenter(points, cameras, ws.make_extrinsic_constraints())
        p.set_refine_intrinsics(self.refine_box.isChecked())
        p.progress_updated.connect(self.bridge.forward("progress"))
        p.capture_volume_changed.connect(self.bridge.forward("volume"))
        p.error_occurred.connect(self.bridge.forward("error"))
        self.presenter = p
        self.calib_btn.setEnabled(False)
        self.summary.setText("Calibrating…")
        p.run_calibration(filter_percentile=self.pct_box.value())

    # ---- post-calibration operations ---------------------------------------
    def _with_volume(self, fn):
        p = self.presenter
        if p is None or p.capture_volume is None:
            return
        try:
            fn(p)
        except Exception as e:  # surface, don't crash the GUI
            self.summary.setText(f"Error: {e}")

    def filter_points(self):
        self._with_volume(lambda p: p.filter_by_percentile(self.pct_box.value()))

    def orient(self):
        self._with_volume(lambda p: p.orient_gravity())

    def ground(self):
        self._with_volume(lambda p: p.ground())

    def center(self):
        self._with_volume(lambda p: p.center())

    def on_event(self, name, args):
        if name == "progress" and len(args) >= 2:
            self.progress.setMaximum(100)
            self.progress.setValue(int(args[0]))
        elif name == "extracted":
            points = args[0]
            self.summary.setText(f"Extracted {len(points)} observations.")
            self.extract_btn.setEnabled(True)
        elif name == "volume":
            vol = args[0]
            rep = vol.reprojection_report
            self.summary.setText(
                f"RMSE {rep.overall_rmse:.3f} px over {rep.n_observations_matched} observations, "
                f"{rep.n_cameras} cameras posed."
            )
            by_cam = sorted(rep.by_camera.items())
            self.rmse_table.setRowCount(len(by_cam))
            for i, (cid, rmse) in enumerate(by_cam):
                self.rmse_table.setItem(i, 0, QTableWidgetItem(str(cid)))
                self.rmse_table.setItem(i, 1, QTableWidgetItem(f"{rmse:.3f}"))
            ws = self.window.ws
            ws.capture_volume.save(vol)
            ws.cameras.save(vol.camera_array)
            self.calib_btn.setEnabled(True)
            self.window.project_tab.refresh()
        elif name == "error":
            self.summary.setText(f"Error: {args[0]}")
            self.extract_btn.setEnabled(True)
            self.calib_btn.setEnabled(True)


class ReconstructTab(QWidget):
    def __init__(self, window: "MainWindow"):
        super().__init__()
        self.window = window
        layout = QVBoxLayout(self)
        row = QHBoxLayout()
        row.addWidget(QLabel("Recording:"))
        self.rec_box = QComboBox()
        row.addWidget(self.rec_box)
        self.run_btn = QPushButton("Reconstruct")
        self.run_btn.clicked.connect(self.run)
        row.addWidget(self.run_btn)
        layout.addLayout(row)
        self.status = QLabel("")
        layout.addWidget(self.status)
        layout.addStretch(1)
        self.bridge = SignalBridge()
        self.bridge.relay.connect(self.on_event, Qt.QueuedConnection)

    def refresh(self):
        self.rec_box.clear()
        ws = self.window.ws
        if ws:
            for name in ws.recording_names():
                self.rec_box.addItem(name)

    def run(self):
        ws = self.window.ws
        name = self.rec_box.currentText()
        if ws is None or not name:
            return
        from caliscope_tpu.tasks import TaskManager

        self.run_btn.setEnabled(False)
        self.status.setText(f"Reconstructing {name}…")
        tm = getattr(self, "_tm", None) or TaskManager(max_workers=1)
        self._tm = tm

        def work():
            ws.reconstruct_recording(name)
            return name

        handle = tm.submit(work, name="reconstruct")

        def on_done(fut):
            if fut.exception():
                self.bridge.relay.emit("error", (str(fut.exception()),))
            else:
                self.bridge.relay.emit("done", (fut.result(),))

        handle.future.add_done_callback(on_done)

    def on_event(self, name, args):
        if name == "done":
            self.status.setText(f"Wrote exports for {args[0]}.")
        else:
            self.status.setText(f"Error: {args[0]}")
        self.run_btn.setEnabled(True)


class MainWindow(QMainWindow):
    def __init__(self, workspace_dir: Optional[Path] = None):
        super().__init__()
        self.setWindowTitle("caliscope-tpu")
        self.resize(900, 650)
        self.ws: Optional[Workspace] = None

        central = QWidget()
        layout = QVBoxLayout(central)
        open_btn = QPushButton("Open workspace…")
        open_btn.clicked.connect(self.open_dialog)
        layout.addWidget(open_btn)

        self.tabs = QTabWidget()
        self.project_tab = ProjectTab(self)
        self.intrinsic_tab = IntrinsicTab(self)
        self.extrinsic_tab = ExtrinsicTab(self)
        self.reconstruct_tab = ReconstructTab(self)
        for tab, name in [
            (self.project_tab, "Project"),
            (self.intrinsic_tab, "Intrinsics"),
            (self.extrinsic_tab, "Extrinsics"),
            (self.reconstruct_tab, "Reconstruct"),
        ]:
            self.tabs.addTab(tab, name)
        layout.addWidget(self.tabs, 1)
        self.log = LogDock()
        self.log.setMaximumHeight(140)
        layout.addWidget(self.log)
        self.setCentralWidget(central)

        if workspace_dir:
            self.open_workspace(Path(workspace_dir))

    def open_dialog(self):
        d = QFileDialog.getExistingDirectory(self, "Open workspace")
        if d:
            self.open_workspace(Path(d))

    def open_workspace(self, path: Path):
        self.ws = Workspace(path)
        self.project_tab.refresh()
        self.intrinsic_tab.refresh()
        self.reconstruct_tab.refresh()


def run_app(workspace_dir=None) -> int:
    app = QApplication.instance() or QApplication([])
    win = MainWindow(Path(workspace_dir) if workspace_dir else None)
    win.show()
    return app.exec()
