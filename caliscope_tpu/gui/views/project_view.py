"""Project tab: workspace overview, workflow strip, camera table, target
configuration panels.

Parity: reference gui/views/project_setup_view.py + charuco/chessboard/aruco
config panels + cameras table (camera_list_widget.py).
"""

from __future__ import annotations

from caliscope_tpu.gui.qt import (
    QLabel,
    QPushButton,
    QTableWidget,
    QTableWidgetItem,
    QTabWidget,
    QVBoxLayout,
    QWidget,
)
from caliscope_tpu.gui.widgets import (
    ArucoSetPanel,
    CalibrationStepStrip,
    CharucoConfigPanel,
    ChessboardConfigPanel,
)
from caliscope_tpu.targets import Charuco, Chessboard


class ProjectSetupView(QWidget):
    def __init__(self, window, parent=None):
        super().__init__(parent)
        self.window = window
        layout = QVBoxLayout(self)
        self.path_label = QLabel("No workspace open.")
        self.path_label.setWordWrap(True)
        layout.addWidget(self.path_label)

        self.step_strip = CalibrationStepStrip()
        layout.addWidget(self.step_strip)

        self.cam_table = QTableWidget(0, 5)
        self.cam_table.setHorizontalHeaderLabels(["cam", "size", "fx", "error", "posed"])
        layout.addWidget(self.cam_table)

        self.target_tabs = QTabWidget()
        layout.addWidget(self.target_tabs)
        self.charuco_panel: CharucoConfigPanel | None = None
        self.chessboard_panel: ChessboardConfigPanel | None = None
        self.aruco_panel: ArucoSetPanel | None = None

        refresh = QPushButton("Refresh")
        refresh.clicked.connect(self.refresh)
        layout.addWidget(refresh)

    def _build_target_tabs(self, ws) -> None:
        self.target_tabs.clear()
        try:
            charuco = ws.targets.load_extrinsic_charuco()
        except Exception:
            charuco = Charuco(rows=4, columns=5, square_size_m=0.054)
        self.charuco_panel = CharucoConfigPanel(charuco)
        self.charuco_panel.target_changed.connect(self._save_charuco)
        self.target_tabs.addTab(self.charuco_panel, "ChArUco")

        try:
            chessboard = ws.targets.load_chessboard()
        except Exception:
            chessboard = Chessboard(rows=5, columns=7, square_size_m=0.03)
        self.chessboard_panel = ChessboardConfigPanel(chessboard)
        self.chessboard_panel.target_changed.connect(self._save_chessboard)
        self.target_tabs.addTab(self.chessboard_panel, "Chessboard")

        try:
            ms = ws.targets.load_aruco_marker_set()
        except Exception:
            ms = None
        self.aruco_panel = ArucoSetPanel(ms)
        self.aruco_panel.target_changed.connect(self._save_aruco)
        self.target_tabs.addTab(self.aruco_panel, "ArUco set")

    def _save_charuco(self, ch) -> None:
        ws = self.window.ws
        if ws is not None:
            ws.targets.save_extrinsic_charuco(ch)
            ws.targets.save_intrinsic_charuco(ch)

    def _save_chessboard(self, cb) -> None:
        ws = self.window.ws
        if ws is not None:
            ws.targets.save_chessboard(cb)

    def _save_aruco(self, ms) -> None:
        ws = self.window.ws
        if ws is not None:
            ws.targets.save_aruco_marker_set(ms)

    def refresh(self) -> None:
        ws = self.window.ws
        if ws is None:
            return
        self.path_label.setText(f"Workspace: {ws.root}")
        self.step_strip.update_status(ws.get_workflow_status())
        if self.target_tabs.count() == 0:
            self._build_target_tabs(ws)
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
