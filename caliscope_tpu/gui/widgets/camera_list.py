"""Camera sidebar list with per-camera calibration status.

Parity: reference src/caliscope/gui/camera_list_widget.py:1 — one row per
camera showing a filled/hollow status glyph plus RMSE for calibrated
cameras (glyph + color together, never color-alone), a camera_selected
signal on user selection, selection-preserving refresh, and programmatic
selection by cam_id.
"""

from __future__ import annotations

import logging

from caliscope_tpu.gui.qt import (
    QBrush,
    QColor,
    QListWidget,
    QListWidgetItem,
    Qt,
    Signal,
)
from caliscope_tpu.gui.theme import Colors, Styles

logger = logging.getLogger(__name__)


class CameraListWidget(QListWidget):
    """Sidebar list of cameras with calibration state indicators.

    Emits camera_selected(cam_id) when the user picks a different camera.
    """

    camera_selected = Signal(int)

    def __init__(self, camera_array):
        super().__init__()
        self._camera_array = camera_array
        self._cam_id_to_row: dict[int, int] = {}
        self.setStyleSheet(Styles.LIST_SIDEBAR)
        self._populate()
        self.currentRowChanged.connect(self._on_row_changed)

    def _populate(self) -> None:
        self.clear()
        self._cam_id_to_row.clear()
        for row, (cam_id, camera) in enumerate(sorted(self._camera_array.cameras.items())):
            self._cam_id_to_row[cam_id] = row
            item = QListWidgetItem()
            item.setData(Qt.ItemDataRole.UserRole, cam_id)
            if camera.matrix is not None and camera.distortions is not None:
                err = getattr(camera, "error", None)
                suffix = f" — {err:.2f}px" if err is not None else ""
                item.setText(f"● Cam {cam_id}{suffix}")  # filled circle
                item.setForeground(QBrush(QColor(Colors.SUCCESS)))
            else:
                item.setText(f"○ Cam {cam_id}")  # hollow circle
                item.setForeground(QBrush(QColor(Colors.ERROR)))
            self.addItem(item)

    def _on_row_changed(self, row: int) -> None:
        if row < 0:
            return
        item = self.item(row)
        if item is not None:
            cam_id = item.data(Qt.ItemDataRole.UserRole)
            logger.info(f"Camera selected: cam_id {cam_id}")
            self.camera_selected.emit(cam_id)

    def refresh(self, camera_array) -> None:
        """Rebuild rows from updated camera data, preserving the current
        selection WITHOUT re-emitting camera_selected (a visual update must
        not tear down the active presenter)."""
        current = self.currentItem()
        current_cam_id = current.data(Qt.ItemDataRole.UserRole) if current else None
        self._camera_array = camera_array
        self._populate()
        if current_cam_id is not None and current_cam_id in self._cam_id_to_row:
            was = self.blockSignals(True)
            try:
                self.setCurrentRow(self._cam_id_to_row[current_cam_id])
            finally:
                self.blockSignals(was)

    def select_cam_id(self, cam_id: int) -> None:
        if cam_id in self._cam_id_to_row:
            self.setCurrentRow(self._cam_id_to_row[cam_id])
