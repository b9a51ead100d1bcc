"""Workflow step strip: the intrinsics -> extract -> extrinsics progress rail.

Parity: reference gui/widgets/calibration_step_strip.py — one badge per
workflow stage, fed from WorkflowStatus (workspace.py StepStatus).
"""

from __future__ import annotations

from caliscope_tpu.gui.qt import QHBoxLayout, QLabel, QWidget
from caliscope_tpu.workspace import StepStatus, WorkflowStatus

_GLYPH = {
    StepStatus.NOT_STARTED: "○",
    StepStatus.AVAILABLE: "○",
    StepStatus.INCOMPLETE: "◐",
    StepStatus.COMPLETE: "●",
}


class CalibrationStepStrip(QWidget):
    STEPS = ("Intrinsics", "Extract", "Extrinsics")

    def __init__(self, parent=None):
        super().__init__(parent)
        layout = QHBoxLayout(self)
        self.badges: dict[str, QLabel] = {}
        for i, name in enumerate(self.STEPS):
            badge = QLabel(f"○ {name}")
            layout.addWidget(badge)
            self.badges[name] = badge
            if i < len(self.STEPS) - 1:
                layout.addWidget(QLabel("→"))
        layout.addStretch(1)

    def update_status(self, status: WorkflowStatus) -> None:
        states = {
            "Intrinsics": status.intrinsic_step_status,
            "Extract": status.extrinsic_2d_step_status,
            "Extrinsics": status.extrinsic_calibration_step_status,
        }
        for name, st in states.items():
            self.badges[name].setText(f"{_GLYPH.get(st, '○')} {name}")

    def step_state(self, name: str) -> str:
        return self.badges[name].text().split(" ")[0]
