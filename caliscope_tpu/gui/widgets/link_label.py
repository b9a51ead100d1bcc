"""Hyperlink-styled label with a click signal.

Parity: reference src/caliscope/gui/widgets/link_label.py:1 — a QLabel
that looks and behaves like a hyperlink (accent color, hover underline,
clicked signal on left press). Hover/press events only exist under real
Qt; the headless backend exercises the programmatic surface
(set_hovered, click)."""

from __future__ import annotations

from caliscope_tpu.gui.qt import QLabel, Signal
from caliscope_tpu.gui.theme import Colors


class LinkLabel(QLabel):
    clicked = Signal()

    def __init__(self, text: str = "", font_size_px: int = 10, parent=None):
        super().__init__(text, parent)
        self._font_size_px = font_size_px
        self._set_underline(False)

    def _set_underline(self, underline: bool) -> None:
        decoration = "underline" if underline else "none"
        self.setStyleSheet(
            f"color: {Colors.PRIMARY}; font-size: {self._font_size_px}px; "
            f"text-decoration: {decoration};"
        )

    def set_hovered(self, hovered: bool) -> None:
        self._set_underline(hovered)

    def click(self) -> None:
        self.clicked.emit()

    # real-Qt event hooks (no-ops headlessly; QLabel has no such events there)
    def enterEvent(self, event) -> None:  # pragma: no cover - needs real Qt
        self._set_underline(True)
        super().enterEvent(event)

    def leaveEvent(self, event) -> None:  # pragma: no cover - needs real Qt
        self._set_underline(False)
        super().leaveEvent(event)

    def mousePressEvent(self, event) -> None:  # pragma: no cover - needs real Qt
        self.clicked.emit()
        super().mousePressEvent(event)
