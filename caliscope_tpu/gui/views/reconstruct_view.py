"""Reconstruct tab: run a recording through tracking + triangulation and
list the exports.

Parity: reference gui/views/reconstruction_widget.py bound to the
processing/reconstruction presenters.
"""

from __future__ import annotations

from caliscope_tpu.gui.bridge import SignalBridge
from caliscope_tpu.gui.qt import (
    QComboBox,
    QHBoxLayout,
    QLabel,
    QProgressBar,
    QPushButton,
    QTableWidget,
    QTableWidgetItem,
    QVBoxLayout,
    QWidget,
)


class ReconstructionView(QWidget):
    def __init__(self, window, parent=None):
        super().__init__(parent)
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
        self.progress = QProgressBar()
        layout.addWidget(self.progress)
        self.status = QLabel("")
        self.status.setWordWrap(True)
        layout.addWidget(self.status)
        self.exports_table = QTableWidget(0, 2)
        self.exports_table.setHorizontalHeaderLabels(["export", "size (kB)"])
        layout.addWidget(self.exports_table)
        layout.addStretch(1)
        self.bridge = SignalBridge(self.on_event)

    def refresh(self) -> None:
        self.rec_box.clear()
        ws = self.window.ws
        if ws:
            for name in ws.recording_names():
                self.rec_box.addItem(name)
            self._list_exports()

    def _list_exports(self) -> None:
        ws = self.window.ws
        name = self.rec_box.currentText()
        if ws is None or not name:
            self.exports_table.setRowCount(0)
            return
        out_dir = ws.root / "recordings" / name
        files = sorted(
            p for p in out_dir.rglob("*") if p.is_file() and p.suffix in (".csv", ".trc", ".toml", ".py")
        )
        self.exports_table.setRowCount(len(files))
        for i, p in enumerate(files):
            self.exports_table.setItem(i, 0, QTableWidgetItem(str(p.relative_to(out_dir))))
            self.exports_table.setItem(i, 1, QTableWidgetItem(f"{p.stat().st_size / 1024:.1f}"))

    def run(self) -> None:
        ws = self.window.ws
        name = self.rec_box.currentText()
        if ws is None or not name:
            return
        from caliscope_tpu.tasks import TaskManager

        self.run_btn.setEnabled(False)
        self.progress.setRange(0, 0)
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

    def on_event(self, name, args) -> None:
        self.progress.setRange(0, 1)
        self.progress.setValue(1)
        self.run_btn.setEnabled(True)
        if name == "done":
            self.status.setText(f"Wrote exports for {args[0]}.")
            self._list_exports()
        else:
            self.status.setText(f"Error: {args[0]}")
