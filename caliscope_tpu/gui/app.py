"""Back-compat entry point: the GUI now lives in gui/main_window.py with
views/ and widgets/ (reference gui/main_widget.py architecture)."""

from caliscope_tpu.gui.main_window import MainWindow, run_app  # noqa: F401
