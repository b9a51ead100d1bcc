"""Qt view layer over the headless presenters (reference gui/, §2.7).

The reference ships a PySide6 MVP stack (main_widget.py, workspace
coordinator, views). Here the presenters are framework-agnostic
(caliscope_tpu/presenters) and this package supplies a functional — though
deliberately minimal relative to the reference's polish — Qt view layer:
workspace browser, per-camera intrinsic calibration, extrinsic
extraction/calibration with filtering and anchoring, and recording
reconstruction, each driving the same pipeline objects the CLI uses.

PySide6 is an optional dependency: importing this package is safe
everywhere; constructing the GUI raises a clear error when Qt is missing.
"""

from __future__ import annotations


def qt_available() -> bool:
    try:
        import PySide6  # noqa: F401

        return True
    except ImportError:
        return False


def main(workspace_dir=None) -> int:
    """Launch the GUI. Raises RuntimeError when PySide6 is unavailable."""
    if not qt_available():
        raise RuntimeError(
            "The GUI requires PySide6, which is not installed. The headless "
            "Workspace/CLI (python -m caliscope_tpu ...) drives the identical "
            "calibration core."
        )
    from caliscope_tpu.gui.app import run_app

    return run_app(workspace_dir)
