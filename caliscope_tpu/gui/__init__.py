"""GUI layer over the headless presenters (reference gui/, SURVEY §2.7).

Architecture mirrors the reference's PySide6 MVP stack:

- main_window.py — welcome screen, recent projects, the Project /
  Intrinsics / Extract / Extrinsics / Reconstruct tab flow with workflow
  gating, docked live log, filesystem watching.
- views/ — one widget per tab, bound to the framework-agnostic presenters
  (caliscope_tpu/presenters) through the SignalBridge (worker-thread
  callbacks delivered queued on the GUI thread).
- widgets/ — target config panels with live board preview, coverage
  heatmap, calibration-quality tabs (reprojection/rigidity/scale +
  sparkline), lens model visualizer, structural warnings, software-rendered
  3D capture-volume playback, workflow step strip, welcome screen.
- qt.py — backend selector: PySide6 when installed (offscreen-capable, the
  reference's own test strategy), else the pure-Python headless Qt in
  headless.py, which keeps every view constructible, drivable, and
  assertable in CI images without Qt wheels.
"""

from __future__ import annotations


def qt_available() -> bool:
    """True when real PySide6 backs the GUI (vs the headless fallback)."""
    try:
        import PySide6  # noqa: F401

        return True
    except ImportError:
        return False


def main(workspace_dir=None) -> int:
    """Launch the GUI (real Qt event loop, or the headless loop otherwise)."""
    from caliscope_tpu.gui.main_window import run_app

    return run_app(workspace_dir)
