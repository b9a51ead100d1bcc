"""Round-5 GUI depth: the per-view affordances ported from the reference's
richest widgets — scale-detail dialog, distance sparkline, target routing
with overflow validation, workflow detail rows, reconstruction tracker
gating (reference gui/widgets/scale_detail_dialog.py,
distance_sparkline.py, views/project_setup_view.py,
views/reconstruction_widget.py). All driven headlessly; the same widget
code runs under real Qt."""

import os

os.environ["CALISCOPE_TPU_FORCE_HEADLESS_QT"] = "1"

import numpy as np
import pytest

from caliscope_tpu.gui import headless
from caliscope_tpu.gui.qt import QApplication
from caliscope_tpu.scale import FrameScaleError, VolumetricScaleReport


@pytest.fixture
def app():
    headless.QApplication._reset_for_tests()
    a = QApplication([])
    yield a
    headless.QApplication._reset_for_tests()


def _report(syncs=(0, 2, 4), mms=(1.0, 3.0, 2.0)):
    frames = tuple(
        FrameScaleError(
            sync_index=s,
            object_id=0,
            distance_rmse_mm=mm,
            distance_mean_signed_error_mm=mm / 2,
            distance_max_error_mm=mm * 1.5,
            n_corners=24,
            n_distance_pairs=10,
            n_cameras_contributing=3,
            sum_squared_errors_m2=(mm / 1000.0) ** 2 * 10,
            sum_squared_relative_errors=0.0,
            centroid=(0.0, 0.0, 1.0),
        )
        for s, mm in zip(syncs, mms)
    )
    return VolumetricScaleReport(frame_errors=frames)


class TestDistanceSparkline:
    def test_data_cursor_and_hover_seek(self, app):
        from caliscope_tpu.gui.widgets.distance_sparkline import DistanceSparkline

        w = DistanceSparkline()
        w.set_data(_report(), valid_sync_indices=[0, 1, 2, 3, 4])
        assert "3.0" in w.ymax_label.text()
        assert w.value_at_position(2) == pytest.approx(3.0)
        assert w.value_at_position(1) is None  # no sample at sync 1
        # pixel -> position round trip across the slider domain
        assert w.position_at_x(0) == 0
        assert w.position_at_x(w.W - 1) == 4
        seeks = []
        w.cursor_moved.connect(seeks.append)
        w.hover(w.W - 1)
        assert seeks == [4]
        w.set_cursor(4)
        assert w.chart_array.shape == (w.H, w.W, 3)
        w.clear()
        assert w.ymax_label.text() == ""

    def test_playback_widget_embeds_sparkline(self, app, tmp_path):
        from caliscope_tpu.gui.widgets.playback_3d import Playback3DWidget

        w = Playback3DWidget(width=160, height=120)
        w._sync_indices = np.array([0, 2, 4])
        w.slider.setRange(0, 2)
        w.set_scale_report(_report())
        assert w.sparkline.value_at_position(1) == pytest.approx(3.0)
        # hover-seek on the sparkline drives the playback slider
        w.sparkline.hover(w.sparkline.W - 1)
        assert w.slider.value() == 2


class TestScaleDetailDialog:
    def test_summary_table_and_click_seek(self, app):
        from caliscope_tpu.gui.widgets.scale_detail_dialog import ScaleDetailDialog

        d = ScaleDetailDialog()
        d.set_data(_report(), valid_sync_indices=[0, 2, 4])
        assert "median" in d.summary.text() and "bias" in d.summary.text()
        assert d.table.rowCount() == 3
        assert d.table.item(1, 0).text() == "2"
        assert d.table.item(1, 2).text() == "3.00"
        clicks = []
        d.frame_clicked.connect(clicks.append)
        x_last = 44 + d._plot_w() - 1  # right edge of the plot region
        d.click(x_last)
        assert clicks == [4]
        d.set_cursor(1)
        assert d.chart_array.shape == (d.H, d.W, 3)
        d.hover(x_last)
        assert "4" in d.hover_label.text()

    def test_quality_tabs_open_dialog(self, app):
        from caliscope_tpu.gui.widgets.quality_tabs import CalibrationQualityTabs

        tabs = CalibrationQualityTabs()
        tabs._scale_report = _report()
        dlg = tabs.open_scale_detail()
        assert dlg is tabs.scale_dialog
        assert dlg.table.rowCount() == 3


class TestWorkflowStepPanel:
    def test_detail_text_tracks_status(self, app, tmp_path):
        from caliscope_tpu.gui.widgets.step_strip import WorkflowStepPanel
        from caliscope_tpu.workspace import Workspace

        ws = Workspace.create(tmp_path / "proj")
        panel = WorkflowStepPanel()
        panel.update_status(ws.get_workflow_status())
        assert "intrinsic videos" in panel.detail_text("Intrinsics")
        assert "recordings" in panel.detail_text("Reconstruction")


class TestProjectViewRouting:
    def test_routing_roundtrip_and_overflow_revert(self, app, tmp_path):
        from caliscope_tpu.gui.views.project_view import ProjectSetupView
        from caliscope_tpu.workspace import Workspace

        ws = Workspace.create(tmp_path / "proj")

        class _Win:
            pass

        win = _Win()
        win.ws = ws
        view = ProjectSetupView(win)
        view.refresh()
        # changing the extrinsic type + unchecking same-as-intrinsic persists
        view.extrinsic_type.setCurrentText("aruco")
        view.same_as_intrinsic.setChecked(False)
        routing = ws.targets.get_routing()
        assert routing.extrinsic == "aruco"
        assert not routing.extrinsic_charuco_same_as_intrinsic
        # panel visibility mirrors the routing (stacked-widget parity)
        assert view.aruco_panel.isVisible()
        assert not view.extrinsic_charuco_panel.isVisible()

        # dictionary overflow: a 20x20 grid (200 markers) cannot fit
        # DICT_4X4_50 — the panel must warn AND revert the fields
        panel = view.intrinsic_charuco_panel
        panel.dictionary.setCurrentText("DICT_4X4_50")
        panel.rows.setValue(20)
        panel.columns.setValue(20)
        panel._apply()
        assert panel.error_label.text() != ""
        assert panel.rows.value() == panel.charuco.rows  # reverted
        assert panel.columns.value() == panel.charuco.columns


class TestReconstructionViewDepth:
    def test_tracker_annotations_and_download_gate(self, app, tmp_path):
        from caliscope_tpu.gui.views.reconstruct_view import ReconstructionView
        from caliscope_tpu.presenters.processing import ProcessingState
        from caliscope_tpu.workspace import Workspace

        ws = Workspace.create(tmp_path / "proj")
        (ws.root / "recordings" / "take1").mkdir(parents=True)

        class _Win:
            pass

        win = _Win()
        win.ws = ws
        view = ReconstructionView(win)
        view.refresh()
        # first entry is always the workspace's target tracker
        assert view.tracker_box.currentText().startswith("target (")
        assert view.selected_tracker_key() is None
        assert not view.selected_tracker_needs_download()
        # shipped model cards appear, annotated as not downloaded
        onnx_items = [
            view.tracker_box.itemText(i)
            for i in range(view.tracker_box.count())
            if "(" in view.tracker_box.itemText(i) and not view.tracker_box.itemText(i).startswith("target")
        ]
        if onnx_items:  # cards ship with the package
            view.tracker_box.setCurrentText(onnx_items[0])
            assert view.selected_tracker_needs_download()
            view.run()  # gated: must NOT start, must open the download dialog
            assert view.state == ProcessingState.IDLE
            assert "download" in view.status.text()
        assert view.BUTTON_TEXT[ProcessingState.PROCESSING] == "Processing…"

    def test_open_output_records_path(self, app, tmp_path):
        from caliscope_tpu.gui.views.reconstruct_view import ReconstructionView
        from caliscope_tpu.workspace import Workspace

        ws = Workspace.create(tmp_path / "proj")
        (ws.root / "recordings" / "take1").mkdir(parents=True)

        class _Win:
            pass

        win = _Win()
        win.ws = ws
        view = ReconstructionView(win)
        view.refresh()
        view.rec_box.addItem("take1")
        view.rec_box.setCurrentText("take1")
        view.open_output()
        assert view.last_opened_path == ws.root / "recordings" / "take1"
