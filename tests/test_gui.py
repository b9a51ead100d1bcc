"""GUI tests: every tab driven headlessly on a synthetic workspace.

Forces the headless Qt backend (gui/qt.py) so the suite runs in images
without PySide6; the same view code runs unmodified under real Qt. Mirrors
the reference's offscreen GUI strategy (reference tests/conftest.py:92
QT_QPA_PLATFORM=offscreen) with the stronger property that widget state is
directly assertable.
"""

import os
import threading
import time

os.environ["CALISCOPE_TPU_FORCE_HEADLESS_QT"] = "1"

import numpy as np
import pytest

from caliscope_tpu.gui import headless
from caliscope_tpu.gui.qt import QApplication, QFileDialog, Qt
from caliscope_tpu.synthetic.camera_synthesizer import strip_extrinsics
from caliscope_tpu.synthetic.factories import default_ring_scene
from caliscope_tpu.targets import Charuco, Chessboard
from caliscope_tpu.volume import CaptureVolume
from caliscope_tpu.workspace import Workspace, WorkspaceWatcher


@pytest.fixture
def app():
    headless.QApplication._reset_for_tests()
    a = QApplication([])
    yield a
    headless.QApplication._reset_for_tests()


def pump(app, until=None, timeout=30.0):
    """Process queued events until `until()` is true (or just drain once)."""
    deadline = time.monotonic() + timeout
    while True:
        app.processEvents()
        if until is None or until():
            return
        if time.monotonic() > deadline:
            raise TimeoutError("GUI condition not reached")
        time.sleep(0.01)


@pytest.fixture(scope="module")
def calibrated_volume(tmp_path_factory):
    """Bootstrap + optimize a synthetic ring rig ONCE per xdist run (the
    ~30 s solve was re-executed by every worker that stole a test from
    this module; see tests/fixture_cache.py)."""
    from tests.fixture_cache import per_run_cached

    scene = default_ring_scene(noise_sigma_px=0.4, n_frames=8)
    ip = scene.image_points_noisy()

    def compute():
        vol = CaptureVolume.bootstrap(ip, strip_extrinsics(scene.cameras)).optimize()
        return vol.camera_array, vol.world_points

    cams, wp = per_run_cached(tmp_path_factory, "gui_calibrated_volume", compute)
    return CaptureVolume(cams, ip, wp), ip, scene


@pytest.fixture
def workspace(tmp_path, calibrated_volume):
    """Workspace seeded with cameras + an extraction CSV (no videos needed
    for the tab flow under test)."""
    vol, ip, scene = calibrated_volume
    ws = Workspace.create(tmp_path / "ws")
    # the workspace target must MATCH the synthetic board: its constraints
    # feed the calibration, and mismatched rigid geometry degrades the solve
    # (a 6x8-square charuco has the scene's 5x7 corner grid at 0.054 m).
    # Default routing resolves the extrinsic charuco to the intrinsic one,
    # so save it there.
    ws.targets.save_intrinsic_charuco(Charuco(rows=6, columns=8, square_size_m=0.054))
    # intrinsics known, extrinsics NOT yet solved (the Extrinsics tab's job)
    ws.cameras.save(strip_extrinsics(vol.camera_array))
    csv = ws.xy_csv_path(ws.targets.get_extrinsic_tracker_name())
    csv.parent.mkdir(parents=True, exist_ok=True)
    ip.to_csv(csv)
    return ws


# ---------------------------------------------------------------------------
# Headless Qt semantics
# ---------------------------------------------------------------------------


class TestHeadlessQt:
    def test_direct_signal_on_gui_thread(self, app):
        from caliscope_tpu.gui.qt import QPushButton

        hits = []
        b = QPushButton("go")
        b.clicked.connect(lambda: hits.append(1))
        b.click()
        assert hits == [1]  # no pump needed: same-thread = direct

    def test_disabled_button_does_not_fire(self, app):
        from caliscope_tpu.gui.qt import QPushButton

        hits = []
        b = QPushButton("go")
        b.clicked.connect(lambda: hits.append(1))
        b.setEnabled(False)
        b.click()
        assert hits == []

    def test_cross_thread_emission_is_queued(self, app):
        from caliscope_tpu.gui.bridge import SignalBridge

        events = []
        bridge = SignalBridge(lambda name, args: events.append((name, args, threading.current_thread())))
        t = threading.Thread(target=bridge.forward("worker_done"), args=(42,))
        t.start()
        t.join()
        assert events == []  # not delivered until the GUI thread pumps
        app.processEvents()
        assert len(events) == 1
        name, args, thread = events[0]
        assert name == "worker_done" and args == (42,)
        assert thread is threading.main_thread()

    def test_widget_tree_and_layouts(self, app):
        from caliscope_tpu.gui.qt import QLabel, QPushButton, QVBoxLayout, QWidget

        host = QWidget()
        layout = QVBoxLayout(host)
        inner = QLabel("x")
        layout.addWidget(inner)
        b = QPushButton()
        layout.addWidget(b)
        assert inner.parent() is host
        assert host.findChildren(QPushButton) == [b]

    def test_tabs_enable_disable(self, app):
        from caliscope_tpu.gui.qt import QTabWidget, QWidget

        tabs = QTabWidget()
        tabs.addTab(QWidget(), "A")
        tabs.addTab(QWidget(), "B")
        tabs.setTabEnabled(1, False)
        assert tabs.isTabEnabled(0) and not tabs.isTabEnabled(1)
        tabs.setTabEnabled(-1, False)  # Qt silently ignores bad indices
        assert tabs.count() == 2


# ---------------------------------------------------------------------------
# Widgets
# ---------------------------------------------------------------------------


class TestWidgets:
    def test_charuco_config_panel_applies_and_persists(self, app, workspace):
        from caliscope_tpu.gui.widgets import CharucoConfigPanel

        panel = CharucoConfigPanel(Charuco(rows=4, columns=5, square_size_m=0.05))
        received = []
        panel.target_changed.connect(received.append)
        panel.rows.setValue(6)
        panel.square_mm.setValue(40.0)
        panel.apply_btn.click()
        assert len(received) == 1
        assert received[0].rows == 6 and abs(received[0].square_size_m - 0.04) < 1e-12
        assert panel.preview.pixmap() is not None and panel.preview.pixmap().width() > 0

    def test_charuco_config_panel_rejects_invalid(self, app):
        from caliscope_tpu.gui.widgets import CharucoConfigPanel

        panel = CharucoConfigPanel(Charuco(rows=4, columns=5, square_size_m=0.05))
        received = []
        panel.target_changed.connect(received.append)
        panel.rows.setValue(30)
        panel.columns.setValue(30)  # 450 markers exceed every 4X4 dictionary
        panel.apply_btn.click()
        assert received == []
        assert panel.error_label.text() != ""

    def test_chessboard_panel(self, app):
        from caliscope_tpu.gui.widgets import ChessboardConfigPanel

        panel = ChessboardConfigPanel(Chessboard(rows=5, columns=7, square_size_m=0.03))
        got = []
        panel.target_changed.connect(got.append)
        panel.rows.setValue(4)
        panel.apply_btn.click()
        assert got and got[0].rows == 4

    def test_coverage_heatmap_fraction(self, app, calibrated_volume):
        from caliscope_tpu.gui.widgets import CoverageHeatmapWidget

        vol, ip, scene = calibrated_volume
        w = CoverageHeatmapWidget()
        sizes = {int(c.cam_id): c.size for c in vol.camera_array.cameras.values()}
        w.set_data(ip, sizes)
        cam0 = sorted(sizes)[0]
        frac = w.coverage_fraction(cam0)
        assert 0.0 < frac <= 1.0
        assert w.canvas.pixmap() is not None and w.canvas.pixmap().width() > 0

    def test_quality_tabs_populate(self, app, calibrated_volume):
        from caliscope_tpu.gui.widgets import CalibrationQualityTabs

        vol, _, _ = calibrated_volume
        tabs = CalibrationQualityTabs()
        tabs.update_from_volume(vol)
        assert "RMSE" in tabs.summary.text()
        assert tabs.rmse_table.rowCount() == len(vol.camera_array.cameras)
        assert tabs.sparkline.bin_counts.sum() > 0

    def test_scale_detail_chart_click_to_seek(self, app, calibrated_volume):
        """The expanded scale chart (reference scale_detail_dialog.py):
        per-frame columns, cursor, hover values, click emits the frame."""
        from caliscope_tpu.gui.widgets import CalibrationQualityTabs

        vol, _, _ = calibrated_volume
        tabs = CalibrationQualityTabs()
        tabs.update_from_volume(vol)
        chart = tabs.scale_chart
        sr = vol.compute_volumetric_scale_accuracy()
        assert sr.n_frames_sampled > 0
        # chart rendered with one column per sampled frame
        img = chart.chart_array
        assert (img != img[0, 0]).any(), "chart should not be a flat field"
        # hover data maps pixels to frames/values
        mid = chart._w // 2
        assert chart.frame_at(mid) is not None
        assert chart.value_at(mid) is not None and chart.value_at(mid) >= 0
        assert chart.frame_at(-1) is None and chart.frame_at(chart._w + 5) is None
        # click-to-seek emits the sync index under the pixel
        clicked = []
        chart.frame_clicked.connect(clicked.append)
        chart.click(mid)
        assert clicked == [chart.frame_at(mid)]
        # cursor draws a distinct vertical marker
        chart.set_cursor(clicked[0])
        with_cursor = chart.chart_array
        assert (with_cursor != img).any()

    def test_playback_3d_renders_and_scrubs(self, app, calibrated_volume):
        from caliscope_tpu.gui.widgets import Playback3DWidget

        vol, _, _ = calibrated_volume
        w = Playback3DWidget(width=320, height=240)
        w.set_volume(vol)
        img0 = w.canvas.pixmap().image.array.copy()
        assert (img0 != img0[0, 0]).any(), "render should not be a flat field"
        first_sync = w.current_sync_index()
        w.slider.setValue(w.slider.maximum())
        assert w.current_sync_index() != first_sync
        w._orbit(45, 0)
        img1 = w.canvas.pixmap().image.array
        assert (img0 != img1).any(), "orbiting must change the render"

    def test_lens_model_widget(self, app, calibrated_volume):
        from caliscope_tpu.gui.widgets import LensModelWidget

        vol, _, _ = calibrated_volume
        cam = sorted(vol.camera_array.cameras.values(), key=lambda c: c.cam_id)[0]
        w = LensModelWidget()
        w.update_from_camera(cam)
        assert "fx=" in w.params.text()
        assert w.canvas.pixmap() is not None

    def test_structural_warnings_flags_isolated_camera(self, app, calibrated_volume):
        from caliscope_tpu.gui.widgets import StructuralWarningsWidget
        from caliscope_tpu.observations import ImagePoints

        vol, ip, _ = calibrated_volume
        w = StructuralWarningsWidget()
        w.update_from_points(ip)
        assert not w.has_critical
        # camera 99 shares no frames with anyone -> disconnected
        lone = ImagePoints(
            sync_index=np.concatenate([ip.sync_index, [9999]]),
            cam_id=np.concatenate([ip.cam_id, [99]]),
            object_id=np.concatenate([ip.object_id, [0]]),
            keypoint_id=np.concatenate([ip.keypoint_id, [0]]),
            img_xy=np.vstack([ip.img_xy, [[1.0, 1.0]]]),
        )
        w.update_from_points(lone)
        assert w.has_critical

    def test_step_strip(self, app, workspace):
        from caliscope_tpu.gui.widgets import CalibrationStepStrip

        strip = CalibrationStepStrip()
        strip.update_status(workspace.get_workflow_status())
        assert strip.step_state("Extract") in ("○", "◐", "●")


# ---------------------------------------------------------------------------
# Main window flow
# ---------------------------------------------------------------------------


class TestMainWindow:
    def _window(self, tmp_path, workspace=None):
        from caliscope_tpu.gui.main_window import MainWindow

        win = MainWindow(
            workspace_dir=workspace.root if workspace else None,
            settings_path=tmp_path / "app_settings.toml",
        )
        return win

    def test_welcome_then_open(self, app, tmp_path, workspace):
        win = self._window(tmp_path)
        assert win.centralWidget() is win.welcome
        QFileDialog.next_path = str(workspace.root)
        win.welcome.open_project_requested.emit()
        assert win.ws is not None and win.ws.root == workspace.root
        assert win.tabs.count() == 7  # Project, Cameras, Intrinsics, Extract, Extrinsics, Reconstruct, Explorer
        # recents persisted
        assert win.recent_projects() == [str(workspace.root)]
        win.close()

    def test_tab_gating_follows_workflow(self, app, tmp_path, workspace):
        from caliscope_tpu.gui.tab_names import TabName

        win = self._window(tmp_path, workspace)
        # cameras resolved + extraction exists -> Extrinsics enabled
        assert win.tabs.isTabEnabled(win.tab_index(TabName.EXTRINSICS))
        # no capture volume yet -> Reconstruct disabled
        assert not win.tabs.isTabEnabled(win.tab_index(TabName.RECONSTRUCT))
        win.close()

    def test_extract_tab_shows_existing_extraction(self, app, tmp_path, workspace):
        win = self._window(tmp_path, workspace)
        tab = win.extract_tab
        assert tab.obs_table.rowCount() == len(win.ws.get_cam_ids()) or tab.obs_table.rowCount() > 0
        assert "observations" in tab.status.text()
        win.close()

    def test_extrinsic_calibrate_end_to_end(self, app, tmp_path, workspace):
        """The load-bearing GUI flow: click Calibrate, pump events until the
        presenter's worker thread delivers the volume, assert every panel
        updated and the artifacts were persisted."""
        from caliscope_tpu.gui.tab_names import TabName

        win = self._window(tmp_path, workspace)
        tab = win.extrinsic_tab
        tab.refine_box.setChecked(False)  # keep the run fast
        tab.calib_btn.click()
        pump(app, until=lambda: "RMSE" in tab.summary.text() or "Error" in tab.summary.text(), timeout=600)
        assert "RMSE" in tab.summary.text(), tab.summary.text()
        # matching-target constraints: the solve must reach noise level
        assert tab.presenter.capture_volume.reprojection_report.overall_rmse < 1.0
        assert tab.quality.rmse_table.rowCount() > 0
        assert tab.playback.canvas.pixmap() is not None
        assert win.ws.capture_volume.exists()
        # tab gating recomputed: Reconstruct now reachable
        assert win.tabs.isTabEnabled(win.tab_index(TabName.RECONSTRUCT))
        # filter preview reacts to the slider
        tab.pct_slider.setValue(50)
        assert "drop worst 5.0%" in tab.filter_preview.text()
        win.close()

    def test_reopening_restores_calibrated_state(self, app, tmp_path, workspace, calibrated_volume):
        vol, _, _ = calibrated_volume
        workspace.capture_volume.save(vol)
        win = self._window(tmp_path, workspace)
        tab = win.extrinsic_tab
        assert tab.presenter is not None and tab.presenter.capture_volume is not None
        assert "RMSE" in tab.summary.text()
        assert tab.origin_box.count() > 0
        win.close()

    def test_origin_operations_update_volume(self, app, tmp_path, workspace, calibrated_volume):
        vol, _, _ = calibrated_volume
        workspace.capture_volume.save(vol)
        win = self._window(tmp_path, workspace)
        tab = win.extrinsic_tab
        tab.center()  # centered() = camera-rig XY centroid to the origin

        def rig_xy(volume):
            cams = volume.camera_array
            centers = [
                -c.rotation.T @ c.translation for c in cams.cameras.values() if c.is_posed
            ]
            return np.stack(centers).mean(axis=0)[:2]

        assert np.allclose(rig_xy(tab.presenter.capture_volume), 0.0, atol=1e-9)
        win.close()

    def test_workspace_watcher_triggers_refresh(self, app, tmp_path, workspace):
        win = self._window(tmp_path, workspace)
        calls = []
        win.refresh_tabs = lambda: calls.append(1)  # observe post-open refreshes
        win.watcher.poll_once()  # no change -> no event
        app.processEvents()
        assert calls == []
        workspace.settings.save({"version": 3})
        win.watcher.poll_once()
        app.processEvents()
        assert calls == [1]
        win.close()


class TestWorkspaceWatcher:
    def test_detects_camera_array_change(self, tmp_path, calibrated_volume):
        vol, _, _ = calibrated_volume
        ws = Workspace.create(tmp_path / "w2")
        events = []
        watcher = WorkspaceWatcher(ws, events.append)
        assert watcher.poll_once() == []
        ws.cameras.save(vol.camera_array)
        changed = watcher.poll_once()
        assert "camera_array" in changed
        assert events and "camera_array" in events[0]

    def test_thread_lifecycle(self, tmp_path):
        ws = Workspace.create(tmp_path / "w3")
        events = []
        watcher = WorkspaceWatcher(ws, events.append, poll_interval=0.05).start()
        ws.settings.save({"version": 9})
        deadline = time.monotonic() + 5.0
        while not events and time.monotonic() < deadline:
            time.sleep(0.02)
        watcher.stop()
        assert events and "settings" in events[0]


class TestExplorer:
    @pytest.mark.slow  # 59 s: explorer-tab recovery duplicates test_production_pipeline ground-truth contract
    def test_pipeline_recovers_ground_truth(self, app, tmp_path, workspace):
        win = self._win(tmp_path, workspace)
        tab = win.explorer_tab
        tab.noise_box.setValue(0.3)
        tab.run_btn.click()
        pump(app, until=lambda: "RMSE" in tab.status.text() or "Error" in tab.status.text(), timeout=600)
        assert "RMSE" in tab.status.text(), tab.status.text()
        result = tab.presenter.result
        assert result.error is None
        assert result.max_rotation_error_deg < 0.5
        assert result.max_translation_error_m < 0.01
        # all four storyboard panels rendered
        for name, canvas in tab.panels.items():
            assert canvas.pixmap() is not None, name
        assert tab.metrics_table.rowCount() == 4
        # scrubbing re-renders with a different highlight
        img0 = tab.panels["aligned"].pixmap().image.array.copy()
        tab.slider.setValue(tab.slider.maximum())
        img1 = tab.panels["aligned"].pixmap().image.array
        assert (img0 != img1).any()
        win.close()

    @pytest.mark.slow  # 66 s: second full explorer pipeline; preset math is covered by synthetic suites
    def test_perturbed_preset_degrades_extrinsics(self, app):
        """The +5% focal preset must produce measurably worse extrinsics than
        the clean ring — the explorer's whole point is showing intrinsic
        error propagating into the pose solve."""
        from caliscope_tpu.synthetic.explorer import ExplorerPresenter

        clean = ExplorerPresenter()
        clean.select_preset("ring", noise_sigma_px=0.3)
        clean.run_pipeline(block=True)
        perturbed = ExplorerPresenter()
        perturbed.select_preset("perturbed", noise_sigma_px=0.3)
        perturbed.run_pipeline(block=True)
        assert clean.result.error is None and perturbed.result.error is None
        assert perturbed.result.max_translation_error_m > 2 * clean.result.max_translation_error_m

    def _win(self, tmp_path, workspace):
        from caliscope_tpu.gui.main_window import MainWindow

        return MainWindow(workspace_dir=workspace.root, settings_path=tmp_path / "s.toml")


class TestModelDialog:
    def test_lists_cards_and_reports_offline_failure(self, app, tmp_path):
        from caliscope_tpu.gui.widgets import ModelDownloadDialog

        dlg = ModelDownloadDialog(models_dir=tmp_path)
        assert dlg.table.rowCount() == 7  # all shipped RTMPose cards
        statuses = {dlg.table.item(i, 4).text() for i in range(7)}
        assert statuses == {"not downloaded"}
        # offline: the download must fail loudly, not hang
        dlg.table.setCurrentCell(0, 0)
        dlg.download_btn.click()
        pump(app, until=lambda: "failed" in dlg.status.text() or "Saved" in dlg.status.text(), timeout=120)
        assert "failed" in dlg.status.text()
        assert dlg.download_btn.isEnabled()

    def test_existing_model_shows_downloaded(self, app, tmp_path):
        from caliscope_tpu.gui.widgets import ModelDownloadDialog

        (tmp_path / "rtmpose_t_halpe26.onnx").write_bytes(b"stub")
        dlg = ModelDownloadDialog(models_dir=tmp_path)
        by_name = {dlg.table.item(i, 0).text(): dlg.table.item(i, 4).text() for i in range(dlg.table.rowCount())}
        assert by_name["RTMPose-t Halpe26"] == "downloaded"


class TestCameraThumbnailCard:
    def test_rotation_persists_and_rotates_thumbnail(self, app, workspace, tmp_path):
        cv2 = pytest.importorskip("cv2")
        import numpy as np

        from caliscope_tpu.gui.widgets import CameraThumbnailCard

        ws = workspace
        cid = sorted(ws.cameras.load().cameras)[0]
        video = ws.video_path("intrinsic", cid)
        video.parent.mkdir(parents=True, exist_ok=True)
        w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (96, 64))
        frame = np.zeros((64, 96, 3), np.uint8)
        frame[:, :48] = (255, 255, 255)  # left half bright: rotation-visible
        for _ in range(3):
            w.write(frame)
        w.release()

        card = CameraThumbnailCard()
        card.set_camera(ws, cid)
        assert card.rotation_count == 0
        base = card.thumb_array.copy()
        assert base.shape[0] < base.shape[1]  # landscape at rotation 0
        assert base[:, : base.shape[1] // 2].mean() > base[:, base.shape[1] // 2 :].mean()

        card.cw_btn.click()
        assert card.rotation_count == 1  # persisted
        assert ws.cameras.load().cameras[cid].rotation_count == 1
        rotated = card.thumb_array
        assert rotated.shape[0] > rotated.shape[1]  # portrait after 90 deg
        # bright half moved from left to the top (clockwise turn)
        assert rotated[: rotated.shape[0] // 2].mean() > rotated[rotated.shape[0] // 2 :].mean()

        card.ccw_btn.click()
        assert card.rotation_count == 0
        assert ws.cameras.load().cameras[cid].rotation_count == 0

        # a second card sees the persisted value
        card.cw_btn.click()
        card2 = CameraThumbnailCard()
        card2.set_camera(ws, cid)
        assert card2.rotation_count == 1
