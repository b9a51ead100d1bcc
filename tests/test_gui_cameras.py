"""Round-4 GUI back-half: camera list sidebar, cameras tab, theme,
threaded frame rendering, playback view model.

Parity targets: reference gui/camera_list_widget.py, cameras_tab_widget.py,
theme.py, view_models/playback_view_model.py, and the FrameRenderThread in
gui/views/intrinsic_calibration_widget.py:341. Headless backend (same code
runs under PySide6 unmodified).
"""

import os
import time

os.environ["CALISCOPE_TPU_FORCE_HEADLESS_QT"] = "1"

import numpy as np
import pytest

from caliscope_tpu.cameras import CameraArray, CameraData
from caliscope_tpu.gui import headless
from caliscope_tpu.gui.qt import QApplication, Qt
from caliscope_tpu.gui.theme import Colors, Styles
from caliscope_tpu.gui.widgets.camera_list import CameraListWidget


@pytest.fixture
def app():
    headless.QApplication._reset_for_tests()
    a = QApplication([])
    yield a
    headless.QApplication._reset_for_tests()


def pump(app, until=None, timeout=30.0):
    deadline = time.monotonic() + timeout
    while True:
        app.processEvents()
        if until is None or until():
            return
        if time.monotonic() > deadline:
            raise TimeoutError("GUI condition not reached")
        time.sleep(0.01)


def _array(calibrated: set[int] = frozenset(), n: int = 3) -> CameraArray:
    cams = {}
    for cid in range(n):
        cam = CameraData(cam_id=cid, size=(64, 48))
        if cid in calibrated:
            cam.matrix = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
            cam.distortions = np.zeros(5)
            cam.error = 0.25
        cams[cid] = cam
    return CameraArray(cams)


class TestCameraListWidget:
    def test_rows_show_status_glyphs(self, app):
        lst = CameraListWidget(_array(calibrated={1}))
        assert lst.count() == 3
        assert lst.item(0).text().startswith("○")  # uncalibrated: hollow
        assert lst.item(1).text().startswith("●")  # calibrated: filled
        assert "0.25px" in lst.item(1).text()  # RMSE surfaced
        assert lst.item(1).foreground().color().name() == Colors.SUCCESS
        assert lst.item(0).foreground().color().name() == Colors.ERROR

    def test_selection_emits_cam_id(self, app):
        lst = CameraListWidget(_array())
        got = []
        lst.camera_selected.connect(got.append)
        lst.setCurrentRow(2)
        assert got == [2]

    def test_refresh_preserves_selection_without_reemit(self, app):
        lst = CameraListWidget(_array())
        got = []
        lst.camera_selected.connect(got.append)
        lst.setCurrentRow(1)
        assert got == [1]
        lst.refresh(_array(calibrated={1}))
        # selection kept, signal NOT re-fired (would tear down presenters)
        assert lst.currentItem().data(Qt.ItemDataRole.UserRole) == 1
        assert got == [1]
        assert lst.item(1).text().startswith("●")

    def test_select_cam_id(self, app):
        lst = CameraListWidget(_array())
        lst.select_cam_id(2)
        assert lst.currentRow() == 2


class TestTheme:
    def test_styles_are_composed_from_palette(self):
        assert Colors.PRIMARY in Styles.PRIMARY_BUTTON
        assert Colors.PRIMARY_PRESSED in Styles.LIST_SIDEBAR
        assert "disabled" in Styles.PRIMARY_BUTTON


class TestFrameRenderThread:
    def test_renders_queue_to_pixmaps(self, app):
        from caliscope_tpu.gui.frame_render import (
            FrameRenderThread,
            TrackedFrame,
            make_display_queue,
            offer_frame,
        )

        q = make_display_queue()
        cam = CameraData(cam_id=0, size=(64, 48))
        t = FrameRenderThread(q, cam, pixmap_edge_length=64)
        got = []
        t.image_ready.connect(got.append)
        t.start()
        frame = np.full((48, 64), 120, np.uint8)
        offer_frame(q, TrackedFrame(frame, np.array([[10.0, 10.0]]), np.array([[5.0, 5.0]])))
        offer_frame(q, None)  # stop sentinel
        pump(app, until=lambda: len(got) >= 1 and not t.isRunning())
        assert t.wait(2000)
        img = got[0].array
        # overlay pixels actually stamped: current point red at (10, 10)
        assert img is not None
        assert tuple(img[10, 10]) == (220, 40, 40)
        assert tuple(img[5, 5]) == (40, 170, 170)

    def test_overlay_toggle_rerenders_cached(self, app):
        from caliscope_tpu.gui.frame_render import (
            FrameRenderThread,
            TrackedFrame,
            make_display_queue,
        )

        q = make_display_queue()
        t = FrameRenderThread(q, CameraData(cam_id=0, size=(64, 48)), pixmap_edge_length=64)
        got = []
        t.image_ready.connect(got.append)
        t._last = TrackedFrame(np.zeros((48, 64), np.uint8), np.array([[10.0, 10.0]]))
        t.set_overlay_visibility(current_points=False, accumulated=True, selected_grids=True)
        t.rerender_cached()
        img = got[-1].array
        assert tuple(img[10, 10]) == (0, 0, 0)  # current-points layer off

    def test_offer_frame_drops_oldest_under_pressure(self):
        from caliscope_tpu.gui.frame_render import TrackedFrame, make_display_queue, offer_frame

        q = make_display_queue(maxsize=2)
        frames = [TrackedFrame(np.full((2, 2), i, np.uint8)) for i in range(5)]
        for f in frames:
            offer_frame(q, f)  # never blocks
        kept = [q.get_nowait().frame[0, 0] for _ in range(2)]
        assert kept == [3, 4]  # oldest dropped, newest kept


class TestDisplayTee:
    def test_presenter_tee_feeds_queue_during_extraction(self, app):
        from caliscope_tpu.gui.frame_render import make_display_queue
        from caliscope_tpu.packets import PixelFormat, PointPacket
        from caliscope_tpu.presenters.intrinsic import _DisplayTeeTracker
        from caliscope_tpu.tracker import Tracker

        class FakeTracker(Tracker):
            @property
            def name(self):
                return "FAKE"

            @property
            def pixel_format(self):
                return PixelFormat.GRAY

            def _detect(self, frame, cam_id=0, rotation_count=0):
                return PointPacket(
                    object_id=np.zeros(1), keypoint_id=np.zeros(1),
                    img_loc=np.array([[3.0, 4.0]]), obj_loc=np.zeros((1, 3)),
                )

            def get_point_name(self, keypoint_id):
                return "p"

        q = make_display_queue()
        tee = _DisplayTeeTracker(FakeTracker(), q)
        frames = np.zeros((3, 8, 8), np.uint8)
        pkts = tee.get_points_batch(frames)
        assert len(pkts) == 3 and all(len(p) == 1 for p in pkts)
        items = [q.get_nowait() for _ in range(3)]
        assert all(it.frame.shape == (8, 8) for it in items)
        # accumulated coverage grows monotonically
        assert [len(it.accumulated_xy) for it in items] == [1, 2, 3]


class TestPlaybackViewModel:
    def _world_points(self):
        from caliscope_tpu.observations import STATIC_SYNC_INDEX, WorldPoints

        # two dynamic frames + one static (rigid) point
        sync = np.array([0, 0, 2, STATIC_SYNC_INDEX])
        obj = np.array([0, 0, 0, 1])
        kp = np.array([7, 9, 7, 0])
        xyz = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]], float)
        return WorldPoints(sync, obj, kp, xyz)

    def _vm(self, wireframe=None):
        from caliscope_tpu.gui.view_models import PlaybackViewModel

        return PlaybackViewModel(_array(calibrated={0}), self._world_points(), wireframe)

    def test_canonical_map_and_fixed_buffers(self):
        vm = self._vm()
        assert vm.n_points == 3  # (0,7), (0,9), (1,0)
        geo0 = vm.get_frame_geometry(0)
        assert geo0.points.shape == (3, 3)
        i07 = vm.id_to_index[(0, 7)]
        i09 = vm.id_to_index[(0, 9)]
        assert np.allclose(geo0.points[i07], [0, 0, 0])
        assert np.allclose(geo0.points[i09], [1, 0, 0])
        geo2 = vm.get_frame_geometry(2)
        assert np.allclose(geo2.points[i07], [0, 1, 0])
        assert np.isnan(geo2.points[i09]).all()  # missing -> NaN, same index

    def test_static_points_composited_into_every_frame(self):
        vm = self._vm()
        i_static = vm.id_to_index[(1, 0)]
        for sync in (0, 2):
            assert np.allclose(vm.get_frame_geometry(sync).points[i_static], [5, 5, 5])

    def test_valid_sync_indices_skip_static_and_empty(self):
        vm = self._vm()
        assert vm.valid_sync_indices.tolist() == [0, 2]
        assert vm.min_index == 0 and vm.max_index == 2

    def test_wireframe_topology_resolved_to_buffer_indices(self):
        from caliscope_tpu.tracker import Segment, WireFrameView

        wf = WireFrameView(
            segments=(Segment(name="a", color="g", point_A="A", point_B="B"),),
            point_names={"A": 7, "B": 9},
        )
        vm = self._vm(wireframe=wf)
        lines, colors = vm.get_static_wireframe_data()
        assert lines.shape == (1, 2)
        assert {int(lines[0, 0]), int(lines[0, 1])} == {vm.id_to_index[(0, 7)], vm.id_to_index[(0, 9)]}
        assert colors.shape == (1, 3)

    def test_camera_only_mode(self):
        from caliscope_tpu.gui.view_models import PlaybackViewModel

        vm = PlaybackViewModel.from_camera_array_only(_array(calibrated={0}))
        assert not vm.has_points
        assert vm.get_frame_geometry(0).points.shape == (0, 3)

    def test_playback_widget_renders_view_model(self, app):
        from caliscope_tpu.gui.widgets import Playback3DWidget
        from caliscope_tpu.synthetic.factories import default_ring_scene

        scene = default_ring_scene(n_frames=4)
        vm = self._vm()
        vm.camera_array = scene.cameras
        w = Playback3DWidget(width=160, height=120)
        w.set_view_model(vm)
        assert w.canvas.pixmap() is not None
        w.slider.setValue(1)  # scrub to the second valid sync index
        assert w.current_sync_index() == 2


class TestCamerasTab:
    def test_tab_pools_panels_and_previews_pattern(self, app, tmp_path):
        from caliscope_tpu.gui.views import CamerasTabWidget
        from caliscope_tpu.targets import Charuco
        from caliscope_tpu.workspace import Workspace

        ws = Workspace.create(tmp_path / "ws")
        ws.targets.save_intrinsic_charuco(Charuco(rows=4, columns=5, square_size_m=0.05))
        ws.cameras.save(_array(calibrated={0}))

        class Win:
            pass

        win = Win()
        win.ws = ws
        tab = CamerasTabWidget(win)
        # auto-selected first camera -> one pooled panel
        assert tab._current_cam_id == 0
        assert set(tab._panels) == {0}
        panel0 = tab._panels[0]
        tab.camera_list.select_cam_id(1)
        assert tab._current_cam_id == 1
        assert set(tab._panels) == {0, 1}
        assert tab._panels[0] is panel0  # pooled, not recreated
        # pattern preview rendered from the configured target
        assert tab.pattern_preview.pixmap() is not None
        assert "5 x 4" in tab.pattern_info.text()
        # frame-skip propagates
        tab.frame_skip_spin.setValue(7)
        assert tab.frame_skip == 7
        tab.cleanup()

    def test_calibration_complete_updates_sidebar(self, app, tmp_path):
        from caliscope_tpu.gui.views import CamerasTabWidget
        from caliscope_tpu.pipelines.calibrate_intrinsics import (
            IntrinsicCalibrationOutput,
            IntrinsicCalibrationReport,
        )
        from caliscope_tpu.targets import Charuco
        from caliscope_tpu.workspace import Workspace

        ws = Workspace.create(tmp_path / "ws")
        ws.targets.save_intrinsic_charuco(Charuco(rows=4, columns=5, square_size_m=0.05))
        ws.cameras.save(_array())

        class Win:
            pass

        win = Win()
        win.ws = ws
        tab = CamerasTabWidget(win)
        assert tab.camera_list.item(1).text().startswith("○")
        cam = _array(calibrated={1}).cameras[1]
        report = IntrinsicCalibrationReport(
            rmse=0.3, frames_used=10, coverage_fraction=0.8,
            edge_coverage_fraction=0.5, corner_coverage_fraction=0.5,
            orientation_sufficient=True, orientation_count=4,
            selected_frames=(0, 1, 2),
        )
        tab.on_calibration_complete(1, IntrinsicCalibrationOutput(camera=cam, report=report))
        assert tab.camera_list.item(1).text().startswith("●")
        assert ws.cameras.load().cameras[1].matrix is not None
        tab.cleanup()


class TestFrameTools:
    def test_resize_to_square_and_rotation(self):
        from caliscope_tpu.gui.frame_tools import apply_rotation, frame_to_qimage, resize_to_square

        frame = np.arange(6, dtype=np.uint8).reshape(2, 3)
        sq = resize_to_square(frame)
        assert sq.shape == (3, 3)
        assert sq[0].tolist() == [0, 1, 2]  # content top-aligned after 0-pad split
        r1 = apply_rotation(frame, 1)  # clockwise
        assert r1.shape == (3, 2)
        assert r1[0].tolist() == [3, 0]
        r_neg = apply_rotation(frame, -1)
        np.testing.assert_array_equal(r_neg, apply_rotation(frame, 3))
        np.testing.assert_array_equal(apply_rotation(frame, 4), frame)
        img = frame_to_qimage(frame)
        assert img.width() == 3 and img.height() == 2


class TestGcConfinement:
    def test_confines_and_restores(self, app):
        import gc

        from caliscope_tpu.gui import gc_confinement

        assert gc.isenabled()
        timer = gc_confinement.enable(interval_ms=50)
        try:
            assert not gc.isenabled()
            assert timer.isActive()
        finally:
            gc_confinement.disable(timer)
        assert gc.isenabled()
        assert not timer.isActive()


class TestLinkLabelAndPlaceholder:
    def test_link_label_styles_and_clicks(self, app):
        from caliscope_tpu.gui.theme import Colors
        from caliscope_tpu.gui.widgets import LinkLabel

        lbl = LinkLabel("docs")
        assert Colors.PRIMARY in lbl._style and "text-decoration: none" in lbl._style
        lbl.set_hovered(True)
        assert "text-decoration: underline" in lbl._style
        got = []
        lbl.clicked.connect(lambda: got.append(1))
        lbl.click()
        assert got == [1]

    def test_cameras_tab_shows_placeholder_without_videos(self, app, tmp_path):
        from caliscope_tpu.gui.views import CamerasTabWidget
        from caliscope_tpu.workspace import Workspace

        ws = Workspace.create(tmp_path / "ws")

        class Win:
            pass

        win = Win()
        win.ws = ws
        tab = CamerasTabWidget(win)
        assert tab.camera_list.count() == 0
        assert "No intrinsic calibration videos" in tab.placeholder.label.text()
        tab.cleanup()
