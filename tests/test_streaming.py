"""Streaming processor + playback streamer tests (reference
process_synchronized_recording / frame_packet_streamer behavior)."""

import time
from queue import Empty

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from caliscope_tpu.cameras import CameraData
from caliscope_tpu.media import SynchronizedTimestamps
from caliscope_tpu.media.streamer import FramePacketStreamer
from caliscope_tpu.packets import PixelFormat, PointPacket
from caliscope_tpu.pipelines.process_recording import FrameData, process_synchronized_recording
from caliscope_tpu.tasks import CancellationToken
from caliscope_tpu.tracker import Tracker


class DotTracker(Tracker):
    @property
    def name(self):
        return "DOT"

    @property
    def pixel_format(self):
        return PixelFormat.GRAY

    def _detect(self, frame, cam_id=0, rotation_count=0):
        ys, xs = np.where(frame > 128)
        if len(xs) == 0:
            return PointPacket.empty()
        return PointPacket(np.array([0]), np.array([0]), np.array([[xs.mean(), ys.mean()]]))

    def get_point_name(self, keypoint_id):
        return "dot"


def _make_recording(tmp_path, cam_ids=(0, 1), n_frames=8):
    for cid in cam_ids:
        w = cv2.VideoWriter(str(tmp_path / f"cam_{cid}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (96, 64))
        for i in range(n_frames):
            frame = np.zeros((64, 96, 3), np.uint8)
            cv2.circle(frame, (12 + 8 * i, 32), 4, (255, 255, 255), -1)
            w.write(frame)
        w.release()
    return tmp_path


class TestProcessRecording:
    def test_ordered_assembly_with_callbacks(self, tmp_path):
        rec = _make_recording(tmp_path)
        synced = SynchronizedTimestamps.from_video_paths({c: rec / f"cam_{c}.mp4" for c in (0, 1)})
        cams = {c: CameraData(c, (96, 64)) for c in (0, 1)}
        seen_syncs = []
        progress = []

        def on_frame_data(si, data: dict[int, FrameData]):
            seen_syncs.append(si)
            assert set(data) <= {0, 1}
            for fd in data.values():
                assert fd.frame is not None

        ip = process_synchronized_recording(
            rec, cams, DotTracker(), synced,
            on_frame_data=on_frame_data, on_progress=lambda i, n: progress.append((i, n)),
        )
        assert seen_syncs == sorted(seen_syncs)
        assert len(ip) == 16  # 8 frames x 2 cameras x 1 point
        assert progress[-1][0] == progress[-1][1]

    def test_subsample_and_cancellation(self, tmp_path):
        rec = _make_recording(tmp_path)
        synced = SynchronizedTimestamps.from_video_paths({c: rec / f"cam_{c}.mp4" for c in (0, 1)})
        cams = {c: CameraData(c, (96, 64)) for c in (0, 1)}
        ip = process_synchronized_recording(rec, cams, DotTracker(), synced, subsample=2)
        assert len(np.unique(ip.sync_index)) == 4

        token = CancellationToken()
        token.cancel()
        ip2 = process_synchronized_recording(rec, cams, DotTracker(), synced, token=token)
        assert len(ip2) == 0


class TestStreamer:
    def test_streams_tracked_frames(self, tmp_path):
        rec = _make_recording(tmp_path, cam_ids=(0,))
        s = FramePacketStreamer(rec / "cam_0.mp4", cam_id=0, tracker=DotTracker(), fps_override=120.0)
        q = s.subscribe()
        s.play()
        got = []
        deadline = time.time() + 10
        while len(got) < 8 and time.time() < deadline:
            try:
                item = q.get(timeout=1.0)
            except Empty:
                continue
            if item is None:
                break
            got.append(item)
        s.stop()
        assert len(got) >= 4
        assert all(len(tf.points) == 1 for tf in got)
        indices = [tf.frame_index for tf in got]
        assert indices == sorted(indices)

    def test_pause_and_seek(self, tmp_path):
        rec = _make_recording(tmp_path, cam_ids=(0,))
        s = FramePacketStreamer(rec / "cam_0.mp4", cam_id=0, fps_override=200.0)
        q = s.subscribe()
        s.seek(5)
        s.play()
        deadline = time.time() + 5
        first = None
        while time.time() < deadline:
            try:
                item = q.get(timeout=1.0)
            except Empty:
                continue
            if item is not None:
                first = item
                break
        s.stop()
        assert first is not None and first.frame_index >= 5

    def test_loop_end_behavior_wraps(self, tmp_path):
        rec = _make_recording(tmp_path, cam_ids=(0,))
        s = FramePacketStreamer(rec / "cam_0.mp4", cam_id=0, fps_override=500.0, end_behavior="loop")
        q = s.subscribe()
        s.play()
        indices = []
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                item = q.get(timeout=1.0)
            except Empty:
                continue
            assert item is not None, "loop mode must never publish the end sentinel"
            indices.append(item.frame_index)
            # wrapped: a later element smaller than its predecessor
            if any(b < a for a, b in zip(indices, indices[1:])):
                break
        s.stop()
        assert any(b < a for a, b in zip(indices, indices[1:])), indices

    def test_pause_end_behavior_holds(self, tmp_path):
        rec = _make_recording(tmp_path, cam_ids=(0,))
        s = FramePacketStreamer(rec / "cam_0.mp4", cam_id=0, fps_override=500.0, end_behavior="pause")
        q = s.subscribe()
        s.play()
        deadline = time.time() + 10
        while time.time() < deadline and not s._pause.is_set():
            try:
                q.get(timeout=0.5)
            except Empty:
                pass
        assert s._pause.is_set(), "end of stream should flip to paused"
        # still alive: a backward seek + resume keeps streaming
        s.seek(0)
        s.play()
        got = None
        deadline = time.time() + 5
        while time.time() < deadline:
            try:
                got = q.get(timeout=1.0)
                if got is not None:
                    break
            except Empty:
                continue
        s.stop()
        assert got is not None

    def test_set_fps_target(self, tmp_path):
        rec = _make_recording(tmp_path, cam_ids=(0,))
        s = FramePacketStreamer(rec / "cam_0.mp4", cam_id=0, fps_override=30.0)
        s.set_fps_target(240.0)
        assert s.fps == 240.0
        s.set_fps_target(None)
        assert s.fps == s._native_fps


class TestStreamerParitySurface:
    def test_metadata_properties(self, tmp_path):
        rec = _make_recording(tmp_path, cam_ids=(0,))
        s = FramePacketStreamer(rec / "cam_0.mp4", cam_id=0)
        assert s.size == (96, 64)
        assert s.original_fps == pytest.approx(30.0, rel=0.01)
        assert s.last_frame_index == s.frame_count - 1
        assert s.frame_index == 0
        assert s.frame_time == pytest.approx(0.0)
        s.seek(4)
        s.play()
        time.sleep(0.3)
        s.pause()
        assert s.frame_time == pytest.approx(s.frame_index / 30.0, rel=1e-6)
        s.stop()

    def test_update_tracker_mid_playback(self, tmp_path):
        """Swapping in a GRAY tracker mid-stream reopens the decoder with the
        new pixel format and subsequent frames carry tracked points."""
        rec = _make_recording(tmp_path, cam_ids=(0,), n_frames=30)
        s = FramePacketStreamer(rec / "cam_0.mp4", cam_id=0, fps_override=60.0, end_behavior="pause")
        q = s.subscribe()
        s.play()
        time.sleep(0.15)
        s.update_tracker(DotTracker())
        # one in-flight BGR frame may still be tracked before the worker sees
        # the reopen flag; wait for the first post-reopen (GRAY) frame
        gray = None
        deadline = time.time() + 10
        while time.time() < deadline and gray is None:
            try:
                item = q.get(timeout=1.0)
            except Empty:
                continue
            if item is not None and hasattr(item, "points") and item.packet.frame.ndim == 2:
                gray = item
        s.stop()
        assert gray is not None, "no GRAY tracked frames after update_tracker"

    def test_unpause_and_close_aliases(self, tmp_path):
        rec = _make_recording(tmp_path, cam_ids=(0,), n_frames=20)
        s = FramePacketStreamer(rec / "cam_0.mp4", cam_id=0, fps_override=200.0, end_behavior="pause")
        q = s.subscribe()
        s.play()
        time.sleep(0.1)
        s.pause()
        time.sleep(0.1)  # pause is asynchronous: let any in-flight frame land
        pos = s.position
        time.sleep(0.2)
        assert s.position == pos  # held
        s.unpause()
        deadline = time.time() + 5
        moved = False
        while time.time() < deadline:
            try:
                if q.get(timeout=0.5) is not None:
                    moved = True
                    break
            except Empty:
                continue
        s.close()
        assert moved
