"""Media layer tests: sync algorithm edge cases (reference
tests/test_synchronized_timestamps.py) + FrameSource round trip with a
generated video (reference oracle strategy: encode then re-decode)."""

from types import MappingProxyType

import numpy as np
import pytest

from caliscope_tpu.media import FrameTimestamps, SynchronizedTimestamps
from caliscope_tpu.packets import PixelFormat


def _st(cams: dict[int, list[float]]) -> SynchronizedTimestamps:
    return SynchronizedTimestamps.from_timestamps(
        {cid: FrameTimestamps(MappingProxyType({i: t for i, t in enumerate(ts)})) for cid, ts in cams.items()}
    )


class TestSyncAlgorithm:
    def test_perfectly_aligned(self):
        st = _st({0: [0.0, 0.1, 0.2], 1: [0.0, 0.1, 0.2]})
        assert st.sync_indices == [0, 1, 2]
        for si in st.sync_indices:
            assert st.frame_for(si, 0) == si
            assert st.frame_for(si, 1) == si

    def test_slight_jitter_still_groups(self):
        st = _st({0: [0.00, 0.10, 0.20], 1: [0.01, 0.11, 0.21]})
        assert len(st.sync_indices) == 3
        for si in st.sync_indices:
            assert st.frame_for(si, 0) is not None
            assert st.frame_for(si, 1) is not None

    def test_dropped_frame_shows_as_none(self):
        # camera 1 missed the frame near t=0.1
        st = _st({0: [0.0, 0.1, 0.2, 0.3], 1: [0.0, 0.2, 0.3]})
        drops = [si for si in st.sync_indices if st.frame_for(si, 1) is None]
        assert len(drops) == 1
        # all of camera 0's frames assigned
        assigned0 = [st.frame_for(si, 0) for si in st.sync_indices]
        assert sorted(i for i in assigned0 if i is not None) == [0, 1, 2, 3]

    def test_offset_start(self):
        # camera 1 started two frames late
        st = _st({0: [0.0, 0.1, 0.2, 0.3], 1: [0.2, 0.3]})
        si_last = st.sync_indices[-2:]
        for si in si_last:
            assert st.frame_for(si, 1) is not None

    def test_single_camera(self):
        st = _st({0: [0.0, 0.1, 0.2]})
        assert len(st.sync_indices) == 3

    def test_mean_fps(self):
        st = _st({0: [0.0, 0.1, 0.2], 1: [0.0, 0.2, 0.4]})
        assert st.mean_fps == pytest.approx((10.0 + 5.0) / 2)

    def test_mean_fps_fallback(self):
        st = _st({0: [0.5]})
        assert st.mean_fps == 30.0

    def test_csv_round_trip(self, tmp_path):
        st = _st({0: [0.0, 0.1, 0.2], 1: [0.01, 0.11, 0.21]})
        st.to_csv(tmp_path / "timestamps.csv")
        st2 = SynchronizedTimestamps.from_csv(tmp_path)
        assert st2.sync_indices == st.sync_indices
        assert st2.cam_ids == st.cam_ids

    def test_inferred_timestamps(self):
        ft = FrameTimestamps.inferred(fps=30.0, frame_count=5)
        assert ft.get_time(3) == pytest.approx(0.1)
        assert ft.start_frame_index == 0 and ft.last_frame_index == 4


class TestFrameSource:
    @pytest.fixture
    def video(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        path = tmp_path / "test.mp4"
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 48))
        for i in range(10):
            frame = np.full((48, 64, 3), i * 20, np.uint8)
            w.write(frame)
        w.release()
        return path

    def test_reads_all_frames(self, video):
        from caliscope_tpu.media import FrameSource, read_video_properties

        props = read_video_properties(video)
        assert props.size == (64, 48)
        assert props.frame_count == 10
        with FrameSource(video, cam_id=3) as src:
            packets = list(src)
        assert len(packets) == 10
        assert [p.frame_index for p in packets] == list(range(10))
        assert all(p.cam_id == 3 for p in packets)
        # encoded intensity survives (lossy codec tolerance)
        assert abs(int(packets[5].frame.mean()) - 100) < 12

    def test_wanted_indices_skip(self, video):
        from caliscope_tpu.media import FrameSource

        with FrameSource(video, cam_id=0, wanted_indices={2, 5, 7}) as src:
            packets = list(src)
        assert [p.frame_index for p in packets] == [2, 5, 7]

    def test_gray_pixel_format(self, video):
        from caliscope_tpu.media import FrameSource

        with FrameSource(video, cam_id=0, pixel_format=PixelFormat.GRAY) as src:
            pkt = src.next_frame()
        assert pkt.frame.ndim == 2
        assert pkt.pixel_format is PixelFormat.GRAY
