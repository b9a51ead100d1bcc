"""Gap filling and trajectory smoothing on the point containers.

Reference analogs: point_data.py fill_gaps (:375, gap cap, linear
interpolation) and WorldPoints Butterworth smooth (:636).
"""

from __future__ import annotations

import numpy as np
import pytest

from caliscope_tpu.observations import STATIC_SYNC_INDEX, ImagePoints, WorldPoints


def _track(sync, xy, cam=0, obj=0, kp=0, obj_loc=None):
    n = len(sync)
    return ImagePoints(
        sync_index=np.asarray(sync),
        cam_id=np.full(n, cam),
        object_id=np.full(n, obj),
        keypoint_id=np.full(n, kp),
        img_xy=np.asarray(xy, float).reshape(n, 2),
        obj_loc=None if obj_loc is None else np.broadcast_to(obj_loc, (n, 3)).copy(),
    )


class TestImagePointsFillGaps:
    def test_small_gap_linearly_interpolated(self):
        ip = _track([0, 1, 4], [[0, 0], [10, 20], [40, 80]])
        out = ip.fill_gaps(max_gap=3)
        assert sorted(out.sync_index.tolist()) == [0, 1, 2, 3, 4]
        row2 = out.img_xy[out.sync_index == 2][0]
        row3 = out.img_xy[out.sync_index == 3][0]
        np.testing.assert_allclose(row2, [20, 40])
        np.testing.assert_allclose(row3, [30, 60])

    def test_gap_wider_than_cap_left_open(self):
        ip = _track([0, 5], [[0, 0], [50, 50]])
        out = ip.fill_gaps(max_gap=3)
        assert sorted(out.sync_index.tolist()) == [0, 5]

    def test_gap_exactly_at_cap_filled(self):
        # gap of max_gap missing frames is the largest that fills
        ip = _track([0, 4], [[0, 0], [40, 40]])
        out = ip.fill_gaps(max_gap=3)
        assert sorted(out.sync_index.tolist()) == [0, 1, 2, 3, 4]
        out2 = ip.fill_gaps(max_gap=2)
        assert sorted(out2.sync_index.tolist()) == [0, 4]

    def test_tracks_are_independent(self):
        a = _track([0, 2], [[0, 0], [2, 2]], kp=0)
        b = _track([0, 1, 2], [[5, 5], [6, 6], [7, 7]], kp=1)
        out = ImagePoints.concat([a, b]).fill_gaps(max_gap=3)
        filled_a = out.select((out.keypoint_id == 0) & (out.sync_index == 1))
        np.testing.assert_allclose(filled_a.img_xy[0], [1, 1])
        assert len(out.select(out.keypoint_id == 1)) == 3  # untouched

    def test_obj_loc_propagates_to_filled_rows(self):
        ip = _track([0, 2], [[0, 0], [2, 2]], obj_loc=np.array([0.1, 0.2, 0.0]))
        out = ip.fill_gaps(max_gap=2)
        filled = out.select(out.sync_index == 1)
        np.testing.assert_allclose(filled.obj_loc[0], [0.1, 0.2, 0.0])

    def test_zero_cap_is_noop(self):
        ip = _track([0, 2], [[0, 0], [2, 2]])
        assert sorted(ip.fill_gaps(max_gap=0).sync_index.tolist()) == [0, 2]


class TestWorldPointsFillGapsAndSmooth:
    def _wp(self, sync, xyz, obj=0, kp=0, ft=None):
        n = len(sync)
        return WorldPoints(
            np.asarray(sync), np.full(n, obj), np.full(n, kp),
            np.asarray(xyz, float).reshape(n, 3),
            None if ft is None else np.asarray(ft, float),
        )

    def test_fill_interpolates_xyz_and_frame_time(self):
        wp = self._wp([0, 3], [[0, 0, 0], [3, 6, 9]], ft=[0.0, 0.3])
        out = wp.fill_gaps(max_gap=2)
        assert sorted(out.sync_index.tolist()) == [0, 1, 2, 3]
        row1 = out.xyz[out.sync_index == 1][0]
        np.testing.assert_allclose(row1, [1, 2, 3])
        t2 = out.frame_time[out.sync_index == 2][0]
        assert t2 == pytest.approx(0.2)

    def test_static_points_never_interpolated(self):
        wp = WorldPoints(
            np.array([STATIC_SYNC_INDEX, 0, 3]),
            np.zeros(3), np.zeros(3),
            np.array([[9, 9, 9], [0, 0, 0], [3, 3, 3]], float),
        )
        out = wp.fill_gaps(max_gap=5)
        assert (out.sync_index == STATIC_SYNC_INDEX).sum() == 1
        assert sorted(out.sync_index.tolist()) == [STATIC_SYNC_INDEX, 0, 1, 2, 3]

    def test_smooth_attenuates_noise_keeps_signal(self):
        rng = np.random.default_rng(4)
        n = 120
        fps = 30.0
        t = np.arange(n) / fps
        clean = np.stack([np.sin(2 * np.pi * 0.5 * t), np.cos(2 * np.pi * 0.5 * t), 0.1 * t], axis=1)
        noisy = clean + rng.normal(scale=0.02, size=clean.shape)
        wp = self._wp(np.arange(n), noisy)
        sm = wp.smooth(fps=fps, cutoff_hz=4.0)
        err_noisy = np.abs(noisy - clean).mean()
        err_smooth = np.abs(sm.xyz - clean).mean()
        assert err_smooth < 0.65 * err_noisy  # real denoising (measured ~0.51)
        # the 0.5 Hz signal passes a 4 Hz low-pass nearly unchanged; the max
        # error sits at the filtfilt edge transients, well under 3 sigma
        assert np.abs(sm.xyz - clean).max() < 0.05

    def test_smooth_skips_short_tracks_and_static_points(self):
        xyz = np.array([[1, 1, 1], [2, 2, 2], [3, 3, 3]], float)
        wp = WorldPoints(np.array([STATIC_SYNC_INDEX, 0, 1]), np.zeros(3), np.zeros(3), xyz.copy())
        sm = wp.smooth(fps=30.0)
        np.testing.assert_allclose(sm.xyz, xyz)  # too short to filter; untouched
