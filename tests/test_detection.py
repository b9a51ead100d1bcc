"""Detection kernel + tracker tests with cv2 as RENDERER and ORACLE.

Boards are rendered with OpenCV (independent code path), warped with known
homographies, and our TPU-native detectors must recover ids and subpixel
corners against exact projected ground truth — with cv2's own detectors as
accuracy oracles (reference oracle strategy, tests/oracle_ffmpeg.py analog).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from caliscope_tpu.detect.aruco import detect_markers
from caliscope_tpu.detect.corners import detect_x_corners_device
from caliscope_tpu.detect.dictionaries import get_dictionary, match_bits
from caliscope_tpu.targets import ArucoMarker, ArucoMarkerSet, Charuco, Chessboard
from caliscope_tpu.trackers import ArucoTracker, CharucoTracker, ChessboardTracker


def _warp(img0, dst_quad, out_size=(640, 480), blur=0.8):
    H0, W0 = img0.shape
    src = np.array([[0, 0], [W0 - 1, 0], [W0 - 1, H0 - 1], [0, H0 - 1]], np.float32)
    H = cv2.getPerspectiveTransform(src, np.asarray(dst_quad, np.float32))
    img = cv2.warpPerspective(img0, H, out_size, borderValue=255)
    return cv2.GaussianBlur(img, (3, 3), blur), H


def _project(H, pts):
    ones = np.ones((len(pts), 1))
    q = (H @ np.hstack([pts, ones]).T).T
    return q[:, :2] / q[:, 2:3]


class TestDictionaries:
    def test_bits_match_opencv(self):
        d = get_dictionary("DICT_4X4_50")
        cvd = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
        for mid in (0, 7, 23, 49):
            img = cv2.aruco.generateImageMarker(cvd, mid, 6)
            bits = (img[1:-1, 1:-1] > 128).astype(np.uint8)
            np.testing.assert_array_equal(d.bits[mid], bits)

    def test_rotation_invariant_match(self):
        d = get_dictionary("DICT_4X4_50")
        for rot in range(4):
            bits = np.rot90(d.bits[13], k=rot)[None].astype(np.float32)
            ids, rots, ham = match_bits(bits, d)
            assert ids[0] == 13 and ham[0] == 0

    def test_garbage_rejected(self):
        d = get_dictionary("DICT_4X4_50")
        rng = np.random.default_rng(0)
        # random grids overwhelmingly exceed the correction budget
        bits = rng.integers(0, 2, size=(32, 4, 4)).astype(np.float32)
        ids, _, ham = match_bits(bits, d)
        assert (ids == -1).mean() > 0.5


class TestArucoDetection:
    def test_ids_and_subpixel_accuracy(self):
        cvd = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
        marker = cv2.aruco.generateImageMarker(cvd, 17, 240)
        dst = [[150.3, 120.7], [360.8, 140.2], [340.5, 330.9], [130.1, 300.4]]
        img, H = _warp(marker, dst)
        res = detect_markers(img[None], "DICT_4X4_50")[0]
        assert res.ids.tolist() == [17]
        gt = _project(H, np.array([[-0.5, -0.5], [239.5, -0.5], [239.5, 239.5], [-0.5, 239.5]]))
        err = np.linalg.norm(res.corners[0] - gt, axis=1)
        assert err.max() < 0.5, err

    def test_multiple_markers_batch(self):
        cvd = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
        canvas = np.full((480, 640), 255, np.uint8)
        for mid, x0, y0, size in [(3, 50, 60, 110), (29, 400, 90, 130), (44, 200, 300, 90)]:
            canvas[y0 : y0 + size, x0 : x0 + size] = cv2.aruco.generateImageMarker(cvd, mid, size)
        frames = np.stack([canvas, canvas])  # batch of 2
        results = detect_markers(frames, "DICT_4X4_50")
        for res in results:
            assert sorted(res.ids.tolist()) == [3, 29, 44]

    def test_aruco_tracker_identity_scheme(self):
        cvd = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
        canvas = np.full((480, 640), 255, np.uint8)
        canvas[100:260, 200:360] = cv2.aruco.generateImageMarker(cvd, 5, 160)
        ms = ArucoMarkerSet("DICT_4X4_50", {5: ArucoMarker(5, 0.16), 9: ArucoMarker(9, 0.1)})
        pkt = ArucoTracker(ms).get_points(canvas)
        assert len(pkt) == 4
        assert set(pkt.object_id) == {5}
        assert sorted(pkt.keypoint_id) == [0, 1, 2, 3]
        # obj_loc = marker-local corner geometry
        np.testing.assert_allclose(sorted(np.abs(pkt.obj_loc[:, 0])), [0.08] * 4)


class TestXCorners:
    def test_chessboard_corners_subpixel(self):
        rows, cols, sq = 6, 8, 60
        board = np.zeros((rows * sq, cols * sq), np.uint8)
        for r in range(rows):
            for c in range(cols):
                if (r + c) % 2 == 0:
                    board[r * sq : (r + 1) * sq, c * sq : (c + 1) * sq] = 255
        board = cv2.copyMakeBorder(board, 40, 40, 40, 40, cv2.BORDER_CONSTANT, value=255)
        img, H = _warp(board, [[90.4, 70.2], [530.7, 95.8], [500.3, 400.1], [110.9, 380.6]])
        gt = _project(
            H,
            np.array([[40 + c * sq - 0.5, 40 + r * sq - 0.5] for r in range(1, rows) for c in range(1, cols)]),
        )
        xy, _s, valid = detect_x_corners_device(img[None].astype(np.float32), k_max=64)
        cand = np.asarray(xy)[0][np.asarray(valid)[0]]
        d = np.linalg.norm(gt[:, None] - cand[None, :], axis=2).min(axis=1)
        assert (d < 0.5).all(), d.max()
        assert d.mean() < 0.3


class TestCharucoTracker:
    def _render_board(self, ch: Charuco, px=700, py=500, margin=40):
        cvd = cv2.aruco.getPredefinedDictionary(getattr(cv2.aruco, ch.dictionary))
        board = cv2.aruco.CharucoBoard((ch.columns, ch.rows), ch.square_size_m, ch.square_size_m * ch.aruco_scale, cvd)
        img0 = board.generateImage((px, py), marginSize=margin)
        sq_px = min((px - 2 * margin) / ch.columns, (py - 2 * margin) / ch.rows)
        bw, bh = sq_px * ch.columns, sq_px * ch.rows
        ox, oy = (px - bw) / 2, (py - bh) / 2
        corners_px = np.array(
            [
                [ox + (k % ch.inner_columns + 1) * sq_px - 0.5, oy + (k // ch.inner_columns + 1) * sq_px - 0.5]
                for k in range(ch.n_corners)
            ]
        )
        return img0, corners_px

    def test_full_board_detection(self):
        ch = Charuco(rows=5, columns=7, square_size_m=0.054)
        img0, corners_px = self._render_board(ch)
        img, H = _warp(img0, [[80.3, 60.2], [560.7, 90.8], [530.5, 420.9], [100.1, 400.4]])
        gt = _project(H, corners_px)
        pkt = CharucoTracker(ch).get_points(img)
        assert len(pkt) == ch.n_corners
        errs = np.array([np.linalg.norm(xy - gt[int(k)]) for k, xy in zip(pkt.keypoint_id, pkt.img_loc)])
        assert errs.max() < 0.6, errs.max()
        assert errs.mean() < 0.3
        assert (pkt.object_id == 0).all()
        np.testing.assert_allclose(pkt.obj_loc, ch.object_corners(0)[pkt.keypoint_id])

    def test_two_pass_full_board_detection(self):
        """detect_scale=2 (the remote-device two-pass: half-res pipeline +
        full-res host corner polish) must match full-res accuracy on a
        720p-class frame. Explicit scale: "auto" resolves to 1 on the CPU
        backend, where there is no upload to save."""
        ch = Charuco(rows=5, columns=7, square_size_m=0.054)
        img0, corners_px = self._render_board(ch, px=1100, py=760, margin=60)
        img, H = _warp(img0, [[120.3, 90.2], [990.7, 130.8], [940.5, 680.9], [150.1, 640.4]], out_size=(1280, 720))
        gt = _project(H, corners_px)
        pkt = CharucoTracker(ch, detect_scale=2).get_points(img)
        assert len(pkt) == ch.n_corners
        errs = np.array([np.linalg.norm(xy - gt[int(k)]) for k, xy in zip(pkt.keypoint_id, pkt.img_loc)])
        assert errs.max() < 0.8, errs.max()
        assert errs.mean() < 0.35

    def test_beats_or_matches_cv2_oracle(self):
        ch = Charuco(rows=5, columns=7, square_size_m=0.054)
        img0, corners_px = self._render_board(ch)
        img, H = _warp(img0, [[80.3, 60.2], [560.7, 90.8], [530.5, 420.9], [100.1, 400.4]])
        gt = _project(H, corners_px)
        pkt = CharucoTracker(ch).get_points(img)
        ours = np.mean([np.linalg.norm(xy - gt[int(k)]) for k, xy in zip(pkt.keypoint_id, pkt.img_loc)])
        cvd = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
        board = cv2.aruco.CharucoBoard((7, 5), 0.054, 0.054 * 0.75, cvd)
        c_corners, c_ids, _, _ = cv2.aruco.CharucoDetector(board).detectBoard(img)
        theirs = np.mean([np.linalg.norm(c.ravel() - gt[int(i)]) for c, i in zip(c_corners, c_ids.ravel())])
        assert ours < theirs * 1.5  # at worst modestly behind; typically ahead

    def test_two_sided_back_face(self):
        ch = Charuco(rows=5, columns=7, square_size_m=0.054, thickness_m=0.004)
        img0, corners_px = self._render_board(ch)
        back0 = img0[:, ::-1]  # the mirrored back face print
        img, H = _warp(np.ascontiguousarray(back0), [[80.3, 60.2], [560.7, 90.8], [530.5, 420.9], [100.1, 400.4]])
        tracker = CharucoTracker(ch)
        pkt = tracker.get_points(img, cam_id=4)
        assert len(pkt) >= ch.n_corners - 1  # marker-consensus may trim one edge corner
        assert (pkt.object_id == 1).all()
        np.testing.assert_allclose(pkt.obj_loc[:, 2], ch.thickness_m)
        # mirror hint cached per camera
        assert tracker._mirror_hint[4] is True

    def test_partial_occlusion_partial_board(self):
        ch = Charuco(rows=5, columns=7, square_size_m=0.054)
        img0, _ = self._render_board(ch)
        img, _H = _warp(img0, [[80.3, 60.2], [560.7, 90.8], [530.5, 420.9], [100.1, 400.4]])
        img[:, 400:] = 128  # occlude the right side
        pkt = CharucoTracker(ch).get_points(img)
        assert 0 < len(pkt) < ch.n_corners


class TestCharucoBatch:
    def test_batch_matches_per_frame(self):
        ch = Charuco(rows=5, columns=7, square_size_m=0.054)
        t = TestCharucoTracker()
        img0, _ = t._render_board(ch)
        f1, _ = _warp(img0, [[80.3, 60.2], [560.7, 90.8], [530.5, 420.9], [100.1, 400.4]])
        f2, _ = _warp(img0, [[120.1, 50.6], [590.2, 70.3], [560.4, 430.2], [90.7, 410.8]])
        f3 = np.full_like(f1, 128)  # no board at all
        stack = np.stack([f1, f2, f3])
        tracker = CharucoTracker(ch)
        batched = tracker.get_points_batch(stack)
        assert len(batched) == 3
        singles = [CharucoTracker(ch).get_points(f) for f in (f1, f2, f3)]
        for pb, ps in zip(batched, singles):
            assert len(pb) == len(ps)
            np.testing.assert_array_equal(pb.keypoint_id, ps.keypoint_id)
            np.testing.assert_allclose(pb.img_loc, ps.img_loc, atol=1e-9)

    def test_batch_mirrored_frames(self):
        ch = Charuco(rows=5, columns=7, square_size_m=0.054, thickness_m=0.004)
        t = TestCharucoTracker()
        img0, _ = t._render_board(ch)
        back0 = np.ascontiguousarray(img0[:, ::-1])
        f_front, _ = _warp(img0, [[80.3, 60.2], [560.7, 90.8], [530.5, 420.9], [100.1, 400.4]])
        f_back, _ = _warp(back0, [[80.3, 60.2], [560.7, 90.8], [530.5, 420.9], [100.1, 400.4]])
        tracker = CharucoTracker(ch)
        packets = tracker.get_points_batch(np.stack([f_front, f_back]), cam_id=2)
        assert (packets[0].object_id == 0).all()
        assert (packets[1].object_id == 1).all()
        np.testing.assert_allclose(packets[1].obj_loc[:, 2], ch.thickness_m)


class TestChessboardTracker:
    def test_full_grid_all_or_nothing(self):
        rows, cols, sq = 6, 8, 60
        board = np.zeros((rows * sq, cols * sq), np.uint8)
        for r in range(rows):
            for c in range(cols):
                if (r + c) % 2 == 0:
                    board[r * sq : (r + 1) * sq, c * sq : (c + 1) * sq] = 255
        board = cv2.copyMakeBorder(board, 40, 40, 40, 40, cv2.BORDER_CONSTANT, value=255)
        img, H = _warp(board, [[90.4, 70.2], [530.7, 95.8], [500.3, 400.1], [110.9, 380.6]])
        # rows/columns count INTERNAL corners (reference convention): the
        # rendered board has `rows x cols` squares -> (rows-1) x (cols-1)
        cb = Chessboard(rows=rows - 1, columns=cols - 1, square_size_m=0.06)
        pkt = ChessboardTracker(cb).get_points(img)
        assert len(pkt) == cb.n_corners
        # occluded -> all-or-nothing empty
        img2 = img.copy()
        img2[:, 350:] = 128
        assert len(ChessboardTracker(cb).get_points(img2)) == 0
