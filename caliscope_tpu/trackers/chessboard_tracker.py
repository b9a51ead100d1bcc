"""Plain-chessboard tracker: X-corners + lattice ordering, all-or-nothing.

Parity: reference src/caliscope/trackers/chessboard_tracker.py:50 —
object_id 0, keypoint_id = inner-corner index (row-major), detection succeeds
only when the COMPLETE inner grid is found (findChessboardCorners contract);
the 180-degree symmetry caveat applies equally (docs/scripting.md:358-363).

Lattice ordering (replacing cv2's grown-quad graph): detected corners are
organized by estimating the two lattice vectors from nearest-neighbor
difference clustering, assigning integer grid coordinates, then refining with
a homography fit and re-assignment — robust to moderate perspective.
"""

from __future__ import annotations

import logging

import numpy as np

from caliscope_tpu.detect.corners import detect_x_corners_device
from caliscope_tpu.packets import PixelFormat, PointPacket
from caliscope_tpu.targets.chessboard import Chessboard
from caliscope_tpu.tracker import Tracker

logger = logging.getLogger(__name__)


def _order_grid(corners: np.ndarray, inner_rows: int, inner_cols: int):
    """Assign detected corners to an (inner_rows x inner_cols) lattice.

    Returns (keypoint_ids, ordered_xy) covering the FULL grid, or None.
    """
    n_expected = inner_rows * inner_cols
    if len(corners) < n_expected:
        return None

    # nearest-neighbor difference vectors
    d2 = np.sum((corners[:, None] - corners[None, :]) ** 2, axis=2)
    np.fill_diagonal(d2, np.inf)
    k = min(4, len(corners) - 1)
    nn = np.argsort(d2, axis=1)[:, :k]
    diffs = corners[nn] - corners[:, None, :]  # (N, k, 2)
    diffs = diffs.reshape(-1, 2)
    # canonicalize direction (half-plane)
    flip = (diffs[:, 0] < 0) | ((diffs[:, 0] == 0) & (diffs[:, 1] < 0))
    diffs[flip] *= -1
    norms = np.linalg.norm(diffs, axis=1)
    med = np.median(norms)
    good = (norms > 0.5 * med) & (norms < 1.5 * med)
    diffs = diffs[good]
    if len(diffs) < 4:
        return None
    # two dominant directions via angle histogram
    ang = np.arctan2(diffs[:, 1], diffs[:, 0])  # [-pi/2, pi/2]-ish after flip
    order = np.argsort(ang)
    ang_s = ang[order]
    gaps = np.diff(ang_s)
    if len(gaps) == 0 or gaps.max() < 0.3:
        return None
    split = np.argmax(gaps) + 1
    g1 = diffs[order[:split]]
    g2 = diffs[order[split:]]
    if len(g1) == 0 or len(g2) == 0:
        return None
    v1 = np.median(g1, axis=0)
    v2 = np.median(g2, axis=0)

    def assign(v1, v2):
        A = np.stack([v1, v2], axis=1)
        if abs(np.linalg.det(A)) < 1e-6:
            return None
        p0 = corners[np.argmin(corners.sum(axis=1))]
        ab = np.linalg.solve(A, (corners - p0).T).T
        ij = np.round(ab).astype(int)
        resid = np.linalg.norm(ab - ij, axis=1)
        return ij, resid

    out = assign(v1, v2)
    if out is None:
        return None
    ij, resid = out

    # refine with a homography over confident assignments, then re-assign
    conf = resid < 0.25
    if conf.sum() >= 8:
        from caliscope_tpu.frame_selector import _frame_homography

        H = _frame_homography(ij[conf].astype(float), corners[conf])
        if H is not None:
            # re-assign every corner to its nearest integer lattice node via H^-1
            Hi = np.linalg.inv(H)
            ones = np.ones((len(corners), 1))
            back = (Hi @ np.hstack([corners, ones]).T).T
            ab = back[:, :2] / back[:, 2:3]
            ij = np.round(ab).astype(int)
            resid = np.linalg.norm(ab - ij, axis=1)

    keep = resid < 0.3
    ij = ij - ij[keep].min(axis=0)
    grid: dict[tuple[int, int], int] = {}
    for idx in np.where(keep)[0]:
        key = (int(ij[idx, 0]), int(ij[idx, 1]))
        if key not in grid or resid[idx] < resid[grid[key]]:
            grid[key] = int(idx)

    # try both axis orientations and every (inner_cols x inner_rows) window of
    # the observed lattice — spurious corners outside the board (L-corners at
    # the pattern boundary) extend the lattice but never fill a full window
    if not grid:
        return None
    for rows_axis in (0, 1):
        cols_axis = 1 - rows_axis
        max_c = max(k[cols_axis] for k in grid)
        max_r = max(k[rows_axis] for k in grid)
        for oc in range(max_c - inner_cols + 2):
            for orr in range(max_r - inner_rows + 2):
                kps, xy = [], []
                complete = True
                for r in range(inner_rows):
                    for c in range(inner_cols):
                        cc, rr = c + oc, r + orr
                        key = (cc, rr) if rows_axis == 1 else (rr, cc)
                        idx = grid.get(key)
                        if idx is None:
                            complete = False
                            break
                        kps.append(r * inner_cols + c)
                        xy.append(corners[idx])
                    if not complete:
                        break
                if complete:
                    return np.asarray(kps, np.int64), np.asarray(xy)
    return None


class ChessboardTracker(Tracker):
    def __init__(self, chessboard: Chessboard, k_max: int = 256):
        self.chessboard = chessboard
        self.k_max = k_max

    @property
    def name(self) -> str:
        return "CHESSBOARD"

    @property
    def pixel_format(self) -> PixelFormat:
        return PixelFormat.GRAY

    def _detect(self, frame: np.ndarray, cam_id: int = 0, rotation_count: int = 0) -> PointPacket:
        gray = frame if frame.ndim == 2 else frame.mean(axis=2)
        xy, score, valid = detect_x_corners_device(gray[None].astype(np.float32), k_max=self.k_max)
        cand = np.asarray(xy)[0][np.asarray(valid)[0]]
        result = _order_grid(cand, self.chessboard.inner_rows, self.chessboard.inner_columns)
        if result is None:
            return PointPacket.empty()
        kps, img_xy = result
        obj = self.chessboard.object_points()[kps]
        return PointPacket(
            object_id=np.zeros(len(kps), np.int64),
            keypoint_id=kps,
            img_loc=img_xy,
            obj_loc=obj,
        )

    def get_point_name(self, keypoint_id: int) -> str:
        return f"corner_{int(keypoint_id)}"

    def get_connected_points(self) -> set[tuple[int, int]]:
        return set(self.chessboard.connectivity())
