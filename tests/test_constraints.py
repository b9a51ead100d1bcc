"""Targets + constraint-compiler tests (reference tests/test_constraints.py,
test_charuco.py semantics)."""

import numpy as np
import pytest

from caliscope_tpu.constraints import ConstraintSet, rigidity_report
from caliscope_tpu.observations import STATIC_SYNC_INDEX, ImagePoints, WorldPoints
from caliscope_tpu.targets import ArucoMarker, ArucoMarkerSet, Charuco, Chessboard, DistanceLink, MirrorPair
from caliscope_tpu.targets.charuco import fit_dictionary_pool, DictionaryCapacityError


class TestTargets:
    def test_charuco_corner_layout_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        ch = Charuco(rows=5, columns=7, square_size_m=0.054)
        d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
        b = cv2.aruco.CharucoBoard((7, 5), 0.054, 0.054 * 0.75, d)
        np.testing.assert_allclose(ch.chessboard_corners(), b.getChessboardCorners(), atol=1e-9)

    def test_charuco_two_sided_back_face(self):
        ch = Charuco(rows=4, columns=5, square_size_m=0.05, thickness_m=0.005)
        front = ch.object_corners(0)
        back = ch.object_corners(1)
        assert (back[:, 2] == 0.005).all()
        # back corner k sits DIRECTLY BEHIND front corner k (same x, y):
        # reference charuco_tracker.py:123-140 keeps front-face keypoint ids
        np.testing.assert_allclose(back[:, :2], front[:, :2])
        assert ch.expected_object_ids() == frozenset({0, 1})

    def test_dictionary_pool_fitting(self):
        assert fit_dictionary_pool("DICT_4X4_50", 60) == "DICT_4X4_100"
        assert fit_dictionary_pool("DICT_5X5_1000", 40) == "DICT_5X5_50"
        with pytest.raises(DictionaryCapacityError):
            fit_dictionary_pool("DICT_4X4_50", 5000)

    def test_marker_set_validation(self):
        m = {0: ArucoMarker(0, 0.1), 1: ArucoMarker(1, 0.1)}
        ArucoMarkerSet("DICT_4X4_50", m)
        with pytest.raises(ValueError, match="outside the"):
            ArucoMarkerSet("DICT_4X4_50", {99: ArucoMarker(99, 0.1), 0: ArucoMarker(0, 0.1)})
        with pytest.raises(ValueError, match="static"):
            ArucoMarkerSet(
                "DICT_4X4_50",
                {0: ArucoMarker(0, 0.1, static=True), 1: ArucoMarker(1, 0.1)},
                links=(DistanceLink(0, 1, 0.5, 0, 0),),
            )

    def test_mirror_pair_winding_reversal(self):
        p = MirrorPair(0, 1, anchor_corner_a=0, anchor_corner_b=0, thickness_m=0.0)
        assert p.corner_mapping == ((0, 0), (1, 3), (2, 2), (3, 1))

    def test_targets_toml_round_trip(self, tmp_path):
        ch = Charuco(rows=5, columns=7, square_size_m=0.054, thickness_m=0.004)
        ch.to_toml(tmp_path / "charuco.toml")
        assert Charuco.from_toml(tmp_path / "charuco.toml") == ch

        cb = Chessboard(rows=6, columns=8, square_size_m=0.03)
        cb.to_toml(tmp_path / "cb.toml")
        assert Chessboard.from_toml(tmp_path / "cb.toml") == cb

        ms = ArucoMarkerSet(
            "DICT_4X4_50",
            {0: ArucoMarker(0, 0.1), 1: ArucoMarker(1, 0.1), 2: ArucoMarker(2, 0.08, static=True)},
            links=(DistanceLink(0, 1, 0.5),),
            mirror_pairs=(),
        )
        ms.to_toml(tmp_path / "ms.toml")
        ms2 = ArucoMarkerSet.from_toml(tmp_path / "ms.toml")
        assert ms2.markers == ms.markers and ms2.links == ms.links


class TestCompilation:
    def test_marker_set_compilation_counts(self):
        ms = ArucoMarkerSet(
            "DICT_4X4_50",
            {0: ArucoMarker(0, 0.1), 1: ArucoMarker(1, 0.1)},
            links=(DistanceLink(0, 1, 0.5),),  # center link
        )
        cs = ConstraintSet.from_marker_set(ms)
        assert len(cs.distances) == 12  # 6 per marker
        assert len(cs.centroid_distances) == 1
        # intra-marker distances: 4 edges at size, 2 diagonals at size*sqrt2
        d = sorted(c.distance for c in cs.distances[:6])
        np.testing.assert_allclose(d[:4], 0.1)
        np.testing.assert_allclose(d[4:], 0.1 * np.sqrt(2))

    def test_zero_thickness_mirror_compiles_to_remaps(self):
        ms = ArucoMarkerSet(
            "DICT_4X4_50",
            {0: ArucoMarker(0, 0.1), 1: ArucoMarker(1, 0.1)},
            mirror_pairs=(MirrorPair(0, 1, 0, 0, thickness_m=0.0),),
        )
        cs = ConstraintSet.from_marker_set(ms)
        assert len(cs.point_remaps) == 4
        assert len(cs.distances) == 6  # marker 1 is remapped away: only marker 0's truss
        # remap application
        ip = ImagePoints(
            np.array([0, 0]), np.array([0, 0]), np.array([1, 0]), np.array([3, 0]),
            np.array([[10.0, 10.0], [20.0, 20.0]]),
        )
        out = cs.remap_image_points(ip)
        assert out.object_id[0] == 0 and out.keypoint_id[0] == 1  # (1,3) -> (0,1)
        assert np.isfinite(out.obj_loc[0]).all()

    def test_thick_mirror_compiles_to_distance_rows(self):
        ms = ArucoMarkerSet(
            "DICT_4X4_50",
            {0: ArucoMarker(0, 0.1), 1: ArucoMarker(1, 0.1)},
            mirror_pairs=(MirrorPair(0, 1, 0, 0, thickness_m=0.005),),
        )
        cs = ConstraintSet.from_marker_set(ms)
        assert len(cs.point_remaps) == 0
        cross = [c for c in cs.distances if c.object_id_a != c.object_id_b]
        assert len(cross) == 4 and all(c.distance == 0.005 for c in cross)

    def test_charuco_truss_counts(self):
        ch = Charuco(rows=5, columns=7, square_size_m=0.054)
        cs = ConstraintSet.from_charuco(ch)
        # 4x6 corner grid: horiz 4*5=20, vert 6*3=18, diagonals 2*15=30, braces 6
        assert len(cs.distances) == 20 + 18 + 30 + 6
        assert cs.back_face_thickness_m == 0.0
        assert not cs.static_object_ids

    def test_charuco_two_sided_adds_cross_face(self):
        ch = Charuco(rows=4, columns=4, square_size_m=0.05, thickness_m=0.006)
        cs = ConstraintSet.from_charuco(ch)
        cross = [c for c in cs.distances if c.object_id_a == 0 and c.object_id_b == 1]
        n = ch.n_corners  # 9
        # per corner: 1 tie; right/down braces where neighbors exist: 2*(3*2)=12
        assert len(cross) == n + 12
        ties = [c for c in cross if c.distance == 0.006]
        assert len(ties) == n

    def test_chessboard_requires_square_size(self):
        with pytest.raises(ValueError, match="square_size"):
            ConstraintSet.from_chessboard(Chessboard(rows=4, columns=5))

    def test_toml_round_trip(self, tmp_path):
        ch = Charuco(rows=4, columns=4, square_size_m=0.05, thickness_m=0.006)
        cs = ConstraintSet.from_charuco(ch)
        cs.to_toml(tmp_path / "c.toml")
        cs2 = ConstraintSet.from_toml(tmp_path / "c.toml")
        assert cs2 == cs


class TestFiringSemantics:
    def _world(self):
        # object 0 mobile at syncs 0,1; object 5 static
        return WorldPoints(
            sync_index=np.array([0, 0, 1, 1, STATIC_SYNC_INDEX, STATIC_SYNC_INDEX]),
            object_id=np.array([0, 0, 0, 0, 5, 5]),
            keypoint_id=np.array([0, 1, 0, 1, 0, 1]),
            xyz=np.array([[0, 0, 0], [1, 0, 0], [0, 0, 0], [1.1, 0, 0], [0, 0, 0], [0, 2, 0]], float),
        )

    def test_mobile_fires_per_sync_static_fires_once(self):
        from caliscope_tpu.constraints import DistanceConstraint

        cs = ConstraintSet(
            distances=(
                DistanceConstraint(0, 0, 0, 1, 1.0, 0.002),
                DistanceConstraint(5, 0, 5, 1, 2.0, 0.002),
            ),
            static_object_ids=frozenset({5}),
        )
        arrays = cs.compile_arrays(self._world())
        pa_idx, _pa_w, _pb_idx, _pb_w, dists, _sig = arrays
        assert len(dists) == 3  # mobile at syncs 0 and 1, static once

    def test_mixed_static_mobile_skipped(self):
        from caliscope_tpu.constraints import DistanceConstraint

        cs = ConstraintSet(
            distances=(DistanceConstraint(0, 0, 5, 0, 1.0, 0.002),),
            static_object_ids=frozenset({5}),
        )
        assert cs.compile_arrays(self._world()) is None

    def test_rigidity_report(self):
        from caliscope_tpu.constraints import DistanceConstraint

        cs = ConstraintSet(
            distances=(DistanceConstraint(0, 0, 0, 1, 1.0, 0.002),),
            static_object_ids=frozenset(),
        )
        rep = rigidity_report(cs, self._world())
        assert rep.n_violations == 2
        np.testing.assert_allclose(rep.actual, [1.0, 1.1])
        assert rep.rmse_mm == pytest.approx(np.sqrt(0.01 / 2) * 1000, rel=1e-6)
        assert rep.max_violation_mm == pytest.approx(100.0, rel=1e-6)
        assert 0 in rep.per_object_rmse_mm
