"""Headline production-pipeline contract on synthetic ground truth.

Mirrors reference tests/synthetic/test_production_pipeline.py: tolerances are
DERIVED, not tuned — 0.5 deg / 5 mm pose bounds from covariance propagation at
0.5 px noise; rigidity RMSE < 2.0 mm after constrained BA; constrained <=
unconstrained. A failure is a finding.
"""

import numpy as np
import pytest

from caliscope_tpu.constraints import ConstraintSet
from caliscope_tpu.synthetic.factories import default_ring_scene, ring_with_static_markers
from tests.synthetic.production import run_production_pipeline

ROTATION_TOL_DEG = 0.5
TRANSLATION_TOL_M = 0.005
RIGIDITY_TOL_MM = 2.0


def board_constraints(scene, spacing=0.054, sigma_m=0.002) -> ConstraintSet:
    board = scene.objects[0]
    return ConstraintSet(
        ConstraintSet._truss_constraints(board.points_local, spacing, sigma_m),
        frozenset(),
    )


class TestHeadlinePoseRecovery:
    def test_ring_scene_pose_recovery(self):
        """4-cam ring, 0.5 px noise -> <= 0.5 deg / 5 mm vs ground truth
        (BASELINE.md headline metric)."""
        scene = default_ring_scene(noise_sigma_px=0.5)
        run = run_production_pipeline(scene, refine_intrinsics=False)
        assert run.max_rotation_deg <= ROTATION_TOL_DEG, run.pose_errors
        assert run.max_translation_m <= TRANSLATION_TOL_M, run.pose_errors

    def test_constrained_rigidity_below_2mm(self):
        scene = default_ring_scene(noise_sigma_px=0.5)
        cs = board_constraints(scene)
        run = run_production_pipeline(scene, constraints=cs, refine_intrinsics=False)
        rigidity = run.result.capture_volume.rigidity_report()
        assert rigidity.n_violations > 0
        assert rigidity.rmse_mm < RIGIDITY_TOL_MM

    @pytest.mark.slow  # 50 s: comparative re-run of two full pipelines; rigidity contract stays fast
    def test_constrained_not_worse_than_unconstrained(self):
        scene = default_ring_scene(noise_sigma_px=0.5)
        cs = board_constraints(scene)
        run_c = run_production_pipeline(scene, constraints=cs, refine_intrinsics=False)
        run_u = run_production_pipeline(scene, refine_intrinsics=False)
        # measure both volumes' rigidity against the same constraint set
        from caliscope_tpu.constraints import rigidity_report

        r_c = rigidity_report(cs, run_c.result.capture_volume.world_points).rmse_mm
        r_u = rigidity_report(cs, run_u.result.capture_volume.world_points).rmse_mm
        assert r_c <= r_u + 1e-9

    @pytest.mark.slow  # 95 s: full synthesis path; headline recovery stays fast
    def test_blind_intrinsics_synthesis_path(self):
        """No intrinsics at all: pipeline synthesizes f=w/2 blind defaults,
        the depth-rich scene passes the refinement gate, and the rig is
        recovered (looser bounds: recovered intrinsics absorb some error)."""
        from caliscope_tpu.synthetic.factories import depth_varied_scene

        scene = depth_varied_scene(noise_sigma_px=0.5)
        cs = board_constraints(scene)
        run = run_production_pipeline(scene, constraints=cs, blind=True)
        assert run.result.synthesized_cam_ids == frozenset(scene.cameras.cameras.keys())
        assert not run.result.intrinsic_refinement_gated
        assert run.max_rotation_deg <= 2.0
        assert run.max_translation_m <= 0.05

    def test_outlier_contamination_filtered(self):
        """5% gross outliers: robust loss + percentile filter keep the pose
        bounds (reference test_outlier_robustness.py)."""
        from caliscope_tpu.synthetic.faults import inject_outliers

        scene = default_ring_scene(noise_sigma_px=0.5)
        corrupted, _ = inject_outliers(
            scene.image_points_noisy(), fraction=0.05, magnitude_px=50.0, rng=np.random.default_rng(7)
        )
        run = run_production_pipeline(scene, image_points=corrupted, refine_intrinsics=False, filter_percentile=7.5)
        assert run.max_rotation_deg <= ROTATION_TOL_DEG * 2
        assert run.max_translation_m <= TRANSLATION_TOL_M * 2


@pytest.mark.slow  # 100 s: cross-face solve; rigidity contracts covered by the fast tier
class TestTwoSidedBoard:
    def test_two_sided_cross_face_pose_recovery(self):
        """Two-sided board with backface culling: front-viewing and
        back-viewing cameras are linked ONLY through the board's substrate
        (cross-face ties at the caliper thickness), and the recovered rig
        must still meet the headline pose bounds. Locks in the identity
        convention: back corner k directly behind front corner k at
        z=+thickness with the same keypoint id (reference
        charuco_tracker.py:72-85, 123-140) — a mirrored-x back face would
        fight the cross-face ties and blow these bounds.
        """
        from caliscope_tpu.synthetic.factories import two_sided_ring_scene

        scene, ch = two_sided_ring_scene(noise_sigma_px=0.5)
        ip = scene.image_points_noisy()
        # both faces must actually be observed for this test to mean anything
        assert set(np.unique(ip.object_id)) == {0, 1}
        cs = ConstraintSet.from_charuco(ch)
        assert any(c.object_id_a != c.object_id_b for c in cs.distances)
        run = run_production_pipeline(scene, image_points=ip, constraints=cs, refine_intrinsics=False)
        assert len(run.result.capture_volume.camera_array.posed_cameras) == len(scene.cameras.cameras)
        assert run.max_rotation_deg <= ROTATION_TOL_DEG, run.pose_errors
        assert run.max_translation_m <= TRANSLATION_TOL_M, run.pose_errors
        rigidity = run.result.capture_volume.rigidity_report()
        assert rigidity.rmse_mm < RIGIDITY_TOL_MM


@pytest.mark.slow  # 41 s + 36 s: static-marker guards
class TestStaticMarkerGuard:
    def test_static_markers_participate(self):
        scene = ring_with_static_markers(n_static_markers=2, noise_sigma_px=0.5)
        # constraints: board truss (mobile) + static marker squares
        from caliscope_tpu.constraints import DistanceConstraint

        cons = list(board_constraints(scene).distances)
        for obj in scene.objects[1:]:
            pts = obj.points_local
            for i in range(len(pts)):
                for j in range(i + 1, len(pts)):
                    cons.append(
                        DistanceConstraint(
                            obj.object_id, i, obj.object_id, j,
                            float(np.linalg.norm(pts[i] - pts[j])), 0.002,
                        )
                    )
        cs = ConstraintSet(tuple(cons), frozenset(o.object_id for o in scene.objects[1:]))
        run = run_production_pipeline(scene, constraints=cs, refine_intrinsics=False)
        assert run.result.dropped_static_markers == ()
        assert run.max_rotation_deg <= ROTATION_TOL_DEG
        assert run.max_translation_m <= TRANSLATION_TOL_M


class TestIntrinsicGate:
    def test_depth_ratio_gates_ring_scene(self):
        """The flat ring scene has poor depth variation -> refinement must be
        gated off when requested (reference E4 negative control)."""
        scene = default_ring_scene(noise_sigma_px=0.5)
        run = run_production_pipeline(scene, refine_intrinsics=True)
        # ring depth ratio ~1.3 < 2.0 -> gated
        assert run.result.intrinsic_refinement_gated
