"""Coverage analysis, scale-accuracy QA, and the background-task runner.

Reference analogs: core/coverage_analysis.py tests, core/scale_accuracy.py
semantics, task_manager/ (CancellationToken/TaskHandle/TaskManager).
"""

from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from caliscope_tpu.coverage import (
    LinkQuality,
    WarningSeverity,
    analyze_multi_camera_coverage,
    classify_link_quality,
    detect_structural_warnings,
)
from caliscope_tpu.observations import ImagePoints
from caliscope_tpu.tasks import CancellationToken, TaskManager


def _shared_obs(spec: dict[int, list[tuple[int, int]]]) -> ImagePoints:
    """spec: cam_id -> list of (sync_index, keypoint_id) observations."""
    rows = [(cid, si, kp) for cid, obs in spec.items() for si, kp in obs]
    cam = np.array([r[0] for r in rows])
    si = np.array([r[1] for r in rows])
    kp = np.array([r[2] for r in rows])
    return ImagePoints(
        sync_index=si,
        cam_id=cam,
        object_id=np.zeros(len(rows)),
        keypoint_id=kp,
        img_xy=np.random.default_rng(0).uniform(0, 100, (len(rows), 2)),
    )


class TestCoverageAnalysis:
    def test_pairwise_counts_shared_identity_only(self):
        # cams 0/1 share 3 observations; cam 2 shares 1 with cam 1, none with 0
        ip = _shared_obs({
            0: [(0, 0), (0, 1), (1, 0)],
            1: [(0, 0), (0, 1), (1, 0), (2, 5)],
            2: [(2, 5), (3, 9)],
        })
        rep = analyze_multi_camera_coverage(ip)
        m = rep.pairwise_observations
        assert m[0, 1] == m[1, 0] == 3
        assert m[1, 2] == m[2, 1] == 1
        assert m[0, 2] == 0
        assert rep.n_connected_components == 1
        assert rep.isolated_cameras == []

    def test_isolated_camera_and_components(self):
        ip = _shared_obs({
            0: [(0, 0), (0, 1)],
            1: [(0, 0), (0, 1)],
            2: [(5, 7)],  # shares nothing
        })
        rep = analyze_multi_camera_coverage(ip)
        assert rep.isolated_cameras == [2]
        assert rep.n_connected_components == 2
        assert rep.has_critical_issues
        warnings = detect_structural_warnings(rep, n_cameras=3)
        crit = [w for w in warnings if w.severity is WarningSeverity.CRITICAL]
        assert len(crit) == 2  # isolated camera + disconnected groups
        assert warnings[0].severity is WarningSeverity.CRITICAL  # sorted first

    def test_leaf_camera_warning_levels(self):
        # cam 2 hangs off cam 1 only: few obs -> WARNING, many obs -> INFO
        few = _shared_obs({
            0: [(i, 0) for i in range(150)],
            1: [(i, 0) for i in range(150)] + [(200 + i, 1) for i in range(20)],
            2: [(200 + i, 1) for i in range(20)],
        })
        rep = analyze_multi_camera_coverage(few)
        kinds = {w.severity for w in detect_structural_warnings(rep, n_cameras=3)}
        assert WarningSeverity.WARNING in kinds
        many = _shared_obs({
            0: [(i, 0) for i in range(150)],
            1: [(i, 0) for i in range(150)] + [(300 + i, 1) for i in range(120)],
            2: [(300 + i, 1) for i in range(120)],
        })
        rep2 = analyze_multi_camera_coverage(many)
        w2 = detect_structural_warnings(rep2, n_cameras=3)
        assert any(w.severity is WarningSeverity.INFO for w in w2)
        assert not any(w.severity is WarningSeverity.WARNING for w in w2)

    def test_two_camera_rig_skips_leaf_warnings(self):
        ip = _shared_obs({0: [(0, 0)], 1: [(0, 0)]})
        rep = analyze_multi_camera_coverage(ip)
        assert detect_structural_warnings(rep, n_cameras=2) == []

    def test_link_quality_thresholds(self):
        assert classify_link_quality(250) is LinkQuality.GOOD
        assert classify_link_quality(60) is LinkQuality.MARGINAL
        assert classify_link_quality(10) is LinkQuality.INSUFFICIENT

    def test_empty_input(self):
        rep = analyze_multi_camera_coverage(ImagePoints.empty())
        assert rep.cam_ids == ()
        assert not rep.has_critical_issues


class TestScaleAccuracy:
    def test_frame_scale_error_exact_geometry(self):
        from caliscope_tpu.scale import compute_frame_scale_error

        obj = np.array([[0, 0, 0], [0.1, 0, 0], [0.1, 0.1, 0], [0, 0.1, 0]])
        fe = compute_frame_scale_error(obj.copy(), obj, sync_index=3, object_id=0, n_cameras_contributing=2)
        assert fe.distance_rmse_mm == 0.0
        assert fe.n_distance_pairs == 6
        assert fe.sync_index == 3

    def test_frame_scale_error_uniform_scale_bias(self):
        from caliscope_tpu.scale import compute_frame_scale_error

        obj = np.array([[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0]], float)
        fe = compute_frame_scale_error(obj * 1.02, obj, 0, 0, 2)
        # 2% oversize -> positive signed bias, rmse ~2% of ~0.1m pairs
        assert fe.distance_mean_signed_error_mm > 0
        assert 1.5 < fe.distance_rmse_mm < 3.5

    def test_frame_scale_error_validations(self):
        from caliscope_tpu.scale import compute_frame_scale_error

        with pytest.raises(ValueError):
            compute_frame_scale_error(np.zeros((3, 3)), np.zeros((2, 3)), 0, 0, 2)
        with pytest.raises(ValueError):
            compute_frame_scale_error(np.zeros((1, 3)), np.zeros((1, 3)), 0, 0, 2)

    def test_volumetric_report_pooling(self):
        from caliscope_tpu.scale import VolumetricScaleReport, compute_frame_scale_error

        obj = np.array([[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0]], float)
        fes = (
            compute_frame_scale_error(obj * 1.01, obj, 0, 0, 2),
            compute_frame_scale_error(obj * 0.99, obj, 1, 0, 2),
        )
        rep = VolumetricScaleReport(frame_errors=fes)
        assert rep.n_frames_sampled == 2
        assert rep.pooled_rmse_mm > 0
        # symmetric over/under-scale cancels in the signed bias
        assert abs(rep.mean_signed_error_mm) < 0.02
        assert rep.worst_frame in fes
        empty = VolumetricScaleReport.empty()
        assert empty.pooled_rmse_mm == 0.0 and empty.worst_frame is None

    def test_world_basis_maps_up_to_z_and_forward_to_y(self):
        from caliscope_tpu.scale import world_basis_from_up_and_forward

        up = np.array([0.1, 0.2, 0.97])
        fwd = np.array([1.0, 0.3, 0.4])
        R = world_basis_from_up_and_forward(up, fwd)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) == pytest.approx(1.0)
        z = R @ (up / np.linalg.norm(up))
        assert np.allclose(z, [0, 0, 1], atol=1e-12)
        f_new = R @ fwd
        assert f_new[1] > 0 and abs(f_new[0]) < 1e-9  # horizontal forward -> +Y

    def test_world_basis_degenerate_forward(self):
        from caliscope_tpu.scale import world_basis_from_up_and_forward

        with pytest.raises(ValueError):
            world_basis_from_up_and_forward(np.array([0, 0, 1.0]), np.array([0, 0, 2.0]))


class TestTaskManager:
    def test_result_and_progress_injection(self):
        tm = TaskManager(max_workers=1)
        seen = []

        def work(x, progress=None, cancellation_token=None):
            progress(10, "starting")
            progress(90, "nearly")
            return x * 2

        h = tm.submit(work, 21, name="double", on_progress=lambda p, m: seen.append((p, m)))
        assert h.result(timeout=10) == 42
        assert h.done
        assert (10, "starting") in h.progress_log and (90, "nearly") in seen
        tm.shutdown()

    def test_exception_propagates(self):
        tm = TaskManager(max_workers=1)

        def boom():
            raise RuntimeError("kaput")

        h = tm.submit(boom, name="boom")
        with pytest.raises(RuntimeError, match="kaput"):
            h.result(timeout=10)
        tm.shutdown()

    def test_cooperative_cancellation(self):
        tm = TaskManager(max_workers=1)
        started = threading.Event()

        def work(cancellation_token=None):
            started.set()
            for _ in range(500):
                if cancellation_token.is_cancelled:
                    cancellation_token.raise_if_cancelled("stopped by test")
                time.sleep(0.01)
            return "finished"

        h = tm.submit(work, name="cancellable")
        assert started.wait(timeout=10)
        h.cancel()
        assert h.cancelled
        with pytest.raises(InterruptedError, match="stopped by test"):
            h.result(timeout=10)
        tm.shutdown()

    def test_token_is_reusable_across_checks(self):
        token = CancellationToken()
        assert not token.is_cancelled
        token.raise_if_cancelled()  # no-op while not cancelled
        token.cancel()
        assert token.is_cancelled
        with pytest.raises(InterruptedError):
            token.raise_if_cancelled()

    def test_plain_function_without_injected_kwargs(self):
        tm = TaskManager(max_workers=1)
        h = tm.submit(lambda a, b: a + b, 1, 2, name="plain")
        assert h.result(timeout=10) == 3
        tm.shutdown()
