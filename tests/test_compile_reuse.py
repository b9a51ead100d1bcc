"""Shape-bucketing regression: changing dataset size must not recompile.

Every host->device entry point pads data-dependent leading axes to
power-of-two buckets (caliscope_tpu/ops/bucket.py, docs/scaling.md). These
tests lock the contract in: after solving one dataset, a SECOND dataset of a
different (same-bucket) size must reuse the compiled programs — counted via
jax's backend_compile event stream, not wall time, so the assertion is
deterministic under load.
"""

from __future__ import annotations

import contextlib

import numpy as np
import pytest

from caliscope_tpu.ops.bucket import bucket_size, pad_rows
from caliscope_tpu.synthetic.factories import default_ring_scene
from caliscope_tpu.volume import CaptureVolume


@contextlib.contextmanager
def count_compiles(counter: dict):
    from jax._src import monitoring

    def listener(name: str, **kw):
        if "backend_compile" in name:
            counter["n"] = counter.get("n", 0) + 1

    monitoring.register_event_listener(listener)
    try:
        yield counter
    finally:
        monitoring.unregister_event_listener(listener)


class TestBucketHelpers:
    def test_bucket_size_powers_of_two(self):
        assert bucket_size(1) == 64
        assert bucket_size(64) == 64
        assert bucket_size(65) == 128
        assert bucket_size(1000) == 1024
        assert bucket_size(3, floor=8) == 8

    def test_pad_rows_preserves_prefix(self):
        a = np.arange(10.0).reshape(5, 2)
        out = pad_rows(a, 8, fill=-1.0)
        np.testing.assert_array_equal(out[:5], a)
        assert (out[5:] == -1.0).all()
        assert pad_rows(a, 5) is a or (pad_rows(a, 5) == a).all()


class TestOptimizeCompileReuse:
    @pytest.mark.slow  # 73 s: caching behavior, not correctness; slow tier keeps it covered
    def test_second_dataset_reuses_lm_program(self):
        """Two ring scenes with different frame counts (different observation
        and point counts, same power-of-two buckets) must share the compiled
        LM solve: the second optimize may compile at most a couple of tiny
        helper programs, never the multi-second while-loop again."""
        s1 = default_ring_scene(n_frames=20, seed=3)
        s2 = default_ring_scene(n_frames=18, seed=7)
        v1 = CaptureVolume.bootstrap(s1.image_points_noisy(), s1.cameras)
        v2 = CaptureVolume.bootstrap(s2.image_points_noisy(), s2.cameras)
        assert len(v1.image_points) != len(v2.image_points)

        v1.optimize()  # warm every program at these buckets
        counter = {}
        with count_compiles(counter):
            out = v2.optimize()
        assert counter.get("n", 0) <= 2, (
            f"optimize on a second same-bucket dataset recompiled "
            f"{counter.get('n', 0)} programs"
        )
        assert out.reprojection_report.overall_rmse < 1.0

    def test_filter_resolve_reuses_lm_program(self):
        """The production filter -> re-solve sequence shrinks the observation
        count; the bucketed problem must keep the compiled solve."""
        s = default_ring_scene(n_frames=20, seed=3)
        v = CaptureVolume.bootstrap(s.image_points_noisy(), s.cameras).optimize()
        filtered = v.filter_by_percentile_error(2.5)
        assert len(filtered.image_points) < len(v.image_points)
        counter = {}
        with count_compiles(counter):
            filtered.optimize()
        assert counter.get("n", 0) <= 2


class TestPoseNetworkCompileReuse:
    def test_second_scene_reuses_pnp_programs(self):
        from caliscope_tpu.solvers.pose_network import build_pnp_pose_network

        s1 = default_ring_scene(n_frames=20, seed=3)
        s2 = default_ring_scene(n_frames=17, seed=5)
        build_pnp_pose_network(s1.image_points_noisy(), s1.cameras)
        counter = {}
        with count_compiles(counter):
            net = build_pnp_pose_network(s2.image_points_noisy(), s2.cameras)
        # the bootstrap touches several call sites (undistort, PnP batch,
        # stereo scoring); all must hit bucketed programs the first scene
        # already compiled
        assert counter.get("n", 0) <= 2, f"pose network recompiled {counter.get('n', 0)}"
        assert net.pairs


class TestIntrinsicsCompileReuse:
    @pytest.mark.slow  # 70 s: caching behavior, not correctness; slow tier keeps it covered
    def test_different_frame_count_reuses_refiner(self):
        from caliscope_tpu.solvers.intrinsics import solve_intrinsics

        rng = np.random.default_rng(0)
        K = np.array([[870.0, 0, 640], [0, 870.0, 360], [0, 0, 1]])

        def dataset(n_frames):
            from caliscope_tpu.synthetic.factories import default_ring_scene

            scene = default_ring_scene(n_cameras=1, n_frames=n_frames, seed=1)
            ip = scene.image_points_noisy()
            F = []
            for s in np.unique(ip.sync_index):
                sel = (ip.sync_index == s) & (ip.cam_id == 0)
                if sel.sum() >= 6:
                    F.append((ip.obj_loc[sel], ip.img_xy[sel]))
            Kmax = max(len(o) for o, _ in F)
            obj = np.zeros((len(F), Kmax, 3))
            img = np.zeros((len(F), Kmax, 2))
            msk = np.zeros((len(F), Kmax), bool)
            for i, (o, u) in enumerate(F):
                obj[i, : len(o)] = o
                img[i, : len(o)] = u
                msk[i, : len(o)] = True
            return obj, img, msk

        obj, img, msk = dataset(20)
        solve_intrinsics(obj, img, msk, (1280, 720))
        obj2, img2, msk2 = dataset(14)
        assert obj2.shape[0] != obj.shape[0]
        counter = {}
        with count_compiles(counter):
            res = solve_intrinsics(obj2, img2, msk2, (1280, 720))
        assert counter.get("n", 0) <= 2, f"intrinsics recompiled {counter.get('n', 0)}"
        assert np.isfinite(res.rmse)
