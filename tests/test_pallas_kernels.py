"""Pallas kernel equivalence tests.

Interpreter-mode tests run everywhere (CPU suite); the @pytest.mark.tpu
tests run the COMPILED kernels on a real chip (skipped elsewhere), so a
Mosaic compilation or numerics regression is caught by the suite rather
than only by bench-time asserts. Run them with
CALISCOPE_TPU_TEST_PLATFORM=tpu pytest -m tpu.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from caliscope_tpu.detect.corners import chess_corner_response
from caliscope_tpu.detect.kernels import (
    adaptive_threshold,
    component_candidates_sorted,
    connected_components,
)
from caliscope_tpu.detect.pallas_ccl import connected_components_pallas
from caliscope_tpu.detect.pallas_kernels import chess_corner_response_pallas

on_tpu = jax.default_backend() == "tpu"
tpu_only = pytest.mark.skipif(not on_tpu, reason="requires a real TPU chip")


class TestCornerResponseKernel:
    def test_matches_reference_implementation(self, rng):
        imgs = rng.uniform(0, 255, size=(2, 96, 128)).astype(np.float32)
        ref = np.asarray(chess_corner_response(imgs))
        ker = np.asarray(chess_corner_response_pallas(imgs, interpret=True))
        pad = 6
        np.testing.assert_allclose(
            ker[:, pad:-pad, pad:-pad], ref[:, pad:-pad, pad:-pad], rtol=1e-4, atol=1e-3
        )

    def test_detects_rendered_corner(self):
        cv2 = pytest.importorskip("cv2")
        img = np.zeros((64, 64), np.float32)
        img[:32, :32] = 255
        img[32:, 32:] = 255
        img = cv2.GaussianBlur(img, (5, 5), 1.0)
        resp = np.asarray(chess_corner_response_pallas(img[None], interpret=True))[0]
        peak = np.unravel_index(np.argmax(resp), resp.shape)
        assert abs(peak[0] - 32) <= 1 and abs(peak[1] - 32) <= 1

    @tpu_only
    @pytest.mark.tpu
    def test_compiled_matches_reference_on_tpu(self, rng):
        # small-but-multi-tile input: proving Mosaic lowering correctness
        # does not need 720p, and the full tpu tier must fit a CI timeout
        # (at 720p one compiled test ran 8+ minutes through the dev tunnel)
        imgs = rng.uniform(0, 255, size=(2, 192, 256)).astype(np.float32)
        ref = np.asarray(chess_corner_response(imgs))
        ker = np.asarray(chess_corner_response_pallas(imgs))
        pad = 6
        np.testing.assert_allclose(
            ker[:, pad:-pad, pad:-pad], ref[:, pad:-pad, pad:-pad], rtol=1e-3, atol=1e-2
        )


class TestCornerWindowExtraction:
    """extract_corner_windows_pallas must reproduce plain window slicing
    exactly — it replaces XLA's per-corner dynamic_slice gathers in the
    subpixel stage (detect/corners.py::refine_corners_subpix)."""

    def _case(self, rng, B=2, Hp=96, Wp=160, K=16, win=28):
        img = rng.uniform(0, 255, size=(B, Hp, Wp)).astype(np.float32)
        yi = rng.integers(0, Hp - win, size=(B, K)).astype(np.int32)
        xi = rng.integers(0, Wp - win, size=(B, K)).astype(np.int32)
        want = np.stack(
            [np.stack([img[b, yi[b, k] : yi[b, k] + win, xi[b, k] : xi[b, k] + win] for k in range(K)]) for b in range(B)]
        )
        return img, yi, xi, want

    def test_interpreter_exact(self, rng):
        from caliscope_tpu.detect.pallas_kernels import extract_corner_windows_pallas

        img, yi, xi, want = self._case(rng)
        got = np.asarray(extract_corner_windows_pallas(jnp.asarray(img), jnp.asarray(yi), jnp.asarray(xi), 28, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_interpreter_exact_int32_win64(self, rng):
        """The marker-atlas patch path uses the same kernel on packed int32
        at win=64 (a different slab height than the subpix f32/28 case)."""
        from caliscope_tpu.detect.pallas_kernels import extract_windows_pallas

        B, Hp, Wp, K, win = 2, 200, 300, 8, 64
        img = rng.integers(0, 2**30, size=(B, Hp, Wp)).astype(np.int32)
        yi = rng.integers(0, Hp - win, size=(B, K)).astype(np.int32)
        xi = rng.integers(0, Wp - win, size=(B, K)).astype(np.int32)
        want = np.stack(
            [np.stack([img[b, yi[b, k] : yi[b, k] + win, xi[b, k] : xi[b, k] + win] for k in range(K)]) for b in range(B)]
        )
        got = np.asarray(extract_windows_pallas(jnp.asarray(img), jnp.asarray(yi), jnp.asarray(xi), win, interpret=True))
        np.testing.assert_array_equal(got, want)
        assert got.dtype == np.int32

    @tpu_only
    @pytest.mark.tpu
    def test_compiled_exact_on_tpu(self, rng):
        from caliscope_tpu.detect.pallas_kernels import extract_corner_windows_pallas, extract_windows_pallas

        img, yi, xi, want = self._case(rng, B=2, Hp=264, Wp=392, K=64)
        got = np.asarray(extract_corner_windows_pallas(jnp.asarray(img), jnp.asarray(yi), jnp.asarray(xi), 28))
        np.testing.assert_array_equal(got, want)
        # int32 atlas-shaped case (win=64, K=64)
        B, Hp, Wp, K, win = 2, 264, 392, 16, 64
        atlas = np.random.default_rng(1).integers(0, 2**30, size=(B, Hp, Wp)).astype(np.int32)
        yi2 = np.random.default_rng(2).integers(0, Hp - win, size=(B, K)).astype(np.int32)
        xi2 = np.random.default_rng(3).integers(0, Wp - win, size=(B, K)).astype(np.int32)
        want2 = np.stack(
            [np.stack([atlas[b, yi2[b, k] : yi2[b, k] + win, xi2[b, k] : xi2[b, k] + win] for k in range(K)]) for b in range(B)]
        )
        got2 = np.asarray(extract_windows_pallas(jnp.asarray(atlas), jnp.asarray(yi2), jnp.asarray(xi2), win))
        np.testing.assert_array_equal(got2, want2)


def _random_masks(rng):
    cases = []
    for shape, p in [((2, 64, 128), 0.4), ((1, 70, 130), 0.55), ((2, 48, 256), 0.3)]:
        cases.append(rng.uniform(size=shape) < p)
    return cases


class TestPallasCCL:
    def test_matches_xla_reference(self, rng):
        for m in _random_masks(rng):
            ref = np.asarray(connected_components(m, n_iters=12))
            ker = np.asarray(connected_components_pallas(m, n_iters=12, interpret=True))
            np.testing.assert_array_equal(ker, ref)

    def test_background_and_label_convention(self, rng):
        m = rng.uniform(size=(1, 40, 136)) < 0.35  # W not lane-aligned
        lab = np.asarray(connected_components_pallas(m, n_iters=12, interpret=True))[0]
        assert lab.shape == (40, 136)
        assert np.all(lab[~m[0]] == 40 * 136)
        fg = lab[m[0]]
        assert fg.max() < 40 * 136  # labels are linear indices of the ORIGINAL frame

    @tpu_only
    @pytest.mark.tpu
    def test_compiled_matches_reference_on_tpu(self, rng):
        m = rng.uniform(size=(2, 192, 256)) < 0.35
        ref = np.asarray(connected_components(m, n_iters=4))
        ker = np.asarray(connected_components_pallas(m, n_iters=4))
        np.testing.assert_array_equal(ker, ref)


class TestSortedCandidates:
    def test_matches_numpy_ground_truth(self, rng):
        """Per-candidate area/bbox vs a direct numpy computation over the
        pooled label grid — the exactness contract an earlier rank-keyed
        scatter formulation violated (dense-id collisions under
        unconverged labels merged two components' stats on real frames)."""
        B, H, W = 2, 144, 256
        img = np.full((B, H, W), 255.0, np.float32)
        for b in range(B):
            for _ in range(12):
                x0 = int(rng.integers(0, W - 40))
                y0 = int(rng.integers(0, H - 40))
                w, h = (int(v) for v in rng.integers(6, 38, size=2))
                img[b, y0 : y0 + h, x0 : x0 + w] = 0.0
        binary = adaptive_threshold(img, radius=10)
        # deliberately UNCONVERGED labels (n_iters=2): exactness must not
        # depend on full label convergence
        labels = connected_components(binary, n_iters=2)
        sel, areas, bbox, valid = component_candidates_sorted(binary, labels, 16, 25.0)
        binN = np.asarray(binary)
        labN = np.asarray(labels)
        pool = 4
        Hp, Wp = H // pool, W // pool
        for b in range(B):
            lp = labN[b, : Hp * pool, : Wp * pool].reshape(Hp, pool, Wp, pool).min(axis=(1, 3))
            fp = binN[b, : Hp * pool, : Wp * pool].reshape(Hp, pool, Wp, pool).any(axis=(1, 3))
            n_valid = 0
            for k in range(16):
                if not valid[b][k]:
                    continue
                n_valid += 1
                l = int(sel[b][k])
                cells = (lp == l) & fp
                ys, xs = np.nonzero(cells)
                assert float(areas[b][k]) == cells.sum() * pool * pool
                want = [
                    max(xs.min() * pool - 3, 0), max(ys.min() * pool - 3, 0),
                    min(xs.max() * pool + 6, W - 1), min(ys.max() * pool + 6, H - 1),
                ]
                np.testing.assert_allclose(np.asarray(bbox[b][k]), want)
            assert n_valid >= 3  # some rectangles selected (overlaps merge; fill gate drops concave unions)


class TestApproxNMSOnTPU:
    @tpu_only
    @pytest.mark.tpu
    def test_approx_topk_recovers_exact_corner_set(self):
        """nms_corners uses lax.approx_max_k on TPU; the valid corner SET on
        rendered board frames must match exact top_k (missing a real corner
        would silently degrade the charuco snap)."""
        import jax.numpy as jnp

        import bench as bench_mod
        from caliscope_tpu.detect.corners import nms_corners
        from caliscope_tpu.detect.pallas_kernels import chess_corner_response_pallas

        _ch, frames = bench_mod._detect_frames()
        imgs = jnp.asarray(frames[:2].astype(np.float32))
        resp = chess_corner_response_pallas(imgs)
        xy_a, top_a, val_a = nms_corners(resp, 256)
        # exact reference: replicate the suppression host-side, then exact
        # top-k (nms_corners itself swaps in approx_max_k on TPU)
        r = np.asarray(resp)
        B, H, W = r.shape
        for b in range(B):
            got = {
                (float(x), float(y))
                for (x, y), v in zip(np.asarray(xy_a[b]), np.asarray(val_a[b]))
                if v
            }
            from scipy.ndimage import maximum_filter

            pooled = maximum_filter(r[b], size=5, mode="nearest")
            score = np.where((r[b] >= pooled) & (r[b] > 0), r[b], 0.0)
            score[:6] = score[-6:] = 0.0
            score[:, :6] = score[:, -6:] = 0.0
            flat = score.ravel()
            order = np.argsort(flat)[::-1][:256]
            thr = max(0.2 * flat[order[0]], 1e-6)
            want = {(float(i % W), float(i // W)) for i in order if flat[i] > thr}
            missing = want - got
            assert not missing, f"frame {b}: approx NMS lost corners {sorted(missing)[:5]}"


class TestPallasSchur:
    LAM = 1e-3

    def _blocks(self, rng, C=8, P=1024):
        Jc = rng.normal(size=(C, 2, 9, P)).astype(np.float32) * 0.1
        Jp = rng.normal(size=(C, 2, 3, P)).astype(np.float32) * 0.1
        w = rng.uniform(0.5, 1.0, size=(C, 2, P)).astype(np.float32)
        bp = rng.normal(size=(3, P)).astype(np.float32)
        return Jc, Jp, w, bp

    def test_interpreter_matches_reference(self, rng, monkeypatch):
        from jax.experimental import pallas as pl

        import caliscope_tpu.solvers.pallas_schur as PS

        orig = pl.pallas_call
        monkeypatch.setattr(pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        Jc, Jp, w, bp = self._blocks(rng)
        # the UNJITTED impl: the patch applies eagerly and nothing leaks
        # into (or is hidden by) the process-wide jit cache
        S1, r1, H1 = PS._schur_s_rhs_impl(
            jnp.asarray(Jc), jnp.asarray(Jp), jnp.asarray(w), jnp.asarray(bp), self.LAM
        )
        S2, r2, H2 = PS.schur_s_rhs_reference(Jc, Jp, w, bp, self.LAM)
        np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), rtol=1e-4, atol=1e-4)

    def test_hpp_inv_matches_bundle_helper(self, rng):
        """The kernel's in-tile damped inverse must equal the XLA fallback
        (_pminor_hpp_inv) bit-for-bit in MATH (same pinning/damping/floors),
        or the kernel and XLA Schur paths would solve different systems."""
        from caliscope_tpu.solvers import bundle as B
        from caliscope_tpu.solvers.pallas_schur import reference_hpp_inv

        Jc, Jp, w, bp = self._blocks(rng, P=256)
        # zero out one point column to exercise the pinning branch
        w[:, :, 7] = 0.0
        Jp[:, :, :, 7] = 0.0

        class _P:
            n_constraints = 0

        got = reference_hpp_inv(jnp.asarray(Jp), jnp.asarray(w), self.LAM)
        want = B._pminor_hpp_inv(
            _P(), jnp.asarray(w), jnp.asarray(Jp), None, jnp.asarray(self.LAM, jnp.float32),
            jnp.float32, None,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-7)

    @tpu_only
    @pytest.mark.tpu
    def test_compiled_matches_reference_on_tpu(self, rng):
        import caliscope_tpu.solvers.pallas_schur as PS

        Jc, Jp, w, bp = self._blocks(rng, P=1024)
        S1, r1, H1 = PS.schur_s_rhs(Jc, Jp, w, bp, self.LAM)
        S2, r2, H2 = PS.schur_s_rhs_reference(Jc, Jp, w, bp, self.LAM)
        np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), rtol=1e-3, atol=1e-3)

    @tpu_only
    @pytest.mark.tpu
    def test_full_solve_matches_xla_path_on_tpu(self, rng):
        """The kernel-backed lm_solve must reach the same optimum as the
        XLA Schur path (asserted on converged cost; under the package's
        f32 matmul-precision default both paths are f32-accurate but
        accumulate in different orders, so trajectories drift at float
        roundoff)."""
        import os

        from caliscope_tpu.ops.bucket import bucket_size
        from caliscope_tpu.solvers.bundle import BAConfig, lm_solve, make_dense_problem
        from caliscope_tpu.synthetic.camera_synthesizer import strip_extrinsics
        from caliscope_tpu.synthetic.factories import default_ring_scene

        scene = default_ring_scene(noise_sigma_px=0.5, n_frames=12)
        ip = scene.image_points_noisy()
        views = scene.cameras.device_views(posed_only=True)
        id_to_idx = {int(c): i for i, c in enumerate(views.cam_ids)}
        cam_idx = np.array([id_to_idx[int(c)] for c in ip.cam_id])
        pt_idx, keys = ip.point_index()
        wp = ip.triangulate(scene.cameras)
        key_map = {tuple(k): i for i, k in enumerate(wp.keys())}
        X0 = wp.xyz[np.array([key_map[tuple(k)] for k in keys])]
        from caliscope_tpu.solvers.pallas_schur import TILE, pallas_schur_available

        Pb = -(-max(bucket_size(X0.shape[0] + 1, fine=True), TILE) // TILE) * TILE
        Xb = np.concatenate([X0, np.tile(X0.mean(axis=0), (Pb - X0.shape[0], 1))])
        # run both paths to CONVERGENCE: per-iteration f32 accumulation
        # order differs between the kernel and XLA (sequential tile sums vs
        # XLA's reduction tree), so forced-iteration trajectories drift at
        # float precision; converged optima must agree
        cfg = BAConfig(max_iter=40, solver="schur")

        def solve():
            problem = make_dense_problem(
                cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye, n_points=Pb
            )
            from caliscope_tpu.solvers.bundle import initial_cam9

            return problem, lm_solve(problem, initial_cam9(scene.cameras), Xb, cfg)

        problem0, r_kernel = solve()
        # the kernel path must actually be ELIGIBLE or this test is vacuous
        assert pallas_schur_available(problem0, None, Pb, np.float32)
        os.environ["CALISCOPE_TPU_NO_PALLAS_SCHUR"] = "1"
        try:
            _p, r_xla = solve()
        finally:
            del os.environ["CALISCOPE_TPU_NO_PALLAS_SCHUR"]
        assert r_kernel.converged and r_xla.converged
        # Both stop via ftol on their own (float-order-perturbed)
        # trajectories; the BA problem also has gauge freedom (no pinned
        # camera), so parameter vectors of equivalent optima can differ by
        # a global similarity. The equal-quality assertion is the COST.
        np.testing.assert_allclose(r_kernel.cost_final, r_xla.cost_final, rtol=5e-3)
