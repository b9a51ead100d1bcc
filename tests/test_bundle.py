"""Bundle adjustment solver tests.

Mirrors the reference's BA test strategy: analytic-vs-numeric Jacobian parity
(/root/reference/tests/synthetic/test_analytic_jacobian.py), convergence on
synthetic ground truth, robust-loss outlier behavior
(/root/reference/tests/synthetic/test_outlier_robustness.py), dense-vs-CG
solver agreement (TPU-specific: both linear solvers must reach one optimum).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caliscope_tpu.ops.reprojection import (
    constraint_jacobian_blocks,
    constraint_residuals,
    observation_jacobian_blocks,
    observation_residuals,
    reprojection_errors,
)
from caliscope_tpu.solvers.bundle import (
    BAConfig,
    initial_cam9,
    lm_solve,
    make_problem,
)
from caliscope_tpu.synthetic.factories import default_ring_scene
from caliscope_tpu.synthetic.faults import inject_outliers


def _scene_problem(noise=0.5, seed=42, n_frames=10, **make_kw):
    scene = default_ring_scene(noise_sigma_px=noise, seed=seed, n_frames=n_frames)
    ip = scene.image_points_noisy()
    cams = scene.cameras
    views = cams.device_views(posed_only=True)
    id_to_idx = {int(c): i for i, c in enumerate(views.cam_ids)}
    cam_idx = np.array([id_to_idx[int(c)] for c in ip.cam_id])
    pt_idx, keys = ip.point_index()
    wp = ip.triangulate(cams)
    key_map = {tuple(k): i for i, k in enumerate(wp.keys())}
    row = np.array([key_map[tuple(k)] for k in keys])
    X0 = wp.xyz[row]
    problem = make_problem(cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye, **make_kw)
    return scene, ip, views, cam_idx, pt_idx, X0, problem


def _pixel_rmse(res, views, cam_idx, pt_idx, uv):
    err = np.asarray(
        reprojection_errors(
            jnp.asarray(res.cam9), jnp.asarray(res.X), jnp.asarray(cam_idx), jnp.asarray(pt_idx),
            jnp.asarray(uv), jnp.asarray(views.K), jnp.asarray(views.dist), jnp.asarray(views.fisheye),
        )
    )
    return float(np.sqrt((err**2).mean()))


class TestJacobianBlocks:
    def test_observation_blocks_match_finite_differences(self, rng):
        """jacfwd camera/point blocks vs central differences (the reference
        validates its hand-assembled sparse J the same way)."""
        _scene, ip, views, cam_idx, pt_idx, X0, _p = _scene_problem(noise=0.3)
        cam9 = initial_cam9(_scene.cameras)
        args = (
            jnp.asarray(cam_idx[:50]), jnp.asarray(pt_idx[:50]), jnp.asarray(ip.img_xy[:50]),
            jnp.asarray(views.K), jnp.asarray(views.dist), jnp.asarray(views.fisheye),
            jnp.asarray(1.0 / views.K[:, 0, 0]),
        )
        r, Jc, Jp = jax.jit(observation_jacobian_blocks)(jnp.asarray(cam9), jnp.asarray(X0), *args)
        eps = 1e-6
        res_jit = jax.jit(observation_residuals)  # 24 probes below: eager would pay per-primitive dispatch each time

        def res_at(cam9_v, X_v):
            return np.asarray(res_jit(jnp.asarray(cam9_v), jnp.asarray(X_v), *args))

        # camera params of camera 0
        for j in range(9):
            d = np.zeros_like(cam9)
            d[0, j] = eps
            num = (res_at(cam9 + d, X0) - res_at(cam9 - d, X0)) / (2 * eps)
            sel = np.asarray(cam_idx[:50]) == 0
            np.testing.assert_allclose(np.asarray(Jc)[sel, :, j], num[sel], atol=1e-5)
        # one world point
        p0 = int(pt_idx[0])
        for j in range(3):
            d = np.zeros_like(X0)
            d[p0, j] = eps
            num = (res_at(cam9, X0 + d) - res_at(cam9, X0 - d)) / (2 * eps)
            sel = np.asarray(pt_idx[:50]) == p0
            np.testing.assert_allclose(np.asarray(Jp)[sel, :, j], num[sel], atol=1e-5)

    def test_constraint_blocks_match_finite_differences(self, rng):
        P = 12
        X = rng.normal(size=(P, 3))
        pa_idx = np.array([[0, 1, 2, 3], [4, 4, 4, 4]], np.int32)
        pa_w = np.array([[0.25] * 4, [1.0, 0, 0, 0]])
        pb_idx = np.array([[5, 6, 7, 8], [9, 9, 9, 9]], np.int32)
        pb_w = np.array([[0.25] * 4, [1.0, 0, 0, 0]])
        target = np.array([1.0, 0.5])
        weight = np.array([10.0, 20.0])
        r, idx, J = constraint_jacobian_blocks(
            jnp.asarray(X), jnp.asarray(pa_idx), jnp.asarray(pa_w),
            jnp.asarray(pb_idx), jnp.asarray(pb_w), jnp.asarray(target), jnp.asarray(weight),
        )
        eps = 1e-7
        for q in range(2):
            for k in range(8):
                p = int(np.asarray(idx)[q, k])
                for j in range(3):
                    d = np.zeros_like(X)
                    d[p, j] = eps
                    rp = constraint_residuals(jnp.asarray(X + d), jnp.asarray(pa_idx), jnp.asarray(pa_w), jnp.asarray(pb_idx), jnp.asarray(pb_w), jnp.asarray(target), jnp.asarray(weight))
                    rm = constraint_residuals(jnp.asarray(X - d), jnp.asarray(pa_idx), jnp.asarray(pa_w), jnp.asarray(pb_idx), jnp.asarray(pb_w), jnp.asarray(target), jnp.asarray(weight))
                    num = (np.asarray(rp)[q] - np.asarray(rm)[q]) / (2 * eps)
                    # several slots may reference the same point; sum those blocks
                    same = np.asarray(idx)[q] == p
                    np.testing.assert_allclose(np.asarray(J)[q][same, j].sum(), num, atol=1e-6)


class TestLMConvergence:
    def test_noiseless_converges_to_zero(self):
        _scene, ip, views, cam_idx, pt_idx, X0, problem = _scene_problem(noise=0.0)
        rng = np.random.default_rng(0)
        cam9 = initial_cam9(_scene.cameras)
        cam9[:, :3] += rng.normal(scale=0.01, size=cam9[:, :3].shape)
        cam9[:, 3:6] += rng.normal(scale=0.03, size=(len(cam9), 3))
        res = lm_solve(problem, cam9, X0, BAConfig(max_iter=60))
        assert res.cost_final < 1e-12
        assert _pixel_rmse(res, views, cam_idx, pt_idx, ip.img_xy) < 1e-4

    def test_noisy_reaches_noise_floor(self):
        _scene, ip, views, cam_idx, pt_idx, X0, problem = _scene_problem(noise=0.5)
        cam9 = initial_cam9(_scene.cameras)
        res = lm_solve(problem, cam9, X0, BAConfig(max_iter=60))
        rmse = _pixel_rmse(res, views, cam_idx, pt_idx, ip.img_xy)
        assert 0.2 < rmse < 0.6  # at/below the 0.5 px injected noise

    def test_dense_cg_and_schur_agree(self):
        _scene, ip, views, cam_idx, pt_idx, X0, problem = _scene_problem(noise=0.5)
        rng = np.random.default_rng(1)
        cam9 = initial_cam9(_scene.cameras)
        cam9[:, 3:6] += rng.normal(scale=0.02, size=(len(cam9), 3))
        res_d = lm_solve(problem, cam9, X0, BAConfig(max_iter=60, solver="dense"))
        res_c = lm_solve(problem, cam9, X0, BAConfig(max_iter=60, solver="cg"))
        res_s = lm_solve(problem, cam9, X0, BAConfig(max_iter=60, solver="schur"))
        assert res_d.cost_final == pytest.approx(res_c.cost_final, rel=1e-6)
        assert res_d.cost_final == pytest.approx(res_s.cost_final, rel=1e-6)

    def test_cost_monotone_nonincreasing(self):
        _scene, ip, views, cam_idx, pt_idx, X0, problem = _scene_problem(noise=0.5)
        cam9 = initial_cam9(_scene.cameras)
        res = lm_solve(problem, cam9, X0, BAConfig(max_iter=30))
        assert res.cost_final <= res.cost_initial

    def test_frozen_cameras_do_not_move(self):
        _scene, ip, views, cam_idx, pt_idx, X0, problem = _scene_problem(
            noise=0.5, fixed_cameras=np.array([True, False, False, False])
        )
        cam9 = initial_cam9(_scene.cameras)
        res = lm_solve(problem, cam9, X0, BAConfig(max_iter=30))
        np.testing.assert_array_equal(res.cam9[0, :6], cam9[0, :6])
        assert not np.allclose(res.cam9[1, :6], cam9[1, :6])


class TestRobustLoss:
    @pytest.mark.slow  # 51 s: outlier-stress variant; the fast tier keeps the robust-loss unit contract
    def test_soft_l1_resists_outliers(self):
        scene = default_ring_scene(noise_sigma_px=0.5, n_frames=10)
        ip = scene.image_points_noisy()
        ip, _mask = inject_outliers(ip, fraction=0.05, magnitude_px=40.0, rng=np.random.default_rng(3))
        cams = scene.cameras
        views = cams.device_views(posed_only=True)
        id_to_idx = {int(c): i for i, c in enumerate(views.cam_ids)}
        cam_idx = np.array([id_to_idx[int(c)] for c in ip.cam_id])
        pt_idx, keys = ip.point_index()
        wp = ip.triangulate(cams)
        key_map = {tuple(k): i for i, k in enumerate(wp.keys())}
        X0 = wp.xyz[np.array([key_map[tuple(k)] for k in keys])]
        problem = make_problem(cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye)
        cam9 = initial_cam9(cams)
        fx_med = float(np.median(views.K[:, 0, 0]))
        res_lin = lm_solve(problem, cam9, X0, BAConfig(loss="linear", max_iter=60))
        res_rob = lm_solve(problem, cam9, X0, BAConfig(loss="soft_l1", f_scale=1.0 / fx_med, max_iter=60))

        # Pose accuracy vs ground truth must be better under the robust loss
        gt9 = initial_cam9(cams)
        err_lin = np.linalg.norm(res_lin.cam9[:, 3:6] - gt9[:, 3:6])
        err_rob = np.linalg.norm(res_rob.cam9[:, 3:6] - gt9[:, 3:6])
        assert err_rob < err_lin

    def test_refine_intrinsics_respects_bounds(self):
        _scene, ip, views, cam_idx, pt_idx, X0, problem = _scene_problem(noise=0.5, refine_intrinsics=True)
        cam9 = initial_cam9(_scene.cameras)
        res = lm_solve(problem, cam9, X0, BAConfig(max_iter=40))
        s, k1, k2 = res.cam9[:, 6], res.cam9[:, 7], res.cam9[:, 8]
        assert (s >= 0.5).all() and (s <= 2.0).all()
        assert (np.abs(k1) <= 1.0).all() and (np.abs(k2) <= 2.0).all()


class TestConstraints:
    def test_distance_constraints_pull_points_to_metric(self):
        """Two noisy points constrained to their exact separation end up at
        (nearly) that separation after BA."""
        _scene, ip, views, cam_idx, pt_idx, X0, _ = _scene_problem(noise=1.5)
        # constrain keypoints 0 and 6 of sync 0 (same board row, known spacing)
        wp_gt = _scene.world_points()
        gt_map = {tuple(k): x for k, x in zip(wp_gt.keys(), wp_gt.xyz)}
        ipn = _scene.image_points_noisy()
        pidx, uk = ipn.point_index()
        a = np.where((uk[:, 0] == 0) & (uk[:, 2] == 0))[0]
        b = np.where((uk[:, 0] == 0) & (uk[:, 2] == 6))[0]
        assert len(a) and len(b)
        a, b = int(a[0]), int(b[0])
        d_true = float(np.linalg.norm(gt_map[tuple(uk[a])] - gt_map[tuple(uk[b])]))
        constraints = (
            np.array([[a, a, a, a]], np.int32),
            np.array([[1.0, 0, 0, 0]]),
            np.array([[b, b, b, b]], np.int32),
            np.array([[1.0, 0, 0, 0]]),
            np.array([d_true]),
            np.array([1000.0]),
        )
        views = _scene.cameras.device_views(posed_only=True)
        id_to_idx = {int(c): i for i, c in enumerate(views.cam_ids)}
        cam_idx = np.array([id_to_idx[int(c)] for c in ipn.cam_id])
        problem = make_problem(cam_idx, pidx, ipn.img_xy, views.K, views.dist, views.fisheye, constraints=constraints)
        wp = ipn.triangulate(_scene.cameras)
        key_map = {tuple(k): i for i, k in enumerate(wp.keys())}
        X0 = wp.xyz[np.array([key_map[tuple(k)] for k in uk])]
        cam9 = initial_cam9(_scene.cameras)
        res = lm_solve(problem, cam9, X0, BAConfig(max_iter=60))
        d_after = float(np.linalg.norm(res.X[a] - res.X[b]))
        assert abs(d_after - d_true) < 5e-4
        # the Schur path (preconditioned CG when constraints present) agrees
        res_s = lm_solve(problem, cam9, X0, BAConfig(max_iter=60, solver="schur"))
        assert res_s.cost_final == pytest.approx(res.cost_final, rel=1e-5)


class TestImplicitSchur:
    def test_schur_cg_matches_explicit_schur(self, rng):
        """The G-free reduced-system CG must land on the same step/optimum
        as the explicit Schur elimination (unconstrained problems)."""
        scene, ip, views, cam_idx, pt_idx, X0, _p = _scene_problem(noise=0.4)
        problem = make_problem(cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye)
        cam9 = initial_cam9(scene.cameras)
        cam9 = cam9 + rng.normal(scale=0.01, size=cam9.shape)
        cfg = dict(max_iter=25, ftol=1e-12, gtol=0.0)
        # single-step equivalence (tight): the same damped system solved two ways
        import jax.numpy as jnp

        from caliscope_tpu.solvers.bundle import lm_iteration

        lam = jnp.asarray(1e-4, problem.uv.dtype)
        c_s, X_s, _l, cost_s, _a = lm_iteration(problem, jnp.asarray(cam9), jnp.asarray(X0), lam, solver="schur")
        c_i, X_i, _l, cost_i, _a = lm_iteration(problem, jnp.asarray(cam9), jnp.asarray(X0), lam, solver="schur_cg", cg_max_iter=100, cg_tol=1e-10)
        np.testing.assert_allclose(np.asarray(c_i), np.asarray(c_s), atol=2e-6)
        np.testing.assert_allclose(np.asarray(X_i), np.asarray(X_s), atol=2e-6)
        assert float(cost_i) == pytest.approx(float(cost_s), rel=1e-6)

        # full-solve: same optimum cost (X may drift within the gauge freedom)
        res_schur = lm_solve(problem, cam9, X0, BAConfig(solver="schur", **cfg))
        res_icg = lm_solve(problem, cam9, X0, BAConfig(solver="schur_cg", cg_max_iter=60, **cfg))
        assert res_icg.cost_final == pytest.approx(res_schur.cost_final, rel=1e-6)

    def test_schur_cg_rejects_constraints(self, rng):
        scene, ip, views, cam_idx, pt_idx, X0, _p = _scene_problem(noise=0.4)
        con = (
            np.zeros((1, 4), np.int32), np.array([[1.0, 0, 0, 0]]),
            np.ones((1, 4), np.int32), np.array([[1.0, 0, 0, 0]]),
            np.array([0.05]), np.array([10.0]),
        )
        problem = make_problem(
            cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye, constraints=con
        )
        cam9 = initial_cam9(scene.cameras)
        with pytest.raises(ValueError, match="schur_cg"):
            lm_solve(problem, cam9, X0, BAConfig(solver="schur_cg"))


class TestDenseLayout:
    """The dense (P, C) observation layout must be numerically interchangeable
    with the sparse row layout on every solver path (solvers/bundle.py
    BADenseProblem — the production layout volume.optimize picks at scale)."""

    def _both_problems(self, rng, constraints=None):
        scene, ip, views, cam_idx, pt_idx, X0, sparse = _scene_problem(noise=0.4)
        from caliscope_tpu.solvers.bundle import make_dense_problem

        if constraints is not None:
            sparse = make_problem(
                cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye,
                constraints=constraints,
            )
        dense = make_dense_problem(
            cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye,
            n_points=X0.shape[0], constraints=constraints,
        )
        cam9 = initial_cam9(scene.cameras)
        cam9 = cam9 + rng.normal(scale=0.01, size=cam9.shape)
        return sparse, dense, cam9, X0

    @pytest.mark.parametrize("solver", ["dense", "schur", "schur_cg", "cg"])
    def test_solvers_match_sparse_layout(self, rng, solver):
        sparse, dense, cam9, X0 = self._both_problems(rng)
        cfg = BAConfig(solver=solver, max_iter=20, ftol=1e-12, gtol=0.0, cg_max_iter=100)
        a = lm_solve(sparse, cam9, X0, cfg)
        b = lm_solve(dense, cam9, X0, cfg)
        assert b.cost_final == pytest.approx(a.cost_final, rel=1e-6)
        np.testing.assert_allclose(b.cam9, a.cam9, atol=5e-6)

    def test_constrained_matches_sparse_layout(self, rng):
        con = (
            np.zeros((1, 4), np.int32), np.array([[1.0, 0, 0, 0]]),
            np.ones((1, 4), np.int32), np.array([[1.0, 0, 0, 0]]),
            np.array([0.05]), np.array([10.0]),
        )
        sparse, dense, cam9, X0 = self._both_problems(rng, constraints=con)
        cfg = BAConfig(solver="schur", max_iter=20, ftol=1e-12, gtol=0.0)
        a = lm_solve(sparse, cam9, X0, cfg)
        b = lm_solve(dense, cam9, X0, cfg)
        assert b.cost_final == pytest.approx(a.cost_final, rel=1e-6)

    def test_duplicate_pairs_rejected(self):
        from caliscope_tpu.solvers.bundle import make_dense_problem

        K = np.tile(np.eye(3) * 100.0, (2, 1, 1))
        K[:, 2, 2] = 1.0
        with pytest.raises(ValueError, match="duplicates"):
            make_dense_problem(
                np.array([0, 0]), np.array([1, 1]), np.zeros((2, 2)),
                K, np.zeros((2, 5)), np.zeros(2, bool), n_points=4,
            )

    def test_sharded_dense_matches_single_placement(self, rng):
        """Point-axis sharding over the virtual mesh, including a point count
        that does NOT divide the mesh (pad + trim path)."""
        from caliscope_tpu.parallel.sharded import make_obs_mesh
        from caliscope_tpu.solvers.bundle import make_dense_problem

        scene, ip, views, cam_idx, pt_idx, X0, _ = _scene_problem(noise=0.4)
        n_pts = X0.shape[0]
        if n_pts % 8 == 0:  # force the ragged pad path
            keep = pt_idx != (n_pts - 1)
            cam_idx, pt_idx = cam_idx[keep], pt_idx[keep]
            ip_xy = ip.img_xy[keep]
            n_pts -= 1
            X0 = X0[:n_pts]
        else:
            ip_xy = ip.img_xy
        dense = make_dense_problem(
            cam_idx, pt_idx, ip_xy, views.K, views.dist, views.fisheye, n_points=n_pts
        )
        dense2 = make_dense_problem(
            cam_idx, pt_idx, ip_xy, views.K, views.dist, views.fisheye, n_points=n_pts
        )
        cam9 = initial_cam9(scene.cameras) + rng.normal(scale=0.01, size=(len(views.K), 9))
        cfg = BAConfig(solver="schur", max_iter=15, ftol=1e-12, gtol=0.0)
        single = lm_solve(dense, cam9, X0, cfg)
        mesh = make_obs_mesh(jax.devices("cpu"))
        sharded = lm_solve(dense2, cam9, X0, cfg, mesh=mesh)
        assert sharded.n_devices == len(jax.devices("cpu"))
        assert sharded.X.shape == (n_pts, 3)
        assert sharded.cost_final == pytest.approx(single.cost_final, rel=1e-8)
        np.testing.assert_allclose(sharded.cam9, single.cam9, atol=1e-8)


class TestObsMinorLayout:
    """The round-5 obs-minor sparse internals vs the row-major reference
    implementations: block builder, gradient/diag reductions, Hessian
    matvec, and the full solve routed through the obs-minor path."""

    def _blocks_inputs(self, fisheye_mix=False):
        scene, ip, views, cam_idx, pt_idx, X0, problem = _scene_problem(n_frames=6)
        if fisheye_mix:
            fe = np.zeros(len(views.cam_ids), bool)
            fe[::2] = True
            problem = make_problem(cam_idx, pt_idx, ip.img_xy, views.K, views.dist, fe)
        cam9 = initial_cam9(scene.cameras)
        return problem, jnp.asarray(cam9, problem.uv.dtype), jnp.asarray(X0, problem.uv.dtype)

    @pytest.mark.parametrize("fisheye_mix", [False, True])
    def test_obs_minor_blocks_match_row_major(self, fisheye_mix):
        from caliscope_tpu.ops.reprojection import (
            observation_blocks_obs_minor,
            observation_jacobian_blocks,
            observation_residuals_obs_minor,
        )

        problem, cam9, X = self._blocks_inputs(fisheye_mix)
        r0, Jc0, Jp0 = observation_jacobian_blocks(
            cam9, X, problem.cam_idx, problem.pt_idx, problem.uv,
            problem.K0, problem.dist0, problem.fisheye, problem.inv_fx, problem.any_fisheye,
        )
        r1, Jc1, Jp1 = observation_blocks_obs_minor(
            cam9, X, problem.cam_idx, problem.pt_idx, problem.uv.T,
            problem.K0, problem.dist0, problem.fisheye, problem.inv_fx, problem.any_fisheye,
        )
        np.testing.assert_allclose(np.asarray(r1.T), np.asarray(r0), rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(Jc1, (2, 0, 1))), np.asarray(Jc0), rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(Jp1, (2, 0, 1))), np.asarray(Jp0), rtol=1e-7, atol=1e-9
        )
        rr = observation_residuals_obs_minor(
            cam9, X, problem.cam_idx, problem.pt_idx, problem.uv.T,
            problem.K0, problem.dist0, problem.fisheye, problem.inv_fx, problem.any_fisheye,
        )
        np.testing.assert_allclose(np.asarray(rr), np.asarray(r1), rtol=1e-12, atol=0)

    def test_obs_minor_grad_diag_and_matvec_match(self, rng):
        from caliscope_tpu.solvers import bundle as B

        problem, cam9, X = self._blocks_inputs()
        n_points = X.shape[0]
        r0, w0, Jc0, Jp0, rq, qidx, Jq, cost0 = B._masked_blocks(problem, cam9, X, "soft_l1", 1e-3)
        r1, w1, Jc1, Jp1, rq1, qidx1, Jq1, cost1 = B._masked_blocks(
            problem, cam9, X, "soft_l1", 1e-3, obs_minor=True
        )
        np.testing.assert_allclose(float(cost1), float(cost0), rtol=1e-10)
        g_c0, g_p0, d_c0, d_p0 = B._gradient_and_diag(problem, w0, r0, Jc0, Jp0, rq, qidx, Jq, n_points)
        g_c1, g_p1, d_c1, d_p1 = B._gradient_and_diag(
            problem, w1, r1, Jc1, Jp1, rq1, qidx1, Jq1, n_points, obs_minor=True
        )
        np.testing.assert_allclose(np.asarray(g_c1), np.asarray(g_c0), rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(np.asarray(g_p1), np.asarray(g_p0), rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(np.asarray(d_c1), np.asarray(d_c0), rtol=1e-7, atol=1e-10)
        # obs-minor carries d_p POINT-MINOR (3,3,P)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(d_p1, (2, 0, 1))), np.asarray(d_p0), rtol=1e-7, atol=1e-10
        )
        vc = jnp.asarray(rng.normal(size=g_c0.shape), g_c0.dtype)
        vp = jnp.asarray(rng.normal(size=g_p0.shape), g_p0.dtype)
        hc0, hp0 = B._hessian_matvec(problem, w0, Jc0, Jp0, qidx, Jq, vc, vp)
        hc1, hp1 = B._hessian_matvec_obs_minor(problem, w1, Jc1, Jp1, qidx1, Jq1, vc, vp)
        np.testing.assert_allclose(np.asarray(hc1), np.asarray(hc0), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(hp1), np.asarray(hp0), rtol=1e-7, atol=1e-9)

    @pytest.mark.parametrize("solver", ["schur", "schur_cg", "cg", "dense"])
    def test_full_solve_obs_minor_matches_row_major(self, solver):
        """lm_solve single-placement (obs-minor) vs mesh=None forced row
        layout: same optimum. The row-major arm is obtained by solving on
        a 1-device mesh, which pins the sharded (row) code path."""
        import jax

        scene, ip, views, cam_idx, pt_idx, X0, problem = _scene_problem(n_frames=6)
        cam9 = initial_cam9(scene.cameras)
        cfg = BAConfig(max_iter=40, solver=solver, shard="never", obs_minor="always")
        res_minor = lm_solve(problem, cam9, X0, cfg)
        if solver in ("schur", "schur_cg"):
            from caliscope_tpu.parallel.sharded import make_obs_mesh

            mesh = make_obs_mesh(jax.devices("cpu")[:1])
            res_row = lm_solve(problem, cam9, X0, cfg, mesh=mesh)
            np.testing.assert_allclose(res_minor.cost_final, res_row.cost_final, rtol=5e-6)
        assert res_minor.cost_final < res_minor.cost_initial
