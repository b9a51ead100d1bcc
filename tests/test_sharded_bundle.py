"""Multi-device LM: sharded-vs-single-device equivalence on the virtual
8-device CPU mesh (conftest sets xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caliscope_tpu.parallel import make_obs_mesh, shard_problem, sharded_lm_iteration
from caliscope_tpu.solvers.bundle import BAConfig, initial_cam9, lm_iteration, lm_solve, make_problem
from caliscope_tpu.synthetic.factories import default_ring_scene


@pytest.fixture(scope="module")
def problem_setup():
    scene = default_ring_scene(noise_sigma_px=0.5, n_frames=8)
    ip = scene.image_points_noisy()
    views = scene.cameras.device_views(posed_only=True)
    id_to_idx = {int(c): i for i, c in enumerate(views.cam_ids)}
    cam_idx = np.array([id_to_idx[int(c)] for c in ip.cam_id])
    pt_idx, keys = ip.point_index()
    wp = ip.triangulate(scene.cameras)
    key_map = {tuple(k): i for i, k in enumerate(wp.keys())}
    X0 = wp.xyz[np.array([key_map[tuple(k)] for k in keys])]
    problem = make_problem(cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye)
    cam9 = initial_cam9(scene.cameras)
    rng = np.random.default_rng(5)
    cam9[:, 3:6] += rng.normal(scale=0.02, size=(len(cam9), 3))
    return problem, cam9, X0


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_iteration_matches_single_device(problem_setup):
    problem, cam9, X0 = problem_setup
    lam = np.asarray(1e-4, dtype=np.asarray(problem.uv).dtype)

    c1, x1, l1, cost1, acc1 = lm_iteration(
        problem, jnp.asarray(cam9), jnp.asarray(X0), jnp.asarray(lam), cg_max_iter=100
    )

    mesh = make_obs_mesh()
    sharded = shard_problem(problem, mesh)
    # padded rows are masked: results must match the unsharded solve
    c2, x2, l2, cost2, acc2 = sharded_lm_iteration(sharded, cam9, X0, lam, mesh, cg_max_iter=100)

    assert bool(acc1) == bool(acc2)
    np.testing.assert_allclose(np.asarray(cost1), np.asarray(cost2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-8, atol=1e-12)


def test_sharded_inputs_are_actually_distributed(problem_setup):
    problem, _cam9, _X0 = problem_setup
    mesh = make_obs_mesh()
    sharded = shard_problem(problem, mesh)
    assert len(sharded.uv.sharding.device_set) == 8
    # each shard holds 1/8 of the padded axis
    shard_rows = sharded.uv.addressable_shards[0].data.shape[0]
    assert shard_rows == sharded.uv.shape[0] // 8


def test_full_solve_on_sharded_problem(problem_setup):
    """lm_solve accepts a sharded problem transparently (jit + GSPMD)."""
    problem, cam9, X0 = problem_setup
    mesh = make_obs_mesh()
    sharded = shard_problem(problem, mesh)
    res_ref = lm_solve(problem, cam9, X0, BAConfig(max_iter=20, solver="cg"))
    res_sh = lm_solve(sharded, cam9, X0, BAConfig(max_iter=20, solver="cg"))
    assert res_sh.cost_final == pytest.approx(res_ref.cost_final, rel=1e-8)


def test_lm_solve_auto_shards_by_policy(problem_setup):
    """config.shard drives mesh construction inside lm_solve itself."""
    problem, cam9, X0 = problem_setup
    res_never = lm_solve(problem, cam9, X0, BAConfig(max_iter=15, shard="never"))
    assert res_never.n_devices == 1
    res_always = lm_solve(problem, cam9, X0, BAConfig(max_iter=15, shard="always"))
    assert res_always.n_devices == 8
    assert res_always.cost_final == pytest.approx(res_never.cost_final, rel=1e-6)
    # 'auto' on a small problem stays single-placement; lowering the
    # threshold flips it on
    assert lm_solve(problem, cam9, X0, BAConfig(max_iter=2, shard="auto")).n_devices == 1
    res_auto = lm_solve(
        problem, cam9, X0, BAConfig(max_iter=2, shard="auto", shard_min_obs=1)
    )
    assert res_auto.n_devices == 8


def test_capture_volume_optimize_sharded_is_production_path(problem_setup):
    """CaptureVolume.optimize(shard='always') runs the full production BA
    sharded over the 8-device mesh and reaches the single-placement optimum."""
    from caliscope_tpu.synthetic.camera_synthesizer import strip_extrinsics
    from caliscope_tpu.volume import CaptureVolume

    scene = default_ring_scene(noise_sigma_px=0.5, n_frames=8)
    ip = scene.image_points_noisy()
    vol = CaptureVolume.bootstrap(ip, strip_extrinsics(scene.cameras))
    single = vol.optimize(shard="never")
    sharded = vol.optimize(shard="always")
    r_single = single.reprojection_report.overall_rmse
    r_sharded = sharded.reprojection_report.overall_rmse
    assert r_sharded == pytest.approx(r_single, rel=1e-6)
    assert r_sharded < vol.reprojection_report.overall_rmse


def test_sharded_program_contracts_obs_axis_with_collectives(problem_setup):
    """The compiled SPMD iteration must reduce the sharded observation axis
    with all-reduce collectives (the ICI-riding psums of the design in
    parallel/sharded.py) — not by gathering observations to one device.
    Verified on the compiled HLO: all-reduces present, no all-gather of the
    full observation arrays."""
    problem, cam9, X0 = problem_setup
    mesh = make_obs_mesh()
    sharded = shard_problem(problem, mesh)
    lam = np.asarray(1e-4, dtype=np.asarray(problem.uv).dtype)
    lowered = jax.jit(
        lambda p, c, x, l: lm_iteration(p, c, x, l, cg_max_iter=100)
    ).lower(sharded, jnp.asarray(cam9), jnp.asarray(X0), jnp.asarray(lam))
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo
    # the (N, 2, 9) camera Jacobian blocks must never be materialized
    # replicated: an all-gather of a tensor with the padded obs-axis length
    # would mean the reduction pulled data instead of reducing in place
    n_pad = sharded.uv.shape[0]
    for line in hlo.splitlines():
        if "all-gather" in line and f"{n_pad}," in line:
            raise AssertionError(f"full-observation all-gather found: {line.strip()}")


@pytest.fixture(scope="module")
def dense_setup(problem_setup):
    """Dense-layout problem built from the same scene (unique pairs hold
    for a moving board: every (point, camera) pair observed once)."""
    from caliscope_tpu.ops.bucket import bucket_size
    from caliscope_tpu.solvers.bundle import make_dense_problem

    problem, cam9, X0 = problem_setup
    Pb = bucket_size(X0.shape[0] + 1, fine=True)
    Xb = np.concatenate([X0, np.tile(X0.mean(axis=0), (Pb - X0.shape[0], 1))])
    dense = make_dense_problem(
        np.asarray(problem.cam_idx), np.asarray(problem.pt_idx), np.asarray(problem.uv),
        np.asarray(problem.K0), np.asarray(problem.dist0), np.asarray(problem.fisheye),
        n_points=Pb,
    )
    return dense, cam9, Xb


def test_dense_sharded_solve_matches_single_device(dense_setup):
    """The dense point-minor layout (incl. the per-k mesh staging of the
    Schur complement) must be numerically equivalent sharded vs single
    placement — guards the GSPMD layout hazards found in round 4 (merged
    sharded-axis reshapes silently all-gathered)."""
    dense, cam9, Xb = dense_setup
    cfg = BAConfig(max_iter=10, ftol=0.0, gtol=0.0, xtol=0.0, solver="schur")
    single = lm_solve(dense, cam9, Xb, cfg)
    sharded = lm_solve(dense, cam9, Xb, cfg, mesh=make_obs_mesh())
    assert sharded.n_iterations == single.n_iterations
    np.testing.assert_allclose(sharded.cost_final, single.cost_final, rtol=1e-5)
    np.testing.assert_allclose(sharded.cam9, single.cam9, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(sharded.X, single.X, rtol=1e-4, atol=1e-5)


def test_constrained_dense_sharded_matches_single_device(dense_setup):
    """Constraints exercise the OTHER branch of the dense Schur path (the
    caller's constraint-folded d_p is transposed rather than recomputed),
    plus the Schur-preconditioned full-system CG — all under a mesh."""
    dense, cam9, Xb = dense_setup
    from dataclasses import replace

    rng = np.random.default_rng(11)
    P_real = 40  # constrain a handful of real points pairwise
    pa = rng.integers(0, P_real, size=(6, 1))
    pb = rng.integers(0, P_real, size=(6, 1))
    pa_idx = np.pad(pa, ((0, 0), (0, 3))).astype(np.int32)
    pb_idx = np.pad(pb, ((0, 0), (0, 3))).astype(np.int32)
    w4 = np.pad(np.ones((6, 1)), ((0, 0), (0, 3)))
    target = np.linalg.norm(Xb[pa[:, 0]] - Xb[pb[:, 0]], axis=1)
    constrained = replace(
        dense,
        con_pa_idx=pa_idx, con_pa_w=w4, con_pb_idx=pb_idx, con_pb_w=w4,
        con_target=target.astype(np.asarray(dense.uv).dtype),
        con_weight=np.full(6, 50.0, np.asarray(dense.uv).dtype),
    )
    cfg = BAConfig(max_iter=6, ftol=0.0, gtol=0.0, xtol=0.0, solver="schur")
    single = lm_solve(constrained, cam9, Xb, cfg)
    sharded = lm_solve(constrained, cam9, Xb, cfg, mesh=make_obs_mesh())
    np.testing.assert_allclose(sharded.cost_final, single.cost_final, rtol=1e-5)
    np.testing.assert_allclose(sharded.cam9, single.cam9, rtol=1e-4, atol=1e-6)
