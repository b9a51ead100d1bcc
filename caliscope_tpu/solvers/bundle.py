"""Sparse bundle adjustment as TPU-native Levenberg-Marquardt.

Parity: reference src/caliscope/core/capture_volume.py:322-444 drives
scipy.optimize.least_squares(method="trf", x_scale="jac", jac=sparse analytic,
loss=linear|soft_l1, bounds) over [per-camera 6-or-9 blocks, 3D points].
This module reaches the same optima with a fundamentally different engine:

- Residuals/Jacobians: per-observation dense blocks from ONE differentiable
  projection (ops/reprojection.py) — no sparse matrices, no host round trips.
- Robust loss: IRLS reweighting inside the LM loop (soft_l1 rho' weights),
  equivalent to scipy's loss-transformed least squares at the optimum.
- Box bounds: projected LM steps (bounds only bind on the free-intrinsics
  block s/k1/k2, reference bundle_parameterization.py:151-164).
- Normal equations, four interchangeable linear solvers:
    * 'dense'    — assemble the full (9C+3P) system, Cholesky. Exact; right
      for calibration-sized problems (P up to a few thousand).
    * 'schur'    — explicit Schur elimination of the points (classic SBA);
      the workhorse at real-session scale.
    * 'schur_cg' — implicit Schur: CG on the reduced camera system with
      matrix-free S-products; no (C, P, 9, 3) coupling tensor, so it scales
      past the explicit solver's memory ceiling (reprojection-only).
    * 'cg'       — matrix-free preconditioned CG on the FULL system; the
      constrained-problem fallback at scale.
  The observation axis may be jax.sharding-sharded across a device mesh, in
  which case XLA turns the segment sums into psums/reduce-scatters over ICI
  (no hand-written collectives needed) and point-axis work shards too.
- The entire LM loop (assembly, solve, gain-ratio damping control) runs as one
  lax.while_loop under jit: zero host<->device ping-pong per iteration.

Everything is dtype-polymorphic: x64 on CPU for parity testing, f32 on TPU
(with Marquardt diag scaling standing in for scipy's x_scale="jac").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from caliscope_tpu.ops.reprojection import (
    N_CAM_PARAMS,
    constraint_jacobian_blocks,
    dense_observation_jacobian_blocks,
    dense_observation_residuals,
    observation_blocks_obs_minor,
    observation_jacobian_blocks,
    observation_residuals,
    observation_residuals_obs_minor,
    constraint_residuals,
    robust_weights_and_cost,
)

# Free-intrinsics bounds: s in [0.5, 2], k1 in [-1, 1], k2 in [-2, 2]
# (reference bundle_parameterization.py:151-164).
INTRINSIC_LOWER = np.array([0.5, -1.0, -2.0])
INTRINSIC_UPPER = np.array([2.0, 1.0, 2.0])
BIG = 1e20


@dataclass(frozen=True)
class BAConfig:
    """Solver configuration (static under jit)."""

    loss: str = "linear"  # 'linear' | 'soft_l1'
    f_scale: float = 1.0  # robust inlier scale, in normalized residual units
    max_iter: int = 200
    ftol: float = 1e-8
    xtol: float = 1e-10
    gtol: float = 1e-12
    solver: str = "auto"  # 'auto' | 'dense' | 'schur' | 'schur_cg' | 'cg'
    cg_tol: float = 1e-6
    cg_max_iter: int = 200
    init_lambda: float = 1e-4
    # 'auto' picks dense when 9C + 3P <= dense_cutoff
    dense_cutoff: int = 6000
    # Bake the problem arrays into the executable as compile-time constants.
    # With the observation pattern (cam_idx/pt_idx) static, XLA specializes
    # the segment reductions and scatter layouts — measured ~2.2x per LM
    # iteration on TPU at real-session scale. Cost: the executable is
    # problem-specific, so EVERY lm_solve call recompiles (~tens of seconds
    # on TPU, seconds on CPU). Worth it for long solves / steady-state
    # serving of one problem shape; leave False for interactive pipelines
    # that solve many small problems.
    bake_problem: bool = False
    # Observation-axis data parallelism over jax.devices():
    #   'auto'   — shard when >1 device is visible AND the problem is big
    #              enough that per-device work dominates the collective cost
    #   'never'  — always single-placement
    #   'always' — shard over all devices regardless of size (tests/dryrun)
    shard: str = "auto"
    shard_min_obs: int = 20_000
    # Sparse-problem observation-MINOR layout (r (2,N), Jc (2,9,N), ...):
    #   'auto'   — on single-placement ACCELERATOR backends only. The
    #              layout exists because TPU tiles are (8, 128) over the
    #              minor dims (row-major (N,2,9) tensors inflate ~57x);
    #              CPU has no tiling and pays the larger unrolled graph in
    #              compile time instead (~4x suite-wide, measured round 5)
    #   'always' / 'never' — force (tests pin both arms explicitly)
    obs_minor: str = "auto"


@dataclass
class BAProblem:
    """Device-array bundle-adjustment problem (observations + constraints).

    Observation arrays may be padded: padded rows must carry obs_mask=False.
    """

    cam_idx: jnp.ndarray  # (N,) int32
    pt_idx: jnp.ndarray  # (N,) int32
    uv: jnp.ndarray  # (N,2) pixels
    obs_mask: jnp.ndarray  # (N,) bool
    K0: jnp.ndarray  # (C,3,3) initial intrinsics
    dist0: jnp.ndarray  # (C,5) initial distortions (zero-padded)
    fisheye: jnp.ndarray  # (C,) bool
    inv_fx: jnp.ndarray  # (C,) 1/fx_init residual scaling
    param_free: jnp.ndarray  # (C,9) bool — which camera params move
    # Distance constraints (Q may be 0)
    con_pa_idx: jnp.ndarray  # (Q,4)
    con_pa_w: jnp.ndarray  # (Q,4)
    con_pb_idx: jnp.ndarray  # (Q,4)
    con_pb_w: jnp.ndarray  # (Q,4)
    con_target: jnp.ndarray  # (Q,)
    con_weight: jnp.ndarray  # (Q,)
    # STATIC (pytree-meta) hint: False lets the projection skip the fisheye
    # model entirely for all-Brown rigs (the common case) — under jacfwd the
    # equidistant atan and its 12 tangents are a measurable blocks cost
    any_fisheye: bool = True

    # Registered as a JAX pytree (array fields are leaves; any_fisheye is
    # static metadata) so a BAProblem can be passed straight into jitted
    # solvers; shapes (N, C, P, Q) are static.

    @property
    def n_cameras(self) -> int:
        return self.K0.shape[0]

    @property
    def n_obs(self) -> int:
        return self.cam_idx.shape[0]

    @property
    def n_constraints(self) -> int:
        return self.con_target.shape[0]


jax.tree_util.register_dataclass(
    BAProblem,
    data_fields=[
        "cam_idx", "pt_idx", "uv", "obs_mask", "K0", "dist0", "fisheye",
        "inv_fx", "param_free", "con_pa_idx", "con_pa_w", "con_pb_idx",
        "con_pb_w", "con_target", "con_weight",
    ],
    meta_fields=["any_fisheye"],
)


@dataclass
class BADenseProblem:
    """Bundle-adjustment problem in the DENSE (P, C) observation layout.

    Key insight (TPU-first): a camera observes a world point at most once,
    so the observation structure is bounded by the dense points x cameras
    grid. Storing it that way turns both observation indices into ARRAY
    AXES — the solver needs no cam_idx/pt_idx gathers and no segment-sum
    scatters anywhere; every normal-equation reduction is a dense einsum
    XLA maps straight onto the MXU. The cost is padding: unobserved (p, c)
    slots carry obs_mask=False and contribute exact zeros. Worth it when
    the grid is reasonably full (the canonical 8-camera session is ~50%
    dense); volume.optimize picks the layout automatically.

    Not applicable when one (point, camera) pair has multiple observations
    (static objects collapse many sync indices onto one world point) —
    make_problem's sparse row layout remains the general path.
    """

    uv: jnp.ndarray  # (C, 2, P) pixels — POINT-MINOR (P rides the TPU lane dim)
    obs_mask: jnp.ndarray  # (C, P) bool
    K0: jnp.ndarray  # (C,3,3)
    dist0: jnp.ndarray  # (C,5)
    fisheye: jnp.ndarray  # (C,)
    inv_fx: jnp.ndarray  # (C,)
    param_free: jnp.ndarray  # (C,9)
    con_pa_idx: jnp.ndarray
    con_pa_w: jnp.ndarray
    con_pb_idx: jnp.ndarray
    con_pb_w: jnp.ndarray
    con_target: jnp.ndarray
    con_weight: jnp.ndarray
    any_fisheye: bool = True  # static; see BAProblem

    @property
    def n_cameras(self) -> int:
        return self.K0.shape[0]

    @property
    def n_points(self) -> int:
        return self.uv.shape[2]

    @property
    def n_obs(self) -> int:
        # static shape proxy (the mask's true count is data-dependent)
        return self.uv.shape[0] * self.uv.shape[2]

    @property
    def n_constraints(self) -> int:
        return self.con_target.shape[0]


jax.tree_util.register_dataclass(
    BADenseProblem,
    data_fields=[
        "uv", "obs_mask", "K0", "dist0", "fisheye", "inv_fx", "param_free",
        "con_pa_idx", "con_pa_w", "con_pb_idx", "con_pb_w", "con_target",
        "con_weight",
    ],
    meta_fields=["any_fisheye"],
)


def make_problem(
    cam_idx,
    pt_idx,
    uv,
    K0,
    dist0,
    fisheye,
    refine_intrinsics: bool = False,
    fixed_cameras=None,
    constraints=None,
    obs_mask=None,
    dtype=None,
) -> BAProblem:
    """Build a BAProblem from host arrays.

    constraints: optional tuple (pa_idx, pa_w, pb_idx, pb_w, target, weight).
    fixed_cameras: optional boolean (C,) — freeze those cameras' extrinsics.

    Invariant: observation rows are stored sorted by (pt_idx, cam_idx).
    Every segment reduction keyed by point index (and the Schur coupling
    tensor's pt-major key) then sees monotonically non-decreasing segment
    ids, so the solver can assert `indices_are_sorted` to XLA's scatter
    lowering. Row order is otherwise meaningless — the solver only ever
    reduces over the observation axis.
    """
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    C = K0.shape[0]
    N = len(cam_idx)
    cam_idx = np.asarray(cam_idx)
    pt_idx = np.asarray(pt_idx)
    order = np.lexsort((cam_idx, pt_idx))
    if not np.array_equal(order, np.arange(N)):
        cam_idx = cam_idx[order]
        pt_idx = pt_idx[order]
        uv = np.asarray(uv)[order]
        if obs_mask is not None:
            obs_mask = np.asarray(obs_mask)[order]
    param_free = np.zeros((C, N_CAM_PARAMS), bool)
    param_free[:, :6] = True
    if fixed_cameras is not None:
        param_free[np.asarray(fixed_cameras, bool), :6] = False
    if refine_intrinsics:
        param_free[:, 6:] = True
    if constraints is not None:
        pa_idx, pa_w, pb_idx, pb_w, target, weight = constraints
    else:
        pa_idx = np.zeros((0, 4), np.int32)
        pa_w = np.zeros((0, 4))
        pb_idx = np.zeros((0, 4), np.int32)
        pb_w = np.zeros((0, 4))
        target = np.zeros(0)
        weight = np.zeros(0)
    if obs_mask is None:
        obs_mask = np.ones(N, bool)
    fx = np.asarray(K0)[:, 0, 0]
    np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)
    # Assemble host-side, then ONE device_put of the whole pytree — on a
    # tunneled device every individual dispatch pays a network round trip.
    host = BAProblem(
        cam_idx=np.asarray(cam_idx, np.int32),
        pt_idx=np.asarray(pt_idx, np.int32),
        uv=np.asarray(uv, np_dtype),
        obs_mask=np.asarray(obs_mask, bool),
        K0=np.asarray(K0, np_dtype),
        dist0=np.asarray(dist0, np_dtype),
        fisheye=np.asarray(fisheye, bool),
        any_fisheye=bool(np.any(np.asarray(fisheye, bool))),
        inv_fx=np.asarray(1.0 / fx, np_dtype),
        param_free=np.asarray(param_free, bool),
        con_pa_idx=np.asarray(pa_idx, np.int32),
        con_pa_w=np.asarray(pa_w, np_dtype),
        con_pb_idx=np.asarray(pb_idx, np.int32),
        con_pb_w=np.asarray(pb_w, np_dtype),
        con_target=np.asarray(target, np_dtype),
        con_weight=np.asarray(weight, np_dtype),
    )
    return jax.device_put(host)


def make_dense_problem(
    cam_idx,
    pt_idx,
    uv,
    K0,
    dist0,
    fisheye,
    n_points: int,
    refine_intrinsics: bool = False,
    fixed_cameras=None,
    constraints=None,
    obs_mask=None,
    dtype=None,
) -> BADenseProblem:
    """Build a BADenseProblem by scattering sparse observation rows into the
    (n_points, C) grid host-side. Requires every unmasked (pt, cam) pair to
    be unique — callers with duplicate pairs (static objects) must use
    make_problem. Rows with pt_idx >= n_points or obs_mask=False are dropped.
    """
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)
    C = K0.shape[0]
    cam_idx = np.asarray(cam_idx, np.int64)
    pt_idx = np.asarray(pt_idx, np.int64)
    uv = np.asarray(uv)
    keep = pt_idx < n_points
    if obs_mask is not None:
        keep = keep & np.asarray(obs_mask, bool)
    cam_k, pt_k, uv_k = cam_idx[keep], pt_idx[keep], uv[keep]
    flat = pt_k * C + cam_k
    if len(np.unique(flat)) != len(flat):
        raise ValueError(
            "dense layout needs one observation per (point, camera) pair; "
            "this problem has duplicates (static objects?) — use make_problem"
        )
    grid_uv = np.zeros((n_points, C, 2), np_dtype)
    grid_mask = np.zeros((n_points, C), bool)
    grid_uv[pt_k, cam_k] = uv_k
    grid_mask[pt_k, cam_k] = True
    # canonical DEVICE layout is POINT-MINOR: uv (C, 2, P), mask (C, P) —
    # the long point axis rides the 128-lane dim of every TPU tile (see
    # ops/reprojection.py::dense_observation_residuals)
    grid_uv = np.ascontiguousarray(grid_uv.transpose(1, 2, 0))
    grid_mask = np.ascontiguousarray(grid_mask.T)

    param_free = np.zeros((C, N_CAM_PARAMS), bool)
    param_free[:, :6] = True
    if fixed_cameras is not None:
        param_free[np.asarray(fixed_cameras, bool), :6] = False
    if refine_intrinsics:
        param_free[:, 6:] = True
    if constraints is not None:
        pa_idx, pa_w, pb_idx, pb_w, target, weight = constraints
    else:
        pa_idx = np.zeros((0, 4), np.int32)
        pa_w = np.zeros((0, 4))
        pb_idx = np.zeros((0, 4), np.int32)
        pb_w = np.zeros((0, 4))
        target = np.zeros(0)
        weight = np.zeros(0)
    fx = np.asarray(K0)[:, 0, 0]
    host = BADenseProblem(
        uv=grid_uv,
        obs_mask=grid_mask,
        K0=np.asarray(K0, np_dtype),
        dist0=np.asarray(dist0, np_dtype),
        fisheye=np.asarray(fisheye, bool),
        any_fisheye=bool(np.any(np.asarray(fisheye, bool))),
        inv_fx=np.asarray(1.0 / fx, np_dtype),
        param_free=np.asarray(param_free, bool),
        con_pa_idx=np.asarray(pa_idx, np.int32),
        con_pa_w=np.asarray(pa_w, np_dtype),
        con_pb_idx=np.asarray(pb_idx, np.int32),
        con_pb_w=np.asarray(pb_w, np_dtype),
        con_target=np.asarray(target, np_dtype),
        con_weight=np.asarray(weight, np_dtype),
    )
    return jax.device_put(host)


def initial_cam9(camera_array, cam_ids=None) -> np.ndarray:
    """Stack posed cameras into the (C,9) parameter block layout."""
    ids = cam_ids if cam_ids is not None else sorted(camera_array.posed_cameras.keys())
    rows = []
    for cid in ids:
        c = camera_array.cameras[cid]
        d = np.ravel(c.distortions) if c.distortions is not None else np.zeros(2)
        d = np.concatenate([d, np.zeros(max(0, 2 - len(d)))])
        rows.append(np.concatenate([c.rvec, c.translation, [1.0], d[:2]]))
    return np.asarray(rows)


# ---------------------------------------------------------------------------
# Normal-equation building blocks
# ---------------------------------------------------------------------------



def _pshard(x, mesh, *spec):
    """Optional GSPMD sharding hint: constrain `x` to PartitionSpec(*spec)
    over `mesh` (no-op without a mesh). Used to keep POINT-axis quantities
    sharded inside the solver so the Schur coupling tensor G (C, P, 9, 3) is
    produced by a reduce-scatter instead of a full all-reduce — at the
    canonical scale that is a 30 MB collective per iteration replaced by
    half the traffic plus a 72x72 all-reduce of the Schur complement."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, PartitionSpec(*spec)))


def _constraint_blocks(problem, X, r_dtype):
    """Shared constraint-row assembly (layout-independent: constraints key
    world points only)."""
    if problem.n_constraints:
        rq, qidx, Jq = constraint_jacobian_blocks(
            X, problem.con_pa_idx, problem.con_pa_w, problem.con_pb_idx,
            problem.con_pb_w, problem.con_target, problem.con_weight,
        )
        # constraints always use linear loss (they are metric priors)
        cost_con = 0.5 * jnp.sum(rq**2)
    else:
        rq = jnp.zeros((0,), r_dtype)
        qidx = jnp.zeros((0, 8), jnp.int32)
        Jq = jnp.zeros((0, 8, 3), r_dtype)
        cost_con = 0.0
    return rq, qidx, Jq, cost_con


def _masked_blocks_dense(problem: BADenseProblem, cam9, X, loss: str, f_scale: float):
    """Dense-layout residuals/weights/blocks, POINT-MINOR: r (C,2,P),
    Jc (C,2,9,P), Jp (C,2,3,P) — no index arrays anywhere, and the long
    point axis rides the 128-lane dimension of every TPU tile (see
    ops/reprojection.py::dense_observation_residuals for the layout
    rationale; uv/obs_mask are STORED point-minor, so no transpose ever
    runs on device)."""
    r, Jc, Jp = dense_observation_jacobian_blocks(
        cam9, X, problem.uv, problem.K0, problem.dist0, problem.fisheye, problem.inv_fx,
        problem.any_fisheye,
    )
    m = problem.obs_mask[:, None, :]  # (C,1,P)
    r = jnp.where(m, r, 0.0)
    free = problem.param_free.astype(r.dtype)  # (C,9)
    Jc = jnp.where(m[:, :, None, :], Jc, 0.0) * free[:, None, :, None]
    Jp = jnp.where(m[:, :, None, :], Jp, 0.0)
    w_obs, cost_obs = robust_weights_and_cost((r**2).reshape(-1), loss, f_scale)
    w_obs = w_obs.reshape(r.shape)
    rq, qidx, Jq, cost_con = _constraint_blocks(problem, X, r.dtype)
    return r, w_obs, Jc, Jp, rq, qidx, Jq, cost_obs + cost_con


def _masked_blocks(problem, cam9, X, loss: str, f_scale: float, obs_minor: bool = False):
    """Residuals, IRLS weights, Jacobian blocks and total robust cost.

    obs_minor: sparse problems on a single placement use the obs-minor
    layout (r (2,N), Jc (2,9,N), Jp (2,3,N) — see the obs-minor section
    above); the row-major layout remains for meshes and external callers."""
    if isinstance(problem, BADenseProblem):
        return _masked_blocks_dense(problem, cam9, X, loss, f_scale)
    if obs_minor:
        return _masked_blocks_obs_minor(problem, cam9, X, loss, f_scale)
    r, Jc, Jp = observation_jacobian_blocks(
        cam9, X, problem.cam_idx, problem.pt_idx, problem.uv,
        problem.K0, problem.dist0, problem.fisheye, problem.inv_fx,
        problem.any_fisheye,
    )
    # where-select (not multiply): a padded row may project degenerately and
    # produce NaN/inf, and 0 * NaN would poison the whole reduction
    m = problem.obs_mask[:, None]
    r = jnp.where(m, r, 0.0)
    # zero out frozen parameter columns
    free = problem.param_free[problem.cam_idx].astype(r.dtype)  # (N,9)
    Jc = jnp.where(m[..., None], Jc, 0.0) * free[:, None, :]
    Jp = jnp.where(m[..., None], Jp, 0.0)
    w_obs, cost_obs = robust_weights_and_cost((r**2).ravel(), loss, f_scale)
    w_obs = w_obs.reshape(r.shape)
    rq, qidx, Jq, cost_con = _constraint_blocks(problem, X, r.dtype)
    return r, w_obs, Jc, Jp, rq, qidx, Jq, cost_obs + cost_con


# ---------------------------------------------------------------------------
# Obs-minor sparse path (single placement)
#
# Round-5 finding (v5e, canonical scale): the row-major sparse tensors
# (N, 2, 9) / (N, 2, 3) are physically tiled (8, 128) over their MINOR dims,
# inflating every read/write ~14-57x; the whole unbaked sparse iteration
# measured 83 ms of which ~29 ms was the blocks stage alone. This path keeps
# every per-observation tensor OBS-MINOR — r (2, N), Jc (2, 9, N),
# Jp (2, 3, N), d_p (3, 3, P) — so the long axis rides the 128-lane tile dim
# exactly like the dense layout's point-minor storage. Per-observation math
# is flat (N,)-lane arithmetic (ops/reprojection.py::observation_blocks_
# obs_minor); point reductions are ONE sorted segment_sum of an (N, 12)
# payload; the Schur coupling lands directly in the dense path's point-minor
# (C, 9, 3, P) layout so the explicit-Schur solve SHARES the dense code.
# Unbaked full iteration: 83 -> ~13 ms. Used when mesh is None (the sharded
# sparse path keeps the row-major layout whose leading axis GSPMD shards).
# ---------------------------------------------------------------------------


def _free_t(problem, ci, dt):
    """Per-observation free-parameter mask, obs-minor (9, N)."""
    return jnp.stack([problem.param_free[:, k].astype(dt)[ci] for k in range(N_CAM_PARAMS)])


def _masked_blocks_obs_minor(problem: BAProblem, cam9, X, loss: str, f_scale: float):
    """Obs-minor residuals/weights/blocks: r (2,N), w (2,N), Jc (2,9,N),
    Jp (2,3,N)."""
    uv_t = problem.uv.T  # loop-invariant: XLA hoists it out of the LM loop
    r, Jc, Jp = observation_blocks_obs_minor(
        cam9, X, problem.cam_idx, problem.pt_idx, uv_t,
        problem.K0, problem.dist0, problem.fisheye, problem.inv_fx,
        problem.any_fisheye,
    )
    m = problem.obs_mask[None, :]  # (1,N)
    r = jnp.where(m, r, 0.0)
    free = _free_t(problem, problem.cam_idx, r.dtype)  # (9,N)
    Jc = jnp.where(m[:, None, :], Jc, 0.0) * free[None, :, :]
    Jp = jnp.where(m[:, None, :], Jp, 0.0)
    w_obs, cost_obs = robust_weights_and_cost((r**2).reshape(-1), loss, f_scale)
    w_obs = w_obs.reshape(r.shape)
    rq, qidx, Jq, cost_con = _constraint_blocks(problem, X, r.dtype)
    return r, w_obs, Jc, Jp, rq, qidx, Jq, cost_obs + cost_con


def _cost_only_obs_minor(problem: BAProblem, cam9, X, loss: str, f_scale: float):
    r = observation_residuals_obs_minor(
        cam9, X, problem.cam_idx, problem.pt_idx, problem.uv.T,
        problem.K0, problem.dist0, problem.fisheye, problem.inv_fx,
        problem.any_fisheye,
    )
    r = jnp.where(problem.obs_mask[None, :], r, 0.0)
    _, cost_obs = robust_weights_and_cost((r**2).reshape(-1), loss, f_scale)
    if problem.n_constraints:
        rq = constraint_residuals(
            X, problem.con_pa_idx, problem.con_pa_w, problem.con_pb_idx,
            problem.con_pb_w, problem.con_target, problem.con_weight,
        )
        return cost_obs + 0.5 * jnp.sum(rq**2)
    return cost_obs


def _constraint_grad_diag_pminor(problem, qidx, Jq, rq, g_p, d_p_t):
    """Constraint folds + unobserved-point pinning for the obs-minor path
    (d_p carried point-minor (3,3,P); g_p stays (P,3))."""
    if problem.n_constraints:
        flat_idx = qidx.reshape(-1)
        g_p = g_p.at[flat_idx].add((Jq * rq[:, None, None]).reshape(-1, 3))
        dq = jnp.einsum("qki,qkj->qkij", Jq, Jq).reshape(-1, 3, 3)
        d_p_t = d_p_t.at[:, :, flat_idx].add(dq.transpose(1, 2, 0))
    pinned = (d_p_t[0, 0] + d_p_t[1, 1] + d_p_t[2, 2]) == 0
    d_p_t = d_p_t + pinned[None, None, :] * jnp.eye(3, dtype=d_p_t.dtype)[:, :, None]
    return g_p, d_p_t


def _gradient_and_diag_obs_minor(problem, w, r, Jc, Jp, rq, qidx, Jq, n_points):
    """g/diag from obs-minor blocks. Returns (g_c (C,9), g_p (P,3),
    d_c (C,9,9), d_p_t (3,3,P))."""
    C = problem.n_cameras
    dt = r.dtype
    wr = w * r  # (2,N)
    OC = (problem.cam_idx[None, :] == jnp.arange(C, dtype=problem.cam_idx.dtype)[:, None]).astype(dt)  # (C,N)
    t9 = Jc[0] * wr[0][None, :] + Jc[1] * wr[1][None, :]  # (9,N)
    g_c = jax.lax.dot_general(t9, OC, (((1,), (1,)), ((), ())), preferred_element_type=dt).T  # (C,9)
    U0 = Jc[0] * w[0][None, :]
    U1 = Jc[1] * w[1][None, :]
    d_c = jax.lax.dot_general(U0 * OC[:, None, :], Jc[0], (((2,), (1,)), ((), ())), preferred_element_type=dt) + \
        jax.lax.dot_general(U1 * OC[:, None, :], Jc[1], (((2,), (1,)), ((), ())), preferred_element_type=dt)  # (C,9,9)
    gp_t = Jp[0] * wr[0][None, :] + Jp[1] * wr[1][None, :]  # (3,N)
    dp_rows = [
        Jp[0, i] * w[0] * Jp[0, j] + Jp[1, i] * w[1] * Jp[1, j]
        for i in range(3)
        for j in range(3)
    ]
    payload = jnp.concatenate([gp_t, jnp.stack(dp_rows)]).T  # (N,12)
    seg = jax.ops.segment_sum(payload, problem.pt_idx, n_points, indices_are_sorted=True)  # (P,12)
    g_p = seg[:, :3]
    d_p_t = seg[:, 3:].T.reshape(3, 3, n_points)
    g_p, d_p_t = _constraint_grad_diag_pminor(problem, qidx, Jq, rq, g_p, d_p_t)
    return g_c, g_p, d_c, d_p_t


def _hessian_matvec_obs_minor(problem, w, Jc, Jp, qidx, Jq, vc, vp):
    """(H v) from obs-minor blocks."""
    C = problem.n_cameras
    P = vp.shape[0]
    dt = vc.dtype
    ci, pi = problem.cam_idx, problem.pt_idx
    vcg = [vc[:, i][ci] for i in range(N_CAM_PARAMS)]  # 9 x (N,)
    vpg = [vp[:, k][pi] for k in range(3)]
    Jv = [
        sum(Jc[rr, i] * vcg[i] for i in range(N_CAM_PARAMS))
        + sum(Jp[rr, k] * vpg[k] for k in range(3))
        for rr in range(2)
    ]
    wJv = [w[rr] * Jv[rr] for rr in range(2)]
    OC = (ci[None, :] == jnp.arange(C, dtype=ci.dtype)[:, None]).astype(dt)  # (C,N)
    tc = jnp.stack([sum(Jc[rr, i] * wJv[rr] for rr in range(2)) for i in range(N_CAM_PARAMS)])  # (9,N)
    out_c = jax.lax.dot_general(tc, OC, (((1,), (1,)), ((), ())), preferred_element_type=dt).T
    tp = jnp.stack([sum(Jp[rr, k] * wJv[rr] for rr in range(2)) for k in range(3)]).T  # (N,3)
    out_p = jax.ops.segment_sum(tp, pi, P, indices_are_sorted=True)
    if problem.n_constraints:
        zq = jnp.einsum("qkj,qkj->q", Jq, vp[qidx])
        out_p = out_p.at[qidx.reshape(-1)].add((Jq * zq[:, None, None]).reshape(-1, 3))
    return out_c, out_p


def _schur_factors_obs_minor(problem, w, Jc, Jp, g_c, g_p, d_c, d_p_t, lam):
    """Schur factors from obs-minor blocks, emitted in the dense path's
    POINT-MINOR layout (G (C,9,3,P), Hpp_inv (3,3,P)) so _schur_apply's
    pminor branch is shared."""
    C = problem.n_cameras
    P = g_p.shape[0]
    dt = g_c.dtype
    free_c = problem.param_free.astype(dt)
    A_cc = _damped_A_cc(problem, d_c, lam)
    # coupling: 27 lane rows -> ONE sorted segment_sum keyed (pt*C + cam)
    # (make_problem's row order keeps it sorted) -> point-minor transpose
    g_rows = [
        Jc[0, i] * w[0] * Jp[0, k] + Jc[1, i] * w[1] * Jp[1, k]
        for i in range(N_CAM_PARAMS)
        for k in range(3)
    ]
    seg_pc = problem.pt_idx.astype(jnp.int32) * C + problem.cam_idx.astype(jnp.int32)
    Gseg = jax.ops.segment_sum(jnp.stack(g_rows).T, seg_pc, C * P, indices_are_sorted=True)  # (P*C,27)
    G = Gseg.reshape(P, C, N_CAM_PARAMS, 3).transpose(1, 2, 3, 0)  # (C,9,3,P)
    diag_t = jnp.maximum(jnp.stack([d_p_t[0, 0], d_p_t[1, 1], d_p_t[2, 2]]), 1e-12)
    eye_t = jnp.eye(3, dtype=dt)[:, :, None]
    Hpp_t = d_p_t + lam * diag_t[:, None, :] * eye_t + 1e-12 * eye_t
    Hpp_inv_t = _inv3x3_pminor(Hpp_t)
    Y = jnp.stack(
        [sum(G[:, :, j, :] * Hpp_inv_t[j, k][None, None, :] for j in range(3)) for k in range(3)],
        axis=2,
    )  # (C,9,3,P)
    n_cp = C * N_CAM_PARAMS
    S = -jax.lax.dot_general(
        Y.reshape(n_cp, -1), G.reshape(n_cp, -1), (((1,), (1,)), ((), ())),
        preferred_element_type=dt,
    )
    S = S.reshape(C, N_CAM_PARAMS, C, N_CAM_PARAMS)
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(A_cc)
    S = S.reshape(n_cp, n_cp)
    return jax.scipy.linalg.cho_factor(S), G, Y, Hpp_inv_t, free_c


def _cost_only(problem, cam9, X, loss: str, f_scale: float, obs_minor: bool = False):
    if obs_minor and not isinstance(problem, BADenseProblem):
        return _cost_only_obs_minor(problem, cam9, X, loss, f_scale)
    if isinstance(problem, BADenseProblem):
        r = dense_observation_residuals(
            cam9, X, problem.uv, problem.K0, problem.dist0,
            problem.fisheye, problem.inv_fx, problem.any_fisheye,
        )  # (C,2,P)
        r = jnp.where(problem.obs_mask[:, None, :], r, 0.0)
        _, cost_obs = robust_weights_and_cost((r**2).reshape(-1), loss, f_scale)
        if problem.n_constraints:
            rq = constraint_residuals(
                X, problem.con_pa_idx, problem.con_pa_w, problem.con_pb_idx,
                problem.con_pb_w, problem.con_target, problem.con_weight,
            )
            return cost_obs + 0.5 * jnp.sum(rq**2)
        return cost_obs
    r = observation_residuals(
        cam9, X, problem.cam_idx, problem.pt_idx, problem.uv,
        problem.K0, problem.dist0, problem.fisheye, problem.inv_fx,
        problem.any_fisheye,
    )
    r = jnp.where(problem.obs_mask[:, None], r, 0.0)
    _, cost_obs = robust_weights_and_cost((r**2).ravel(), loss, f_scale)
    if problem.n_constraints:
        rq = constraint_residuals(
            X, problem.con_pa_idx, problem.con_pa_w, problem.con_pb_idx,
            problem.con_pb_w, problem.con_target, problem.con_weight,
        )
        return cost_obs + 0.5 * jnp.sum(rq**2)
    return cost_obs


def _constraint_grad_diag(problem, qidx, Jq, rq, g_p, d_p):
    """Fold constraint rows into the point gradient/diagonal, then pin
    fully-unobserved point blocks with the identity (their gradient is zero,
    so their update stays exactly zero)."""
    if problem.n_constraints:
        flat_idx = qidx.reshape(-1)
        g_p = g_p.at[flat_idx].add((Jq * rq[:, None, None]).reshape(-1, 3))
        dq = jnp.einsum("qki,qkj->qkij", Jq, Jq).reshape(-1, 3, 3)
        d_p = d_p.at[flat_idx].add(dq)
    pinned = jnp.einsum("pii->p", d_p) == 0
    d_p = d_p + pinned[:, None, None] * jnp.eye(3, dtype=d_p.dtype)
    return g_p, d_p


def _gradient_and_diag_dense(problem, w, r, Jc, Jp, rq, qidx, Jq, mesh=None):
    """Dense-layout g = J^T W r and diag(J^T W J): the camera and point
    reductions are plain einsums over the dense grid — the slot position IS
    the index, so there is no one-hot expansion and no segment scatter.
    Inputs are POINT-MINOR (r (C,2,P), Jc (C,2,9,P), Jp (C,2,3,P)) so every
    contraction reduces over (or is elementwise along) the lane axis; the
    small per-point outputs are transposed back to the solver-wide (P,3) /
    (P,3,3) contract (sub-MB arrays). Two-operand staging throughout
    (multi-operand einsum contraction order is XLA's to botch)."""
    wr = w * r  # (C,2,P)
    U = Jc * w[:, :, None, :]  # (C,2,9,P)
    g_c = jnp.einsum("crip,crp->ci", Jc, wr)
    d_c = jnp.einsum("crip,crjp->cij", U, Jc)
    Up = Jp * w[:, :, None, :]  # (C,2,3,P)
    g_p = _pshard(jnp.einsum("crip,crp->pi", Jp, wr), mesh, "obs")  # (P,3)
    d_p = _pshard(jnp.einsum("crip,crjp->pij", Up, Jp), mesh, "obs")  # (P,3,3)
    g_p, d_p = _constraint_grad_diag(problem, qidx, Jq, rq, g_p, d_p)
    return g_c, g_p, d_c, d_p


def _gradient_and_diag(problem, w, r, Jc, Jp, rq, qidx, Jq, n_points, mesh=None, obs_minor: bool = False):
    """g = J^T W r and diag(J^T W J).

    Camera-side reductions go through a one-hot matmul instead of
    segment_sum: with a handful of cameras the (2N, C) one-hot is tiny and
    the contraction rides the MXU, where a scatter-style segment reduction
    materializes the (N,9,9) outer products through HBM. Point-side
    reductions (n_points segments) stay as segment sums.

    NOTE the obs-minor path returns d_p POINT-MINOR (3,3,P), not (P,3,3).
    """
    if isinstance(problem, BADenseProblem):
        return _gradient_and_diag_dense(problem, w, r, Jc, Jp, rq, qidx, Jq, mesh)
    if obs_minor:
        return _gradient_and_diag_obs_minor(problem, w, r, Jc, Jp, rq, qidx, Jq, n_points)
    C = problem.n_cameras
    wr = w * r  # (N,2)
    # (2N, C) one-hot over flattened residual rows; explicit matmul staging
    # (never a multi-operand einsum, whose contraction order XLA may botch)
    O = jnp.repeat(jax.nn.one_hot(problem.cam_idx, C, dtype=w.dtype), 2, axis=0)  # (2N,C)
    B = Jc.reshape(-1, Jc.shape[-1])  # (2N,9)
    U = (Jc * w[..., None]).reshape(-1, Jc.shape[-1])  # (2N,9) weighted
    g_c = O.T @ (Jc * wr[..., None]).reshape(-1, Jc.shape[-1])  # (C,9)
    UB = jnp.einsum("ra,rb->rab", U, B).reshape(B.shape[0], -1)  # (2N,81)
    d_c = (O.T @ UB).reshape(C, Jc.shape[-1], Jc.shape[-1])
    # point side: ONE fused segment_sum with a 12-float payload (g_p | d_p)
    # instead of two scatter passes — halves the pt-side reduction time
    payload = jnp.concatenate(
        [
            jnp.einsum("nij,ni->nj", Jp, wr),
            jnp.einsum("nij,ni,nik->njk", Jp, w, Jp).reshape(-1, 9),
        ],
        axis=1,
    )
    gp_dp = _pshard(
        jax.ops.segment_sum(payload, problem.pt_idx, n_points, indices_are_sorted=True), mesh, "obs"
    )
    g_p = gp_dp[:, :3]
    d_p = gp_dp[:, 3:].reshape(-1, 3, 3)
    g_p, d_p = _constraint_grad_diag(problem, qidx, Jq, rq, g_p, d_p)
    return g_c, g_p, d_c, d_p


def _hessian_matvec(problem, w, Jc, Jp, qidx, Jq, vc, vp):
    """(H v) for H = J^T W J, matrix-free via the per-row blocks."""
    if isinstance(problem, BADenseProblem):
        # point-minor blocks: Jc (C,2,9,P), Jp (C,2,3,P)
        Jv = jnp.einsum("crip,ci->crp", Jc, vc) + jnp.einsum("crip,pi->crp", Jp, vp)
        wJv = w * Jv
        out_c = jnp.einsum("crip,crp->ci", Jc, wJv)
        out_p = jnp.einsum("crip,crp->pi", Jp, wJv)
        if problem.n_constraints:
            zq = jnp.einsum("qkj,qkj->q", Jq, vp[qidx])
            out_p = out_p.at[qidx.reshape(-1)].add((Jq * zq[:, None, None]).reshape(-1, 3))
        return out_c, out_p
    C = problem.n_cameras
    P = vp.shape[0]
    Jv = jnp.einsum("nij,nj->ni", Jc, vc[problem.cam_idx]) + jnp.einsum(
        "nij,nj->ni", Jp, vp[problem.pt_idx]
    )
    wJv = w * Jv
    out_c = jax.ops.segment_sum(jnp.einsum("nij,ni->nj", Jc, wJv), problem.cam_idx, C)
    out_p = jax.ops.segment_sum(jnp.einsum("nij,ni->nj", Jp, wJv), problem.pt_idx, P, indices_are_sorted=True)
    if problem.n_constraints:
        zq = jnp.einsum("qkj,qkj->q", Jq, vp[qidx])
        out_p = out_p.at[qidx.reshape(-1)].add((Jq * zq[:, None, None]).reshape(-1, 3))
    return out_c, out_p


# ---------------------------------------------------------------------------
# Linear solvers for (H + lam * D) dx = -g
# ---------------------------------------------------------------------------


def _solve_dense(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, obs_minor: bool = False):
    """Assemble the full damped normal system and Cholesky-solve it.

    Exact (matches scipy's subproblem solutions closely); right for
    calibration-scale problems. Dim = 9C + 3P.
    """
    C, P = problem.n_cameras, g_p.shape[0]
    if obs_minor and not isinstance(problem, BADenseProblem):
        # small problems only: transpose the obs-minor blocks back to the
        # row layout this exact assembly consumes (d_p arrives (3,3,P))
        w = w.T
        Jc = Jc.transpose(2, 0, 1)
        Jp = Jp.transpose(2, 0, 1)
        d_p = d_p.transpose(2, 0, 1)
    if isinstance(problem, BADenseProblem):
        # flatten the point-minor (C,2,*,P) blocks to sparse-style rows with
        # iota indices; the scatter assembly below is layout-agnostic from
        # here on (small problems only — transposes are irrelevant here)
        Cg, Pg = problem.obs_mask.shape
        cam_idx_rows = jnp.tile(jnp.arange(Cg, dtype=jnp.int32), Pg)
        pt_idx_rows = jnp.repeat(jnp.arange(Pg, dtype=jnp.int32), Cg)
        w = w.transpose(2, 0, 1).reshape(Pg * Cg, 2)
        Jc = Jc.transpose(3, 0, 1, 2).reshape(Pg * Cg, 2, N_CAM_PARAMS)
        Jp = Jp.transpose(3, 0, 1, 2).reshape(Pg * Cg, 2, 3)
    else:
        cam_idx_rows = problem.cam_idx
        pt_idx_rows = problem.pt_idx
    dim = N_CAM_PARAMS * C + 3 * P
    dt = g_c.dtype
    H = jnp.zeros((dim, dim), dt)

    # camera-camera diagonal blocks
    cam_off = cam_idx_rows * N_CAM_PARAMS
    pt_off = N_CAM_PARAMS * C + pt_idx_rows * 3
    ci = cam_off[:, None] + jnp.arange(N_CAM_PARAMS)[None, :]  # (N,9)
    pi = pt_off[:, None] + jnp.arange(3)[None, :]  # (N,3)

    Hcc = jnp.einsum("nij,ni,nik->njk", Jc, w, Jc)  # (N,9,9)
    Hpp = jnp.einsum("nij,ni,nik->njk", Jp, w, Jp)  # (N,3,3)
    Hcp = jnp.einsum("nij,ni,nik->njk", Jc, w, Jp)  # (N,9,3)
    H = H.at[ci[:, :, None], ci[:, None, :]].add(Hcc)
    H = H.at[pi[:, :, None], pi[:, None, :]].add(Hpp)
    H = H.at[ci[:, :, None], pi[:, None, :]].add(Hcp)
    H = H.at[pi[:, :, None], ci[:, None, :]].add(jnp.swapaxes(Hcp, 1, 2))

    if problem.n_constraints:
        qi = (N_CAM_PARAMS * C + qidx * 3)[:, :, None] + jnp.arange(3)[None, None, :]  # (Q,8,3)
        qflat = qi.reshape(qi.shape[0], 24)
        Jqf = Jq.reshape(Jq.shape[0], 24)
        Hqq = jnp.einsum("qi,qj->qij", Jqf, Jqf)
        H = H.at[qflat[:, :, None], qflat[:, None, :]].add(Hqq)

    D = jnp.concatenate([
        jnp.maximum(jax.vmap(jnp.diag)(d_c).reshape(-1), 1e-12),
        jnp.maximum(jax.vmap(jnp.diag)(d_p).reshape(-1), 1e-12),
    ])
    # frozen params: keep the system nonsingular
    free_flat = jnp.concatenate([
        problem.param_free.reshape(-1),
        jnp.ones(3 * P, bool),
    ])
    A = H + jnp.diag(lam * D + jnp.where(free_flat, 0.0, 1.0))
    b = -jnp.concatenate([g_c.reshape(-1), g_p.reshape(-1)])
    dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(A), b)
    dx = jnp.where(free_flat, dx, 0.0)
    return dx[: N_CAM_PARAMS * C].reshape(C, N_CAM_PARAMS), dx[N_CAM_PARAMS * C :].reshape(P, 3)


def _inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate / det).

    jnp.linalg.inv lowers to batched LU on TPU, which costs ~30 ms for the
    35k point blocks of a real session — the single largest piece of an LM
    iteration. The cofactor expansion is pure elementwise VPU work (~1 ms).
    Callers pass damped SPD blocks, so det > 0 and no pivoting is needed.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c11 = e * i - f * h
    c12 = c * h - b * i
    c13 = b * f - c * e
    c21 = f * g - d * i
    c22 = a * i - c * g
    c23 = c * d - a * f
    c31 = d * h - e * g
    c32 = b * g - a * h
    c33 = a * e - b * d
    det = a * c11 + b * c21 + c * c31
    inv_det = 1.0 / det
    rows = jnp.stack(
        [
            jnp.stack([c11, c12, c13], axis=-1),
            jnp.stack([c21, c22, c23], axis=-1),
            jnp.stack([c31, c32, c33], axis=-1),
        ],
        axis=-2,
    )
    return rows * inv_det[..., None, None]


def _inv3x3_pminor(A):
    """Closed-form symmetric-3x3 inverse in the POINT-MINOR (3, 3, P)
    layout: every term is an elementwise op over the P lane axis (the
    (P, 3, 3) form of _inv3x3 runs at 9/1024 tile occupancy)."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e = A[1, 1], A[1, 2]
    f = A[2, 2]
    c00 = d * f - e * e
    c01 = c * e - b * f
    c02 = b * e - c * d
    c11 = a * f - c * c
    c12 = b * c - a * e
    c22 = a * d - b * b
    inv_det = 1.0 / (a * c00 + b * c01 + c * c02)
    rows = jnp.stack(
        [jnp.stack([c00, c01, c02]), jnp.stack([c01, c11, c12]), jnp.stack([c02, c12, c22])]
    )
    return rows * inv_det


def _damped_A_cc(problem, d_c, lam):
    """Damped camera block A_cc = d_c + diag(lam * diag(d_c) + frozen-row
    regularization). ONE definition — the explicit Schur factors, the
    implicit Schur CG, and the Pallas-assembled path must solve the same
    damped system."""
    diag_c = jnp.maximum(jax.vmap(jnp.diag)(d_c), 1e-12)
    return d_c + jax.vmap(jnp.diag)(lam * diag_c + jnp.where(problem.param_free, 0.0, 1.0))


def _pminor_backsub(Hpp_inv_t, bp_corr_t):
    """dxp = Hpp^-1 bp_corr in point-minor (3, P) layout -> (P, 3)."""
    return sum(Hpp_inv_t[:, j] * bp_corr_t[j][None, :] for j in range(3)).T


def _pminor_hpp_inv(problem, w, Jp, d_p, lam, dt, mesh):
    """Damped inverse point blocks in POINT-MINOR (3, 3, P) layout, shared
    by the explicit and implicit dense Schur paths.

    The (P, 3, 3) layout's minor (3, 3) dims occupy 9/1024 of each TPU
    tile; this chain (Hpp build + closed-form inverse) in that layout was
    ~10 of the 13 ms fused iteration (tools/profile_dense_fused.py).
    Reprojection-only problems recompute d_p from the blocks directly in
    point-minor form (fused, ~free); constrained problems must keep the
    caller's d_p — it carries the constraint folds — and pay one small
    transpose. Pinning/damping/floors must match _solve_dense/_solve_cg's
    (P, 3, 3) forms exactly.
    """
    if problem.n_constraints == 0:
        Up = Jp * w[:, :, None, :]
        d_p_t = jnp.einsum("crip,crjp->ijp", Up, Jp)  # (3,3,P)
        pinned = (d_p_t[0, 0] + d_p_t[1, 1] + d_p_t[2, 2]) == 0
        d_p_t = d_p_t + pinned[None, None, :] * jnp.eye(3, dtype=dt)[:, :, None]
    else:
        d_p_t = d_p.transpose(1, 2, 0)
    diag_p_t = jnp.maximum(jnp.stack([d_p_t[0, 0], d_p_t[1, 1], d_p_t[2, 2]]), 1e-12)
    eye_t = jnp.eye(3, dtype=dt)[:, :, None]
    Hpp_t = d_p_t + lam * diag_p_t[:, None, :] * eye_t + 1e-12 * eye_t
    return _pshard(_inv3x3_pminor(Hpp_t), mesh, None, None, "obs")


def _schur_factors(problem, w, Jc, Jp, g_c, g_p, d_c, d_p, lam, mesh=None):
    """Build the damped Schur system over cameras.

    Reprojection structure: each observation couples ONE camera block (9) and
    ONE point block (3), so H = [[A, G], [G^T, Hpp]] with Hpp block-diagonal.
    Eliminating points gives S = A - G Hpp^-1 G^T (9C x 9C, tiny) — the
    classic SBA reduction, built here with one scatter-add of per-observation
    W blocks and two MXU einsums (no sparse structures).
    """
    C, P = problem.n_cameras, g_p.shape[0]
    dt = g_c.dtype
    free_c = problem.param_free.astype(dt)
    A_cc = _damped_A_cc(problem, d_c, lam)

    if isinstance(problem, BADenseProblem):
        # the coupling tensor IS the per-slot product — no segment sum at
        # all. Point-minor blocks (C,2,9,P)/(C,2,3,P) -> G (C,9,3,P): the
        # contraction is over the tiny residual axis, elementwise along
        # lanes, and the downstream Y/S einsums keep P minormost.
        U = Jc * w[:, :, None, :]  # (C,2,9,P)
        G = _pshard(jnp.einsum("crip,crkp->cikp", U, Jp), mesh, None, None, None, "obs")
        Hpp_inv_t = _pminor_hpp_inv(problem, w, Jp, d_p, lam, dt, mesh)
        # Y and S with hand-staged lowerings: the einsum forms
        # ("cijp,jkp->cikp", "cikp,djkp->cidj") measured 5.7 ms on the v5e —
        # XLA stages them through transposed batched matmuls. The unrolled
        # j-sum is 9 lane-wise madds, and S is ONE (72, 3P) x (3P, 72)
        # dot_general straight onto the MXU (the reshape is contiguous:
        # (c,i) major, (k,p) minor). Together: 1.45 ms.
        Y = jnp.stack(
            [sum(G[:, :, j, :] * Hpp_inv_t[j, k][None, None, :] for j in range(3)) for k in range(3)],
            axis=2,
        )  # (C,9,3,P)
        n_cp = C * N_CAM_PARAMS
        if mesh is None:
            # single placement: ONE contiguous (72, 3P) x (3P, 72)
            # dot_general straight onto the MXU
            S = -jax.lax.dot_general(
                Y.reshape(n_cp, -1), G.reshape(n_cp, -1),
                (((1,), (1,)), ((), ())), preferred_element_type=dt,
            )
        else:
            # mesh: THREE (72, P) x (P, 72) dot_generals (one per k) — the
            # merged (k, p) reshape interleaves the sharded point axis with
            # an unsharded one, a layout GSPMD cannot express, and it
            # all-gathered both 31 MB tensors per iteration (measured: the
            # 8-device retention metric collapsed 209% -> 40%)
            S = -sum(
                jax.lax.dot_general(
                    Y[:, :, k, :].reshape(n_cp, -1), G[:, :, k, :].reshape(n_cp, -1),
                    (((1,), (1,)), ((), ())), preferred_element_type=dt,
                )
                for k in range(3)
            )
        S = S.reshape(C, N_CAM_PARAMS, C, N_CAM_PARAMS)
        S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(A_cc)
        S = S.reshape(n_cp, n_cp)
        S_cho = jax.scipy.linalg.cho_factor(S)
        return S_cho, G, Y, Hpp_inv_t, free_c
    else:
        diag_p = jnp.maximum(jax.vmap(jnp.diag)(d_p), 1e-12)
        Hpp = d_p + jax.vmap(jnp.diag)(lam * diag_p) + 1e-12 * jnp.eye(3, dtype=dt)
        Hpp_inv = _pshard(_inv3x3(Hpp), mesh, "obs")
        W_blocks = jnp.einsum("nij,ni,nik->njk", Jc, w, Jp)  # (N,9,3)
        # flat segment_sum instead of .at[].add: XLA's sorted-segment lowering
        # is ~4x faster than 2-D scatter-add for this shape on TPU. The key is
        # PT-MAJOR so make_problem's (pt, cam) row order keeps it sorted; the
        # (P, C, ...) result is transposed to the (C, P, ...) block layout the
        # einsums below consume (a layout change XLA folds into them).
        seg = problem.pt_idx.astype(jnp.int32) * C + problem.cam_idx.astype(jnp.int32)
        G = jax.ops.segment_sum(
            W_blocks.reshape(-1, N_CAM_PARAMS * 3), seg, C * P, indices_are_sorted=True
        )
        G = _pshard(G.reshape(P, C, N_CAM_PARAMS, 3).transpose(1, 0, 2, 3), mesh, None, "obs")
    Y = jnp.einsum("cpij,pjk->cpik", G, Hpp_inv)  # (C,P,9,3)
    S = -jnp.einsum("cpik,dpjk->cidj", Y, G)  # (C,9,C,9)
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(A_cc)
    S = S.reshape(C * N_CAM_PARAMS, C * N_CAM_PARAMS)
    S_cho = jax.scipy.linalg.cho_factor(S)
    return S_cho, G, Y, Hpp_inv, free_c


def _schur_apply(S_cho, G, Y, Hpp_inv, free_c, bc, bp, pminor: bool = False):
    """Solve the damped reprojection normal system given Schur factors.

    pminor: G/Y are the dense layout's point-minor (C,9,3,P) tensors and
    Hpp_inv is (3,3,P) (sparse layout passes (C,P,9,3) and (P,3,3))."""
    C = bc.shape[0]
    if pminor:
        bp_t = bp.T  # (3,P)
        n_cp = Y.shape[0] * Y.shape[1]
        # per-k staging, same rationale as the S build: never reshape the
        # sharded point axis into a merged dim
        rhs_c = bc.reshape(-1) - sum(
            Y[:, :, k, :].reshape(n_cp, -1) @ bp_t[k] for k in range(3)
        )
        dxc = jax.scipy.linalg.cho_solve(S_cho, rhs_c).reshape(C, N_CAM_PARAMS)
        dxc = dxc * free_c
        bp_corr = bp_t - jnp.stack(
            [dxc.reshape(-1) @ G[:, :, k, :].reshape(n_cp, -1) for k in range(3)]
        )
        return dxc, _pminor_backsub(Hpp_inv, bp_corr)
    rhs_c = bc - jnp.einsum("cpik,pk->ci", Y, bp)
    dxc = jax.scipy.linalg.cho_solve(S_cho, rhs_c.reshape(-1)).reshape(C, N_CAM_PARAMS)
    dxc = dxc * free_c
    bp_corr = bp - jnp.einsum("cpij,ci->pj", G, dxc)
    dxp = jnp.einsum("pij,pj->pi", Hpp_inv, bp_corr)
    return dxc, dxp



def _solve_schur_cg(problem, w, Jc, Jp, g_c, g_p, d_c, d_p, lam, tol, max_iter, mesh=None, obs_minor: bool = False):
    """Implicit (matrix-free) Schur-complement CG on the REDUCED camera
    system: solve S dxc = b with S = A - G Hpp^-1 G^T, where every S-product
    is two passes over the observation axis — the coupling tensor G
    (C, P, 9, 3) is never materialized.

    This removes the explicit Schur solver's C*P memory ceiling (1 GiB at
    ~8 cams x 4M points) while converging like Schur, not like full-system
    CG: the reduced system is 9C-dimensional with an exact per-camera block
    preconditioner, so a handful of iterations suffice (the full-system CG
    at the canonical scale costs 17x the explicit Schur solve; this path
    costs ~2 matvecs-worth more). Reprojection-only (block-diagonal Hpp);
    constrained problems keep the explicit-Schur / full-CG paths.
    """
    C = problem.n_cameras
    dt = g_c.dtype
    free_c = problem.param_free.astype(dt)
    diag_c = jnp.maximum(jax.vmap(jnp.diag)(d_c), 1e-12)
    if not (obs_minor and not isinstance(problem, BADenseProblem)):
        diag_p = jnp.maximum(jax.vmap(jnp.diag)(d_p), 1e-12)
    A_cc = _damped_A_cc(problem, d_c, lam)
    A_inv = jnp.linalg.inv(A_cc)  # (C,9,9) exact block preconditioner
    P_pts = g_p.shape[0]

    if isinstance(problem, BADenseProblem):
        # point-minor blocks: Jc (C,2,9,P), Jp (C,2,3,P); Hpp lives (3,3,P)
        # (shared helper with the explicit Schur path)
        Hpp_inv_t = _pminor_hpp_inv(problem, w, Jp, d_p, lam, dt, mesh)

        def Hpp_inv_apply(vp):  # (P,3) -> (P,3)
            vt = vp.T
            return sum(Hpp_inv_t[:, j] * vt[j][None, :] for j in range(3)).T

        def G_T(vc):
            """G^T v: (C,9) -> (P,3), dense einsums."""
            t = w * jnp.einsum("crjp,cj->crp", Jc, vc)
            return _pshard(jnp.einsum("crjp,crp->pj", Jp, t), mesh, "obs")

        def G(vp):
            """G v: (P,3) -> (C,9), dense einsums."""
            a = w * jnp.einsum("crjp,pj->crp", Jp, vp)
            return jnp.einsum("crjp,crp->cj", Jc, a)

    elif obs_minor:
        # obs-minor blocks: Jc (2,9,N), Jp (2,3,N); d_p POINT-MINOR (3,3,P)
        diag_p_t = jnp.maximum(jnp.stack([d_p[0, 0], d_p[1, 1], d_p[2, 2]]), 1e-12)
        eye_t = jnp.eye(3, dtype=dt)[:, :, None]
        Hpp_t = d_p + lam * diag_p_t[:, None, :] * eye_t + 1e-12 * eye_t
        Hpp_inv_t = _inv3x3_pminor(Hpp_t)
        ci, pi = problem.cam_idx, problem.pt_idx
        OC = (ci[None, :] == jnp.arange(C, dtype=ci.dtype)[:, None]).astype(dt)  # (C,N)

        def Hpp_inv_apply(vp):
            vt = vp.T
            return sum(Hpp_inv_t[:, j] * vt[j][None, :] for j in range(3)).T

        def G_T(vc):
            vcg = [vc[:, i][ci] for i in range(N_CAM_PARAMS)]
            t = [w[rr] * sum(Jc[rr, i] * vcg[i] for i in range(N_CAM_PARAMS)) for rr in range(2)]
            u = jnp.stack([sum(Jp[rr, k] * t[rr] for rr in range(2)) for k in range(3)]).T  # (N,3)
            return jax.ops.segment_sum(u, pi, P_pts, indices_are_sorted=True)

        def G(vp):
            vpg = [vp[:, k][pi] for k in range(3)]
            a = [w[rr] * sum(Jp[rr, k] * vpg[k] for k in range(3)) for rr in range(2)]
            tc = jnp.stack([sum(Jc[rr, i] * a[rr] for rr in range(2)) for i in range(N_CAM_PARAMS)])  # (9,N)
            return jax.lax.dot_general(tc, OC, (((1,), (1,)), ((), ())), preferred_element_type=dt).T

    else:
        Hpp = d_p + jax.vmap(jnp.diag)(lam * diag_p) + 1e-12 * jnp.eye(3, dtype=dt)
        Hpp_inv = _pshard(_inv3x3(Hpp), mesh, "obs")

        def Hpp_inv_apply(vp):
            return jnp.einsum("pij,pj->pi", Hpp_inv, vp)

        def G_T(vc):
            """G^T v: (C,9) -> (P,3), one obs pass."""
            t = w * jnp.einsum("nij,nj->ni", Jc, vc[problem.cam_idx])  # (N,2)
            u = jax.ops.segment_sum(
                jnp.einsum("nij,ni->nj", Jp, t), problem.pt_idx, P_pts, indices_are_sorted=True
            )
            return _pshard(u, mesh, "obs")

        def G(vp):
            """G v: (P,3) -> (C,9), one obs pass (one-hot matmul on the tiny
            camera axis, same rationale as _gradient_and_diag)."""
            a = w * jnp.einsum("nij,nj->ni", Jp, vp[problem.pt_idx])  # (N,2)
            Oc = jax.nn.one_hot(problem.cam_idx, C, dtype=dt)  # (N,C)
            return Oc.T @ jnp.einsum("nij,ni->nj", Jc, a)

    def S_mv(vc):
        zp = Hpp_inv_apply(G_T(vc))
        return jnp.einsum("cij,cj->ci", A_cc, vc) - G(zp)

    zp0 = Hpp_inv_apply(g_p)
    b = -g_c + G(zp0)
    b = b * free_c

    def M_inv(r):
        return jnp.einsum("cij,cj->ci", A_inv, r)

    def dot(a, bb):
        return jnp.sum(a * bb)

    x = jnp.zeros_like(g_c)
    r = b
    z = M_inv(r)
    p = z
    rz = dot(r, z)
    b_norm2 = dot(b, b)

    def cond(state):
        _x, r, _p, _rz, it = state
        return jnp.logical_and(it < max_iter, dot(r, r) > (tol**2) * b_norm2)

    def body(state):
        x, r, p, rz, it = state
        Sp = S_mv(p) * free_c + (1.0 - free_c) * p
        alpha = rz / jnp.maximum(dot(p, Sp), 1e-30)
        x = x + alpha * p
        r = r - alpha * Sp
        z = M_inv(r)
        rz_new = dot(r, z)
        p = z + rz_new / jnp.maximum(rz, 1e-30) * p
        return x, r, p, rz_new, it + 1

    x, _r, _p, _rz, _it = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))
    dxc = x * free_c
    dxp = Hpp_inv_apply(-g_p - G_T(dxc))
    return dxc, dxp


def _solve_schur(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, cg_tol, cg_max_iter, mesh=None, pallas_ok=None, obs_minor: bool = False):
    """Schur-eliminated solve: exact for the (damped) reprojection system;
    with constraint rows present the Schur solve becomes the preconditioner
    of a short CG on the full system (constraints couple points to points,
    breaking the block-diagonal Hpp — but only as a low-rank-ish correction,
    so CG converges in a handful of iterations).

    pallas_ok: whether the fused Pallas Schur assembly may be used. Pass a
    host-computed bool (lm_solve threads it as a STATIC jit arg so the
    CALISCOPE_TPU_NO_PALLAS_SCHUR kill switch takes effect on the next
    call); None decides at trace time (correct, but a flipped env var then
    needs jax.clear_caches() to bite on already-compiled signatures)."""
    if isinstance(problem, BADenseProblem) and problem.n_constraints == 0:
        from caliscope_tpu.solvers.pallas_schur import pallas_schur_available, schur_s_rhs

        if pallas_ok is None:
            pallas_ok = pallas_schur_available(problem, mesh, problem.n_points, g_c.dtype)
        if pallas_ok:
            # Fused Pallas Schur assembly: S, the reduced rhs, AND the
            # damped point-block inverses straight from the blocks — no
            # (C,9,3,P) coupling tensors in HBM and no XLA-side Hpp pass
            # (which alone measured ~0.9 ms of relayout cost; see
            # solvers/pallas_schur.py; Schur marginal ~3.8 -> ~0.3 ms).
            C = problem.n_cameras
            dt = g_c.dtype
            free_c = problem.param_free.astype(dt)
            bp_t = (-g_p).T  # (3,P)
            S_raw, rhs_raw, Hpp_inv_t = schur_s_rhs(Jc, Jp, w, bp_t, lam)
            S = (-S_raw).reshape(C, N_CAM_PARAMS, C, N_CAM_PARAMS)
            S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(_damped_A_cc(problem, d_c, lam))
            S = S.reshape(C * N_CAM_PARAMS, C * N_CAM_PARAMS)
            rhs_c = (-g_c).reshape(-1) - rhs_raw
            dxc = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), rhs_c)
            dxc = dxc.reshape(C, N_CAM_PARAMS) * free_c
            # bp_corr = bp - G^T dxc, with G^T dxc recomputed fused from the
            # blocks (two lane-wise einsums — cheaper than keeping G)
            tmp = w * jnp.einsum("crip,ci->crp", Jc, dxc)
            gtd = jnp.einsum("crkp,crp->kp", Jp, tmp)  # (3,P)
            return dxc, _pminor_backsub(Hpp_inv_t, bp_t - gtd)

    sparse_obs_minor = obs_minor and not isinstance(problem, BADenseProblem)
    if sparse_obs_minor:
        # d_p arrives POINT-MINOR (3,3,P) here; factors land in the dense
        # path's pminor layout so _schur_apply is shared
        factors = _schur_factors_obs_minor(problem, w, Jc, Jp, g_c, g_p, d_c, d_p, lam)
    else:
        factors = _schur_factors(problem, w, Jc, Jp, g_c, g_p, d_c, d_p, lam, mesh)
    S_cho, G, Y, Hpp_inv, free_c = factors
    pminor = isinstance(problem, BADenseProblem) or sparse_obs_minor
    if problem.n_constraints == 0:
        return _schur_apply(S_cho, G, Y, Hpp_inv, free_c, -g_c, -g_p, pminor)

    diag_c = jnp.maximum(jax.vmap(jnp.diag)(d_c), 1e-12)
    if sparse_obs_minor:
        diag_p = jnp.maximum(jnp.stack([d_p[0, 0], d_p[1, 1], d_p[2, 2]]), 1e-12).T  # (P,3)
    else:
        diag_p = jnp.maximum(jax.vmap(jnp.diag)(d_p), 1e-12)

    def A_mv(vc, vp):
        if sparse_obs_minor:
            hc, hp = _hessian_matvec_obs_minor(problem, w, Jc, Jp, qidx, Jq, vc, vp)
        else:
            hc, hp = _hessian_matvec(problem, w, Jc, Jp, qidx, Jq, vc, vp)
        hc = hc + lam * diag_c * vc + (1.0 - free_c) * vc
        hp = hp + lam * diag_p * vp
        return hc, hp

    def M_inv(rc, rp):
        return _schur_apply(S_cho, G, Y, Hpp_inv, free_c, rc, rp, pminor)

    def dot(a, b):
        return jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1])

    b = (-g_c, -g_p)
    x = (jnp.zeros_like(g_c), jnp.zeros_like(g_p))
    r = b
    z = M_inv(*r)
    p = z
    rz = dot(r, z)
    b_norm2 = dot(b, b)

    def cond(state):
        _x, r, _p, _rz, it = state
        return jnp.logical_and(it < cg_max_iter, dot(r, r) > (cg_tol**2) * b_norm2)

    def body(state):
        x, r, p, rz, it = state
        Ap = A_mv(*p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
        r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
        z = M_inv(*r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = (z[0] + beta * p[0], z[1] + beta * p[1])
        return x, r, p, rz_new, it + 1

    x, _, _, _, _ = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))
    return x[0] * free_c, x[1]


def _solve_cg(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, tol, max_iter, obs_minor: bool = False):
    """Block-Jacobi preconditioned CG on the damped normal equations.

    Matrix-free: each matvec is one pass of gathers + einsums + segment sums
    over the observation axis — exactly the shape XLA shards cleanly when the
    observation arrays are distributed over a mesh (segment sums lower to
    psum over ICI).
    """
    C, P = problem.n_cameras, g_p.shape[0]
    eye9 = jnp.eye(N_CAM_PARAMS, dtype=g_c.dtype)
    eye3 = jnp.eye(3, dtype=g_c.dtype)
    free_c = problem.param_free.astype(g_c.dtype)
    sparse_obs_minor = obs_minor and not isinstance(problem, BADenseProblem)

    diag_c = jax.vmap(jnp.diag)(d_c)
    # damped + frozen-param-regularized block preconditioner
    M_c = d_c + jax.vmap(jnp.diag)(lam * jnp.maximum(diag_c, 1e-12) + jnp.where(problem.param_free, 0.0, 1.0))
    M_c_inv = jnp.linalg.inv(M_c)  # (C,9,9): a handful of blocks, LU is fine
    if sparse_obs_minor:
        # d_p arrives POINT-MINOR (3,3,P)
        diag_p_t = jnp.maximum(jnp.stack([d_p[0, 0], d_p[1, 1], d_p[2, 2]]), 1e-12)
        diag_p = diag_p_t.T  # (P,3)
        eye_t = eye3[:, :, None]
        M_p_inv_t = _inv3x3_pminor(d_p + lam * diag_p_t[:, None, :] * eye_t + 1e-12 * eye_t)

        def M_p_apply(vp):
            vt = vp.T
            return sum(M_p_inv_t[:, j] * vt[j][None, :] for j in range(3)).T

    else:
        diag_p = jax.vmap(jnp.diag)(d_p)
        M_p = d_p + jax.vmap(jnp.diag)(lam * jnp.maximum(diag_p, 1e-12)) + 1e-12 * eye3
        M_p_inv = _inv3x3(M_p)

        def M_p_apply(vp):
            return jnp.einsum("pij,pj->pi", M_p_inv, vp)

    def A_mv(vc, vp):
        if sparse_obs_minor:
            hc, hp = _hessian_matvec_obs_minor(problem, w, Jc, Jp, qidx, Jq, vc, vp)
        else:
            hc, hp = _hessian_matvec(problem, w, Jc, Jp, qidx, Jq, vc, vp)
        # frozen camera params act as identity rows (rhs is zero there)
        hc = hc + lam * jnp.maximum(diag_c, 1e-12) * vc + (1.0 - free_c) * vc
        hp = hp + lam * jnp.maximum(diag_p, 1e-12) * vp
        return hc, hp

    def M_inv(vc, vp):
        return jnp.einsum("cij,cj->ci", M_c_inv, vc), M_p_apply(vp)

    b_c, b_p = -g_c, -g_p

    def dot(a, b):
        return jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1])

    x = (jnp.zeros_like(b_c), jnp.zeros_like(b_p))
    r = (b_c, b_p)
    z = M_inv(*r)
    p = z
    rz = dot(r, z)
    b_norm2 = dot((b_c, b_p), (b_c, b_p))

    def cond(state):
        _x, r, _p, _rz, it = state
        return jnp.logical_and(it < max_iter, dot(r, r) > (tol**2) * b_norm2)

    def body(state):
        x, r, p, rz, it = state
        Ap = A_mv(*p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
        r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
        z = M_inv(*r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = (z[0] + beta * p[0], z[1] + beta * p[1])
        return x, r, p, rz_new, it + 1

    x, _, _, _, _ = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))
    dxc = x[0] * free_c
    return dxc, x[1]


def _predicted_decrease(problem, w, Jp, d_c, d_p, g_c, g_p, dxc, dxp, lam, obs_minor: bool = False):
    """Damped-model predicted cost decrease for the LM gain ratio:
    0.5 * (lam * dx^T D dx - g^T dx) with D = diag(J^T W J) floored.

    The generic path extracts diag(d_p) from the (P,3,3) point blocks —
    vmap(jnp.diag) lowers to a gather that measured ~1.65 ms/iter at the
    canonical scale, more than the whole assembly+solve. Dense
    reprojection-only problems instead recompute the diagonal lane-wise
    from the blocks ((3,P) einsum that fuses with the step's other Jp
    consumers, ~free). Dropping the pinning/floor terms there is exact:
    unobserved points have dxp == 0, and observed diagonals sit far above
    the 1e-12 floor."""
    diag_c = jnp.maximum(jax.vmap(jnp.diag)(d_c), 1e-12)
    cam_term = jnp.sum(dxc * diag_c * dxc)
    if isinstance(problem, BADenseProblem) and problem.n_constraints == 0:
        diag_pt = jnp.einsum("crip,crp->ip", Jp * Jp, w)  # (3,P)
        pt_term = jnp.sum(dxp.T**2 * diag_pt)
    elif obs_minor and not isinstance(problem, BADenseProblem):
        # d_p arrives point-minor (3,3,P): diag extraction is 3 lane rows
        diag_pt = jnp.maximum(jnp.stack([d_p[0, 0], d_p[1, 1], d_p[2, 2]]), 1e-12)
        pt_term = jnp.sum(dxp.T**2 * diag_pt)
    else:
        diag_p = jnp.maximum(jax.vmap(jnp.diag)(d_p), 1e-12)
        pt_term = jnp.sum(dxp * diag_p * dxp)
    return 0.5 * (lam * (cam_term + pt_term) - (jnp.sum(g_c * dxc) + jnp.sum(g_p * dxp)))


# ---------------------------------------------------------------------------
# The LM driver
# ---------------------------------------------------------------------------


@dataclass
class BAResult:
    cam9: np.ndarray  # (C,9)
    # (P,3) optimized world points. On a single placement this is a
    # DEVICE-BACKED jax.Array: the pipeline chains BA -> filter -> BA with
    # the points living on the device throughout, and a 0.5 MB host fetch
    # per solve costs more than several LM iterations through a remote
    # tunnel. np.asarray(result.X) fetches when host values are needed.
    X: np.ndarray
    cost_initial: float
    cost_final: float
    n_iterations: int
    converged: bool
    gradient_norm: float
    n_devices: int = 1  # devices the observation axis was sharded over


def _lm_run_impl(problem, cam9_0, X0, lb, ub, *, loss, f_scale, max_iter, ftol, xtol, gtol, solver_kind, cg_tol, cg_max_iter, init_lambda, mesh=None, pallas_schur=None, obs_minor=False):
    n_points = X0.shape[0]
    dt = cam9_0.dtype
    cost0 = _cost_only(problem, cam9_0, X0, loss, f_scale, obs_minor)

    def clip_params(cam9, X):
        return jnp.clip(cam9, lb, ub), X

    def step(state):
        cam9, X, lam, cost, it, done, gnorm = state
        r, w, Jc, Jp, rq, qidx, Jq, _ = _masked_blocks(problem, cam9, X, loss, f_scale, obs_minor)
        g_c, g_p, d_c, d_p = _gradient_and_diag(problem, w, r, Jc, Jp, rq, qidx, Jq, n_points, mesh, obs_minor)
        gnorm_new = jnp.maximum(jnp.max(jnp.abs(g_c * problem.param_free)), jnp.max(jnp.abs(g_p)))

        if solver_kind == "dense":
            dxc, dxp = _solve_dense(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, obs_minor)
        elif solver_kind == "schur":
            dxc, dxp = _solve_schur(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, cg_tol, cg_max_iter, mesh, pallas_schur, obs_minor)
        elif solver_kind == "schur_cg":
            dxc, dxp = _solve_schur_cg(problem, w, Jc, Jp, g_c, g_p, d_c, d_p, lam, cg_tol, cg_max_iter, mesh, obs_minor)
        else:
            dxc, dxp = _solve_cg(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, cg_tol, cg_max_iter, obs_minor)

        cam9_new, X_new = clip_params(cam9 + dxc, X + dxp)
        cost_new = _cost_only(problem, cam9_new, X_new, loss, f_scale, obs_minor)

        # Gain ratio vs the damped-model predicted decrease
        pred = _predicted_decrease(problem, w, Jp, d_c, d_p, g_c, g_p, dxc, dxp, lam, obs_minor)
        rho = (cost - cost_new) / jnp.maximum(pred, 1e-30)
        accept = cost_new < cost

        lam = jnp.where(
            accept,
            lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            lam * 4.0,
        )
        lam = jnp.clip(lam, 1e-12, 1e10)

        cam9 = jnp.where(accept, cam9_new, cam9)
        X = jnp.where(accept, X_new, X)
        rel_dec = (cost - cost_new) / jnp.maximum(cost, 1e-30)
        # scipy-style termination: ftol (small accepted relative decrease),
        # xtol (small accepted step), gtol, or a stalled trust region (damping
        # maxed out — no step can improve the cost further)
        x_norm = jnp.sqrt(jnp.sum(cam9**2) + jnp.sum(X**2))
        dx_norm = jnp.sqrt(jnp.sum(dxc**2) + jnp.sum(dxp**2))
        done_new = jnp.logical_or(
            jnp.logical_or(
                jnp.logical_and(accept, rel_dec < ftol),
                jnp.logical_and(accept, dx_norm < xtol * (x_norm + xtol)),
            ),
            jnp.logical_or(gnorm_new < gtol, lam >= 1e9),
        )
        cost = jnp.where(accept, cost_new, cost)
        return cam9, X, lam, cost, it + 1, done_new, gnorm_new

    def cond(state):
        _c, _x, _l, _cost, it, done, _g = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    lam0 = jnp.asarray(init_lambda, dt)
    state0 = (cam9_0, X0, lam0, cost0, jnp.array(0), jnp.array(False), jnp.asarray(jnp.inf, dt))
    cam9, X, _lam, cost, it, done, gnorm = jax.lax.while_loop(cond, step, state0)
    # pack the small outputs INSIDE the solve program: a separate packing
    # dispatch costs ~15 ms of enqueue latency through a tunneled device
    return _pack_result(cam9, cost0, cost, it, done, gnorm), X


_lm_run = partial(
    jax.jit,
    static_argnames=(
        "loss", "f_scale", "max_iter", "ftol", "xtol", "gtol",
        "solver_kind", "cg_tol", "cg_max_iter", "init_lambda", "mesh",
        "pallas_schur", "obs_minor",
    ),
)(_lm_run_impl)


def _use_obs_minor(problem, mesh, policy: str = "auto") -> bool:
    """Whether this solve takes the obs-minor sparse layout (see
    BAConfig.obs_minor for the policy rationale)."""
    if isinstance(problem, BADenseProblem) or mesh is not None:
        return False
    if policy == "always":
        return True
    if policy == "never":
        return False
    return jax.default_backend() != "cpu"


def _resolve_mesh(problem: BAProblem, config: BAConfig, mesh):
    """Decide the device mesh for this solve (None = single placement)."""
    if mesh is not None:
        return mesh
    if config.shard == "never":
        return None
    devices = jax.devices()
    if len(devices) < 2:
        return None
    if config.shard == "always" or problem.n_obs >= config.shard_min_obs:
        from caliscope_tpu.parallel.sharded import make_obs_mesh

        return make_obs_mesh(devices)
    return None


def lm_solve(problem: BAProblem, cam9_0, X0, config: BAConfig = BAConfig(), mesh=None) -> BAResult:
    """Run Levenberg-Marquardt bundle adjustment.

    Args:
        problem: BAProblem device arrays.
        cam9_0:  (C,9) initial camera blocks [rvec, tvec, s, k1, k2].
        X0:      (P,3) initial world points.
        config:  BAConfig.
        mesh:    optional jax.sharding.Mesh to shard the observation axis
                 over; by default one is built per config.shard policy when
                 multiple devices are visible. The whole while-loop then runs
                 as one SPMD program — XLA lowers the J^T W J / J^T W r
                 segment reductions to all-reduces over the mesh.

    Returns BAResult with optimized parameters (host numpy).
    """
    dtype = problem.uv.dtype
    C = problem.n_cameras
    P = int(np.asarray(X0).shape[0])
    dim = N_CAM_PARAMS * C + 3 * P

    if config.solver == "schur_cg" and problem.n_constraints:
        raise ValueError(
            "solver='schur_cg' is reprojection-only (constraints couple points "
            "and break the block-diagonal Hpp elimination); use 'schur', 'cg', "
            "or 'auto'."
        )
    mesh = _resolve_mesh(problem, config, mesh)
    P_orig = P
    if mesh is not None:
        from caliscope_tpu.parallel.sharded import shard_problem

        problem = shard_problem(problem, mesh)
        if isinstance(problem, BADenseProblem) and problem.n_points != P:
            # the dense layout's point axis was padded to a mesh multiple;
            # pad X0 to match (centroid fill: benign, zero-gradient, pinned)
            X0 = np.asarray(X0)
            extra = problem.n_points - P
            X0 = np.concatenate([X0, np.tile(X0.mean(axis=0), (extra, 1))])
            P = X0.shape[0]

    if config.solver != "auto":
        solver_kind = config.solver
    elif mesh is not None:
        # Sharded: the dense path scatters into one (dim, dim) matrix, which
        # replicates poorly; Schur keeps per-observation work on the sharded
        # axis and reduces only (C,9,...) quantities.
        solver_kind = "schur"
    elif dim <= config.dense_cutoff:
        solver_kind = "dense"
    else:
        # Schur elimination materializes two (C, P, 9, 3) edge tensors; use it
        # whenever that fits comfortably. Past the memory ceiling, the
        # IMPLICIT Schur CG (matrix-free reduced camera system) keeps
        # Schur-class convergence at any problem size; constrained problems
        # (point-point coupling breaks block-diagonal Hpp) fall back to
        # full-system CG.
        itemsize = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype).itemsize
        schur_bytes = 2 * C * P * N_CAM_PARAMS * 3 * itemsize
        if schur_bytes <= 1 << 30:
            solver_kind = "schur"
        else:
            solver_kind = "schur_cg" if problem.n_constraints == 0 else "cg"

    lb = np.full((C, N_CAM_PARAMS), -BIG)
    ub = np.full((C, N_CAM_PARAMS), BIG)
    lb[:, 6:] = INTRINSIC_LOWER
    ub[:, 6:] = INTRINSIC_UPPER

    np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)
    param_host = (
        np.asarray(cam9_0, np_dtype),
        np.asarray(X0, np_dtype),
        lb.astype(np_dtype),
        ub.astype(np_dtype),
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        cam9_d, X_d, lb_d, ub_d = jax.device_put(
            param_host, NamedSharding(mesh, PartitionSpec())
        )
    else:
        cam9_d, X_d, lb_d, ub_d = jax.device_put(param_host)
    # host-side Pallas-Schur eligibility: part of the jit STATIC key, so
    # flipping CALISCOPE_TPU_NO_PALLAS_SCHUR takes effect on the next call
    # instead of silently hitting the cached kernel-path executable
    if isinstance(problem, BADenseProblem):
        from caliscope_tpu.solvers.pallas_schur import pallas_schur_available

        pallas_schur = pallas_schur_available(problem, mesh, problem.n_points, np_dtype)
    else:
        pallas_schur = False
    opts = dict(
        loss=config.loss,
        f_scale=float(config.f_scale),
        max_iter=config.max_iter,
        ftol=config.ftol,
        xtol=config.xtol,
        gtol=config.gtol,
        solver_kind=solver_kind,
        cg_tol=config.cg_tol,
        cg_max_iter=config.cg_max_iter,
        init_lambda=config.init_lambda,
        mesh=mesh,
        pallas_schur=pallas_schur,
        # sparse problems on a single placement take the obs-minor layout
        # (see the obs-minor section and BAConfig.obs_minor); meshes keep
        # the row layout GSPMD shards along its leading axis
        obs_minor=_use_obs_minor(problem, mesh, config.obs_minor),
    )
    if config.bake_problem:
        # cache the baked executable ON the problem instance (lifetime-tied:
        # no id-reuse hazard) so repeated solves of the same problem reuse it
        cache_key = tuple(sorted(opts.items()))
        cache = getattr(problem, "_baked_runners", None)
        if cache is None:
            cache = {}
            object.__setattr__(problem, "_baked_runners", cache)
        runner = cache.get(cache_key)
        if runner is None:
            runner = jax.jit(lambda c, x, lo, hi: _lm_run_impl(problem, c, x, lo, hi, **opts))
            cache[cache_key] = runner
        packed, X = runner(cam9_d, X_d, lb_d, ub_d)
    else:
        packed, X = _lm_run(problem, cam9_d, X_d, lb_d, ub_d, **opts)

    def to_host(a):
        # Multi-process meshes: point-axis outputs stay sharded across
        # processes (deliberately — see _pshard); gather before fetching.
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(a, tiled=True))
        return np.asarray(a)

    # ONE SMALL device->host transfer for the whole result: each separate
    # fetch pays a flat round trip (~27 ms through the dev tunnel), and the
    # naive per-field readback (7 fetches) cost more than a dozen LM
    # iterations of actual solving. On a single placement the (P,3) points
    # are NOT fetched at all — they stay on the device (see BAResult.X);
    # multi-process meshes gather them (sharded outputs can't outlive the
    # mesh contextually).
    flat = to_host(packed)
    nc = N_CAM_PARAMS * C
    cam9_h = flat[:nc].reshape(C, N_CAM_PARAMS)
    cost0_f, cost_f, it_f, done_f, gnorm_f = flat[nc:]
    if isinstance(X, jax.Array) and not X.is_fully_addressable:
        X_out = to_host(X)[:P_orig]
    else:
        X_out = X[:P_orig] if P_orig != X.shape[0] else X
    return BAResult(
        cam9=cam9_h,
        X=X_out,
        cost_initial=float(cost0_f),
        cost_final=float(cost_f),
        n_iterations=int(it_f),
        converged=bool(done_f),
        gradient_norm=float(gnorm_f),
        n_devices=int(mesh.size) if mesh is not None else 1,
    )


@jax.jit
def _pack_result(cam9, cost0, cost, it, done, gnorm):
    """Flatten the small solve outputs into one buffer for a single
    readback (the world points stay on device — see BAResult.X)."""
    dt = cam9.dtype
    scalars = jnp.stack(
        [
            jnp.asarray(cost0, dt),
            jnp.asarray(cost, dt),
            it.astype(dt),
            done.astype(dt),
            jnp.asarray(gnorm, dt),
        ]
    )
    return jnp.concatenate([cam9.reshape(-1), scalars])


@partial(jax.jit, static_argnames=("loss", "f_scale", "use_dense", "solver", "cg_tol", "cg_max_iter", "mesh"))
def lm_iteration(
    problem: BAProblem,
    cam9,
    X,
    lam,
    *,
    loss: str = "linear",
    f_scale: float = 1.0,
    use_dense: bool = False,  # legacy alias for solver="dense"
    solver: str = "schur",  # 'schur' | 'dense' | 'cg'
    cg_tol: float = 1e-6,
    cg_max_iter: int = 200,
    mesh=None,
):
    """One full Levenberg-Marquardt iteration (assembly + linear solve +
    gain-ratio damping update) as a standalone jittable step.

    This is the unit the benchmark and the multi-chip dry run drive: with the
    observation-axis arrays of `problem` sharded over a mesh, XLA lowers the
    segment-sum reductions inside to psums over ICI — identical code, SPMD
    execution (see parallel/sharded.py).

    Returns (cam9', X', lam', cost', accepted).
    """
    if solver == "schur_cg" and not use_dense and problem.n_constraints:
        raise ValueError(
            "solver='schur_cg' is reprojection-only (constraints couple points "
            "and break the block-diagonal Hpp elimination); use 'schur' or 'cg'."
        )
    n_points = X.shape[0]
    obs_minor = _use_obs_minor(problem, mesh)
    r, w, Jc, Jp, rq, qidx, Jq, cost = _masked_blocks(problem, cam9, X, loss, f_scale, obs_minor)
    g_c, g_p, d_c, d_p = _gradient_and_diag(problem, w, r, Jc, Jp, rq, qidx, Jq, n_points, mesh, obs_minor)
    kind = "dense" if use_dense else solver
    if kind == "dense":
        dxc, dxp = _solve_dense(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, obs_minor)
    elif kind == "schur":
        dxc, dxp = _solve_schur(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, cg_tol, cg_max_iter, mesh, obs_minor=obs_minor)
    elif kind == "schur_cg":
        dxc, dxp = _solve_schur_cg(problem, w, Jc, Jp, g_c, g_p, d_c, d_p, lam, cg_tol, cg_max_iter, mesh, obs_minor)
    else:
        dxc, dxp = _solve_cg(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, cg_tol, cg_max_iter, obs_minor)
    cam9_new, X_new = cam9 + dxc, X + dxp
    cost_new = _cost_only(problem, cam9_new, X_new, loss, f_scale, obs_minor)
    accept = cost_new < cost
    pred = _predicted_decrease(problem, w, Jp, d_c, d_p, g_c, g_p, dxc, dxp, lam, obs_minor)
    rho = (cost - cost_new) / jnp.maximum(pred, 1e-30)
    lam_new = jnp.where(accept, lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3), lam * 4.0)
    cam9_out = jnp.where(accept, cam9_new, cam9)
    X_out = jnp.where(accept, X_new, X)
    return cam9_out, X_out, jnp.clip(lam_new, 1e-12, 1e10), jnp.minimum(cost, cost_new), accept


def bound_warnings(cam9, proximity: float = 0.01) -> list[str]:
    """Warn when free intrinsics sit within `proximity` of their bounds
    (reference bundle_parameterization.py:232-278)."""
    warnings = []
    names = ["f-scale", "k1", "k2"]
    for c in range(cam9.shape[0]):
        for j in range(3):
            v = cam9[c, 6 + j]
            lo, hi = INTRINSIC_LOWER[j], INTRINSIC_UPPER[j]
            span = hi - lo
            if v - lo < proximity * span or hi - v < proximity * span:
                warnings.append(
                    f"Camera index {c}: intrinsic {names[j]} = {v:.4f} is near its bound [{lo}, {hi}] — "
                    f"intrinsic calibration may be unreliable; consider dedicated intrinsic calibration."
                )
    return warnings
