"""Observation-axis sharding of the bundle-adjustment problem.

Design (jax-native, per the scaling-book recipe): pick a mesh, annotate input
shardings, let XLA insert the collectives. One LM iteration is one SPMD
program: the per-observation work (projection, jacfwd blocks, robust weights)
is embarrassingly parallel along the sharded axis; the J^T W J / J^T W r
segment sums contract the sharded axis away, so GSPMD emits one all-reduce
per reduced quantity — the camera system (C x 9 x 9), point system
(P x 3 x 3) and gradients — riding ICI, not host memory.

No shard_map needed: `jit` + `jax.sharding.NamedSharding` on the inputs is
sufficient because every op in the LM iteration has a well-defined SPMD
lowering. Padding rows carry obs_mask=False and contribute exact zeros.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from caliscope_tpu.solvers.bundle import BADenseProblem, BAProblem, lm_iteration

OBS_AXIS = "obs"


def make_obs_mesh(devices=None, axis_name: str = OBS_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices for observation sharding."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def _pad_len(n: int, k: int) -> int:
    return (n + k - 1) // k * k


def shard_dense_problem(problem: BADenseProblem, mesh: Mesh, axis_name: str = OBS_AXIS) -> BADenseProblem:
    """Shard the dense layout's POINT axis over the mesh; cameras and
    constraints replicate. The point axis plays the sharded-observation role:
    residual/Jacobian slots partition by point, the camera-side reductions
    all-reduce (C is tiny), and point-side quantities stay sharded end to
    end (see bundle._pshard). Pads P to a mesh multiple; padded points have
    all slots masked and are pinned by the solver's zero-diagonal prior —
    the CALLER must pad its X0 to match (lm_solve does).

    The dense storage is POINT-MINOR (uv (C, 2, P), mask (C, P)) so the
    sharded axis is the LAST one — sharding the lane dimension keeps every
    per-shard tile fully occupied too."""
    n_dev = mesh.shape[axis_name]
    n_pts = problem.n_points
    pad = _pad_len(max(n_pts, n_dev), n_dev) - n_pts

    def pad_p(a, fill=0):
        a = np.asarray(a)
        if pad == 0:
            return a
        widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return np.pad(a, widths, constant_values=fill)

    uv_sharding = NamedSharding(mesh, P(None, None, axis_name))
    mask_sharding = NamedSharding(mesh, P(None, axis_name))
    rep = NamedSharding(mesh, P())
    return replace(
        problem,
        uv=jax.device_put(pad_p(problem.uv), uv_sharding),
        obs_mask=jax.device_put(pad_p(problem.obs_mask, fill=False), mask_sharding),
        **{
            f: jax.device_put(np.asarray(getattr(problem, f)), rep)
            for f in (
                "K0", "dist0", "fisheye", "inv_fx", "param_free",
                "con_pa_idx", "con_pa_w", "con_pb_idx", "con_pb_w",
                "con_target", "con_weight",
            )
        },
    )


def shard_problem(problem, mesh: Mesh, axis_name: str = OBS_AXIS):
    """Pad the observation axis to the mesh size and place arrays:
    per-observation arrays sharded along `axis_name`, everything else
    (cameras, constraints) replicated. Dispatches on the problem layout."""
    if isinstance(problem, BADenseProblem):
        return shard_dense_problem(problem, mesh, axis_name)
    n_dev = mesh.shape[axis_name]
    N = problem.n_obs
    N_pad = _pad_len(max(N, n_dev), n_dev)
    pad = N_pad - N

    def pad_obs(a, fill=0, fill_last=False):
        a = np.asarray(a)
        if pad == 0:
            return a
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        if fill_last and len(a):
            # repeat the final row: keeps make_problem's sorted-by-(pt, cam)
            # row invariant (the solver asserts indices_are_sorted to XLA)
            # while obs_mask=False zeroes the padding's contribution
            fill = a[-1]
        return np.pad(a, widths, constant_values=fill)

    obs_sharding = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def put_obs(a):
        return jax.device_put(a, obs_sharding)

    def put_rep(a):
        return jax.device_put(np.asarray(a), rep)

    return replace(
        problem,
        cam_idx=put_obs(pad_obs(problem.cam_idx, fill_last=True)),
        pt_idx=put_obs(pad_obs(problem.pt_idx, fill_last=True)),
        uv=put_obs(pad_obs(problem.uv)),
        obs_mask=put_obs(pad_obs(problem.obs_mask, fill=False)),
        K0=put_rep(problem.K0),
        dist0=put_rep(problem.dist0),
        fisheye=put_rep(problem.fisheye),
        inv_fx=put_rep(problem.inv_fx),
        param_free=put_rep(problem.param_free),
        con_pa_idx=put_rep(problem.con_pa_idx),
        con_pa_w=put_rep(problem.con_pa_w),
        con_pb_idx=put_rep(problem.con_pb_idx),
        con_pb_w=put_rep(problem.con_pb_w),
        con_target=put_rep(problem.con_target),
        con_weight=put_rep(problem.con_weight),
    )


def sharded_lm_iteration(problem: BAProblem, cam9, X, lam, mesh: Mesh, **kwargs):
    """One LM iteration with parameters replicated over the mesh. `problem`
    must already be sharded via shard_problem(). kwargs as lm_iteration."""
    rep = NamedSharding(mesh, P())
    cam9 = jax.device_put(np.asarray(cam9), rep)
    X = jax.device_put(np.asarray(X), rep)
    lam = jax.device_put(np.asarray(lam), rep)
    return lm_iteration(problem, cam9, X, lam, mesh=mesh, **kwargs)
