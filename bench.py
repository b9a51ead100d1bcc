"""Benchmark: bundle-adjustment iteration throughput vs the reference engine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the canonical real-session scale (BASELINE.md — 141,422 observations,
the `larger_calibration_post_monocal` session) synthesized as an 8-camera rig
with ~35k world points, solved per LM iteration:
  - ours:     one full jitted LM iteration (residual + jacfwd blocks + IRLS +
              block-Jacobi PCG normal solve + damping update) on the default
              JAX device (the TPU chip when present).
  - baseline: one reference-engine iteration equivalent measured on CPU —
              per-camera cv2.projectPoints with analytic Jacobian + scipy
              sparse COO->CSR assembly, exactly the per-iteration work
              scipy.optimize.least_squares(trf) drives in the reference
              (/root/reference/src/caliscope/core/reprojection.py:75-233).

vs_baseline = ours_iters_per_sec / baseline_iters_per_sec (higher is better).
"""

from __future__ import annotations

import json
import time

import numpy as np

import os

N_CAMERAS = int(os.environ.get("CALISCOPE_BENCH_CAMS", 8))
N_POINTS = int(os.environ.get("CALISCOPE_BENCH_PTS", 35_000))
N_OBS = int(os.environ.get("CALISCOPE_BENCH_OBS", 141_422))
SEED = 7
TIMED_ITERS = int(os.environ.get("CALISCOPE_BENCH_ITERS", 20))
VERBOSE = bool(os.environ.get("CALISCOPE_BENCH_VERBOSE"))


def _log(msg):
    if VERBOSE:
        import sys, time

        print(f"[bench +{time.perf_counter():.1f}s] {msg}", file=sys.stderr, flush=True)


def _np_rodrigues_log(R):
    """Pure-numpy SO(3) log (the setup must not touch the device — over a
    tunneled TPU every tiny dispatch pays a network round trip)."""
    cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
    ang = np.arccos(cos)
    if ang < 1e-10:
        return np.zeros(3)
    axis = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / (2 * np.sin(ang))
    return axis * ang


def _np_project(X, R, t, K, dist):
    """Pure-numpy Brown projection for test-data synthesis."""
    xc = X @ R.T + t
    xn = xc[:, :2] / xc[:, 2:3]
    k1, k2, p1, p2, k3 = dist
    r2 = np.sum(xn**2, axis=1)
    radial = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
    x, y = xn[:, 0], xn[:, 1]
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd * K[0, 0] + K[0, 2], yd * K[1, 1] + K[1, 2]], axis=1)


def _synth_problem():
    """Random-but-realistic rig: 8-camera ring, points in a 2m cube, every
    observation a (camera, point) pair with pixel noise. All host-side numpy."""
    rng = np.random.default_rng(SEED)
    K = np.zeros((N_CAMERAS, 3, 3))
    dist = np.zeros((N_CAMERAS, 5))
    rvecs = np.zeros((N_CAMERAS, 3))
    tvecs = np.zeros((N_CAMERAS, 3))
    Rs = np.zeros((N_CAMERAS, 3, 3))
    for i in range(N_CAMERAS):
        a = 2 * np.pi * i / N_CAMERAS
        c = np.array([3.0 * np.cos(a), 3.0 * np.sin(a), 1.2])
        z = -c / np.linalg.norm(c)  # optical axis toward origin
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)
        Rs[i] = R
        rvecs[i] = _np_rodrigues_log(R)
        tvecs[i] = -R @ c
        K[i] = [[900.0, 0, 640], [0, 900.0, 360], [0, 0, 1]]
        dist[i] = [0.1, -0.05, 0.001, -0.001, 0.01]

    X = rng.uniform([-1, -1, -0.5], [1, 1, 1.5], size=(N_POINTS, 3))
    cam_idx = rng.integers(0, N_CAMERAS, size=N_OBS)
    pt_idx = rng.integers(0, N_POINTS, size=N_OBS)
    uv = np.empty((N_OBS, 2))
    for i in range(N_CAMERAS):
        m = cam_idx == i
        uv[m] = _np_project(X[pt_idx[m]], Rs[i], tvecs[i], K[i], dist[i])
    uv = uv + rng.normal(scale=0.5, size=uv.shape)
    return K, dist, rvecs, tvecs, X, cam_idx, pt_idx, uv


def bench_ours(K, dist, rvecs, tvecs, X, cam_idx, pt_idx, uv):
    """Time the full LM solve — ONE jitted lax.while_loop dispatch running
    exactly TIMED_ITERS iterations (ftol/gtol zeroed), end-to-end including
    the result readback. This is the production execution shape: the entire
    optimization is a single device program, so per-dispatch host/tunnel
    latency amortizes to nothing."""
    from caliscope_tpu.solvers.bundle import BAConfig, lm_solve, make_problem

    problem = make_problem(cam_idx, pt_idx, uv, K, dist, np.zeros(N_CAMERAS, bool))
    cam9 = np.concatenate([rvecs, tvecs, np.ones((N_CAMERAS, 1)), dist[:, :2]], axis=1)
    solver = os.environ.get("CALISCOPE_BENCH_SOLVER", "auto")
    config = BAConfig(
        max_iter=TIMED_ITERS, ftol=0.0, gtol=0.0, solver=solver, cg_max_iter=30,
        # steady-state serving shape: the problem is compiled in as constants
        # (the warmup call below pays the compile; the timed call measures
        # pure iteration throughput)
        bake_problem=True,
    )
    _log("compiling + warmup solve")
    lm_solve(problem, cam9, X, config)
    _log("compiled; timing (best of 2)")
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        res = lm_solve(problem, cam9, X, config)
        best = min(best, time.perf_counter() - t0)
    assert res.n_iterations == TIMED_ITERS, res.n_iterations
    return best / res.n_iterations, res.cost_final


def bench_reference_equivalent(K, dist, rvecs, tvecs, X, cam_idx, pt_idx, uv, iters=3):
    """Reference per-iteration work: cv2.projectPoints (+Jacobian) per camera,
    COO->CSR sparse Jacobian assembly, J^T J normal product (what TRF's
    subproblem consumes). CPU, like the reference."""
    import cv2
    from scipy import sparse

    n_params = 9 * N_CAMERAS + 3 * N_POINTS
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        rows_list, cols_list, vals_list = [], [], []
        residuals = np.empty((N_OBS, 2))
        for ci in range(N_CAMERAS):
            m = cam_idx == ci
            pts = X[pt_idx[m]]
            proj, jac = cv2.projectPoints(
                pts.reshape(-1, 1, 3), rvecs[ci], tvecs[ci], K[ci], dist[ci]
            )
            residuals[m] = proj.reshape(-1, 2) - uv[m]
            # camera-block columns (rvec, tvec) from cv2's Jacobian
            Jc = jac[:, :6].reshape(-1, 2, 6)
            # world-point columns by chain rule d(proj)/dX = d(proj)/d(tvec) @ R
            R, _ = cv2.Rodrigues(rvecs[ci])
            Jp = jac[:, 3:6].reshape(-1, 2, 3) @ R
            obs_rows = 2 * np.where(m)[0]
            for k in range(6):
                rows_list += [obs_rows, obs_rows + 1]
                cols_list += [np.full(m.sum(), 9 * ci + k)] * 2
                vals_list += [Jc[:, 0, k], Jc[:, 1, k]]
            for k in range(3):
                rows_list += [obs_rows, obs_rows + 1]
                cols_list += [9 * N_CAMERAS + 3 * pt_idx[m] + k] * 2
                vals_list += [Jp[:, 0, k], Jp[:, 1, k]]
        rows = np.concatenate(rows_list)
        cols = np.concatenate(cols_list)
        vals = np.concatenate(vals_list)
        J = sparse.coo_matrix((vals, (rows, cols)), shape=(2 * N_OBS, n_params)).tocsr()
        g = J.T @ residuals.ravel()  # gradient product TRF evaluates
        best = min(best, time.perf_counter() - t0)
    # fastest-of-N: the most favorable measurement for the baseline
    return best


# Reference proxy per-iteration time measured on this host while idle
# (best-of-9 across 3 runs, 2026-08-17: 0.205/0.217/0.480 s). The live
# measurement below varies several-fold with background load, so the
# baseline used for the ratio is the FASTEST of (pinned, live) — the most
# favorable value for the reference, making vs_baseline conservative+stable.
PINNED_REFERENCE_S = 0.205


def main():
    _log("synthesizing problem")
    data = _synth_problem()
    _log("benching ours")
    ours_s, cost = bench_ours(*data)
    _log(f"ours {ours_s:.3f}s/iter; benching reference proxy")
    ref_s = min(bench_reference_equivalent(*data), PINNED_REFERENCE_S)
    _log(f"reference proxy {ref_s:.3f}s/iter (pinned idle-host floor {PINNED_REFERENCE_S})")
    ours_ips = 1.0 / ours_s
    ref_ips = 1.0 / ref_s
    print(
        json.dumps(
            {
                "metric": "ba_lm_iterations_per_sec_141k_obs",
                "value": round(ours_ips, 3),
                "unit": "iter/s",
                "vs_baseline": round(ours_ips / ref_ips, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
