"""Benchmarks: one JSON line per metric, headline (BA iter/s) printed LAST.

Metrics (the two BASELINE.json north stars + the scaling target):
  1. detect_frames_per_sec_720p   — batched ChArUco detection (threshold →
     CCL → quads → dictionary decode → X-corner snap) on the default JAX
     device vs cv2.aruco.CharucoDetector on CPU, same frames.
  2. ba_shard_8dev_throughput_retained — full sharded lm_solve iter/s at 8
     virtual devices as a % of single-placement iter/s (identical total
     work; virtual devices share the host's cores, so sharding OVERHEAD is
     the honest measurable — see bench_scaling). vs_baseline against the
     <=20% overhead target.
  3. ba_lm_iterations_per_sec_141k_obs (headline) — full jitted LM solve at
     the canonical real-session scale (141,422 obs, 8 cams, 35k points) vs a
     reference-engine per-iteration equivalent (cv2.projectPoints + scipy
     sparse assembly, /root/reference/src/caliscope/core/reprojection.py:75-233).

`python bench.py --profile` instead records where one LM iteration's time
goes (assembly vs reductions vs the linear solve) — see PROFILE.md.

vs_baseline = ours / baseline (higher is better) for throughput metrics.
"""

from __future__ import annotations

import json
import sys
import time

import os

# The scaling benchmark needs a multi-device CPU backend alongside whatever
# the default platform is; must be configured before jax first import.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: first-compile of the fused detection program
# through the remote-compile TPU path runs minutes; cached runs skip it.
# The directory is finalized in main() AFTER platform resolution — entries
# baked by plugin-initialized processes carry different XLA CPU target flags
# (+prefer-no-scatter) than plugin-less ones, and loading across that
# boundary has crashed with machine-feature mismatches (SIGILL class).
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


def _finalize_cache_dir():
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return
    import jaxlib

    key = f"{os.environ.get('JAX_PLATFORMS') or 'auto'}_{jaxlib.__version__}"
    os.environ["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/caliscope_jax_cache_{key}"

import numpy as np

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
    # Unique (point, camera) pairs, like real sessions (a camera sees a world
    # point at most once) — sampled without replacement from the P x C grid.
    pair = rng.choice(N_POINTS * N_CAMERAS, size=N_OBS, replace=False)
    cam_idx = (pair % N_CAMERAS).astype(np.int64)
    pt_idx = (pair // N_CAMERAS).astype(np.int64)
    uv = np.empty((N_OBS, 2))
    for i in range(N_CAMERAS):
        m = cam_idx == i
        uv[m] = _np_project(X[pt_idx[m]], Rs[i], tvecs[i], K[i], dist[i])
    uv = uv + rng.normal(scale=0.5, size=uv.shape)
    return K, dist, rvecs, tvecs, X, cam_idx, pt_idx, uv


def bench_ours(K, dist, rvecs, tvecs, X, cam_idx, pt_idx, uv):
    """Time the full LM solve — ONE jitted lax.while_loop dispatch running
    exactly TIMED_ITERS iterations (ftol/gtol zeroed), end-to-end including
    the result readback (camera blocks + scalars; the world points stay
    DEVICE-RESIDENT on BAResult, as the production pipeline chains
    BA->filter->BA on-device — see solvers/bundle.py::BAResult.X). The
    entire optimization is a single device program, so per-dispatch
    host/tunnel latency amortizes to nothing.

    Two configurations, both reachable through CaptureVolume.optimize():
      - production (HEADLINE): the DENSE (P, C) observation layout with the
        point axis bucketed exactly as volume.optimize buckets it — this is
        the layout the production pipeline picks at this scale (unique
        (point, camera) pairs, grid >= 1/3 full);
      - sparse_layout: the sparse row layout (the fallback path for
        static-object sessions with duplicate pairs), secondary metric.
    Returns {"production": s/iter, "sparse_layout": s/iter}, cost_final.
    """
    from caliscope_tpu.ops.bucket import bucket_size
    from caliscope_tpu.solvers.bundle import (
        BAConfig,
        lm_solve,
        make_dense_problem,
        make_problem,
    )

    cam9 = np.concatenate([rvecs, tvecs, np.ones((N_CAMERAS, 1)), dist[:, :2]], axis=1)
    solver = os.environ.get("CALISCOPE_BENCH_SOLVER", "auto")
    # mirror volume.optimize's point bucketing (one compiled program per
    # quarter-octave point bucket)
    Pb = bucket_size(N_POINTS + 1, fine=True)
    Xb = np.concatenate([X, np.tile(X.mean(axis=0), (Pb - N_POINTS, 1))])
    problems = {
        "production": (
            make_dense_problem(cam_idx, pt_idx, uv, K, dist, np.zeros(N_CAMERAS, bool), n_points=Pb),
            Xb,
        ),
        "sparse_layout": (
            make_problem(cam_idx, pt_idx, uv, K, dist, np.zeros(N_CAMERAS, bool)),
            X,
        ),
    }
    out = {}
    cost = None
    config = BAConfig(max_iter=TIMED_ITERS, ftol=0.0, gtol=0.0, solver=solver, cg_max_iter=30)
    for name, (problem, X_init) in problems.items():
        _log(f"compiling + warmup solve ({name})")
        lm_solve(problem, cam9, X_init, config)
        _log(f"compiled; timing {name} (best of 3)")
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            res = lm_solve(problem, cam9, X_init, config)
            best = min(best, time.perf_counter() - t0)
        assert res.n_iterations == TIMED_ITERS, res.n_iterations
        out[name] = best / res.n_iterations
        if name == "production":
            cost = res.cost_final
    return out, cost


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


# ---------------------------------------------------------------------------
# Detection benchmark (north-star metric #2)
# ---------------------------------------------------------------------------

DETECT_BATCH = int(os.environ.get("CALISCOPE_BENCH_DETECT_BATCH", 16))
DETECT_WH = (1280, 720)


def _detect_frames():
    """B warped views of a 5x7 charuco board at 720p (uint8 gray). cv2 is
    used only to synthesize the shared input frames."""
    import cv2

    from caliscope_tpu.targets.charuco import Charuco

    ch = Charuco(rows=5, columns=7, square_size_m=0.054)
    board = ch.board_image(px_per_square=100, margin_squares=0.5)
    w, h = DETECT_WH
    rng = np.random.default_rng(3)
    src = np.array([[0, 0], [board.shape[1], 0], [board.shape[1], board.shape[0]], [0, board.shape[0]]], np.float32)
    frames = np.empty((DETECT_BATCH, h, w), np.uint8)
    for b in range(DETECT_BATCH):
        jitter = rng.uniform(-40, 40, size=(4, 2)).astype(np.float32)
        dst = np.array([[200, 90], [1080, 120], [1040, 620], [240, 600]], np.float32) + jitter
        H = cv2.getPerspectiveTransform(src, dst)
        frames[b] = cv2.warpPerspective(board, H, (w, h), borderValue=255, flags=cv2.INTER_LINEAR)
    return ch, frames


def bench_detect():
    """Ours: one batched device pipeline over the stack (per-frame time =
    stack time / B, end-to-end incl. host assembly + readback). Baseline:
    cv2.aruco.CharucoDetector.detectBoard per frame on CPU.

    Also measures the COMPUTE-BOUND rate: the fused device program's own
    throughput with input already resident, i.e. the steady-state rate of a
    pipelined deployment where uploads overlap compute (on a co-located
    PCIe/HBM host the upload IS overlapped; through this dev tunnel the
    42 MB/s link hides the chip entirely, which is why both numbers are
    reported). Methodology per PROFILE.md: enqueue M dependent-free
    dispatches on resident data and fetch one reduced scalar at the end —
    block_until_ready does not synchronize on this platform, and a tuple
    fetch pays the round trip per element.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from caliscope_tpu.trackers.charuco_tracker import (
        X_CORNER_KMAX,
        CharucoTracker,
        _charuco_device_program,
    )
    from caliscope_tpu.detect.dictionaries import get_dictionary

    ch, frames = _detect_frames()
    tracker = CharucoTracker(ch)
    _log("detect: warmup (compiles the batched pipeline)")
    warm = tracker.get_points_batch(frames)
    n_found = sum(len(p) for p in warm)
    assert n_found >= DETECT_BATCH * ch.n_corners * 0.9, f"detection found only {n_found} corners"
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        tracker.get_points_batch(frames)
        best = min(best, time.perf_counter() - t0)
    ours_fps = DETECT_BATCH / best
    _log(f"detect ours (e2e incl. upload): {ours_fps:.1f} frames/s")

    # compute-bound: resident input, M chained dispatches, one scalar fetch
    d = get_dictionary(ch.dictionary)
    use_pallas = jax.default_backend() == "tpu"
    chunk = min(8, DETECT_BATCH)  # _RUN_CHUNK-sized stacks, like production
    resident = jnp.asarray(frames[:chunk])
    args = (d.marker_size, 64, 96, 49, 4, X_CORNER_KMAX, use_pallas)
    out = _charuco_device_program(resident, *args)
    float(jnp.sum(out))  # settle compile + queue
    M = 6
    best_dev = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(M):
            o = _charuco_device_program(resident, *args)
            acc = o if acc is None else acc + o
        float(jnp.sum(acc))  # ONE device_get round trip for the whole chain
        best_dev = min(best_dev, time.perf_counter() - t0)
    compute_fps = chunk * M / best_dev
    _log(f"detect ours (compute-bound, resident input): {compute_fps:.1f} frames/s")

    cvd = cv2.aruco.getPredefinedDictionary(getattr(cv2.aruco, ch.dictionary))
    cv_board = cv2.aruco.CharucoBoard((ch.columns, ch.rows), ch.square_size_m, ch.square_size_m * ch.aruco_scale, cvd)
    det = cv2.aruco.CharucoDetector(cv_board)
    best_cv = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for b in range(DETECT_BATCH):
            det.detectBoard(frames[b])
        best_cv = min(best_cv, time.perf_counter() - t0)
    cv_fps = DETECT_BATCH / best_cv
    _log(f"detect cv2: {cv_fps:.1f} frames/s")
    return ours_fps, compute_fps, cv_fps


# ---------------------------------------------------------------------------
# Scaling benchmark (the >=80% 1->N target, measured on the virtual CPU mesh)
# ---------------------------------------------------------------------------

SCALING_ITERS = int(os.environ.get("CALISCOPE_BENCH_SCALING_ITERS", 12))
SCALING_REPS = int(os.environ.get("CALISCOPE_BENCH_SCALING_REPS", 5))


def bench_scaling(K, dist, rvecs, tvecs, X, cam_idx, pt_idx, uv):
    """Full sharded lm_solve over 1/2/4/8 CPU devices at the canonical scale.

    CPU, not the (single) TPU chip: sharding needs multiple devices, and the
    virtual host mesh exercises the identical GSPMD program that a pod slice
    would run.

    What this can and cannot measure: the 8 virtual devices SHARE the same
    physical cores, and single-placement XLA:CPU already uses all of them —
    so per-device compute cannot speed up 8x here and a classic efficiency
    number (ips_8 / (8 * ips_1)) would be meaningless by construction. The
    honest, measurable quantity is SHARDING OVERHEAD: ips_8dev / ips_1dev at
    identical total work. Every cost that real multi-chip scaling adds
    (collectives in the iteration, replicated parameter updates, partitioned
    program structure) is in that ratio; the per-device compute speedup that
    real chips add is not. Overhead <= 20% is the bench target, mapping to
    the >=80% weak-scaling goal once per-device compute actually scales.

    Measurement discipline (round-2 lesson: best-of-2 of short solves on a
    shared box recorded 36%, 174% and 250% across three runs): every rep
    measures ALL mesh sizes back to back (interleaved A/B), the retention
    ratio is computed WITHIN each rep so host-load drift hits both arms,
    and the reported number is the median ratio across SCALING_REPS reps.
    One rep at SCALING_ITERS iterations is seconds of work, not tenths.

    Returns (retained_ratios_per_rep, {n_devices: median iter/s},
    {n_devices: [iter/s per rep]}).
    """
    import jax

    from caliscope_tpu.ops.bucket import bucket_size
    from caliscope_tpu.parallel.sharded import make_obs_mesh
    from caliscope_tpu.solvers.bundle import BAConfig, lm_solve, make_dense_problem

    cpu_devices = jax.devices("cpu")
    # the production layout at this scale: dense (P, C), point axis sharded
    Pb = bucket_size(N_POINTS + 1, fine=True)
    problem = make_dense_problem(
        cam_idx, pt_idx, uv, K, dist, np.zeros(N_CAMERAS, bool), n_points=Pb
    )
    X = np.concatenate([X, np.tile(X.mean(axis=0), (Pb - N_POINTS, 1))])
    cam9 = np.concatenate([rvecs, tvecs, np.ones((N_CAMERAS, 1)), dist[:, :2]], axis=1)
    config = BAConfig(max_iter=SCALING_ITERS, ftol=0.0, gtol=0.0, solver="schur", cg_max_iter=30)
    sizes = [k for k in (1, 2, 4, 8) if k <= len(cpu_devices)]
    meshes = {k: make_obs_mesh(cpu_devices[:k]) for k in sizes}
    for k in sizes:
        _log(f"scaling: warmup/compile {k} devices")
        lm_solve(problem, cam9, X, config, mesh=meshes[k])
    samples = {k: [] for k in sizes}
    for rep in range(SCALING_REPS):
        for k in sizes:
            t0 = time.perf_counter()
            res = lm_solve(problem, cam9, X, config, mesh=meshes[k])
            dt = time.perf_counter() - t0
            assert res.n_iterations == SCALING_ITERS and res.n_devices == k
            samples[k].append(SCALING_ITERS / dt)
        _log(
            f"scaling rep {rep + 1}/{SCALING_REPS}: "
            + ", ".join(f"{k}dev {samples[k][-1]:.2f} it/s" for k in sizes)
        )
    ratios = []
    if 8 in samples and 1 in samples:
        ratios = [samples[8][i] / samples[1][i] for i in range(SCALING_REPS)]
    med = {k: float(np.median(samples[k])) for k in sizes}
    return ratios, med, samples


# ---------------------------------------------------------------------------
# Profile mode (--profile): where does one LM iteration go?
# ---------------------------------------------------------------------------


def profile_iteration(K, dist, rvecs, tvecs, X, cam_idx, pt_idx, uv, layout: str = "dense"):
    """Chained-timing breakdown of the LM iteration's stages on the default
    device. Each stage runs CHAIN reps inside ONE jit with a data dependency
    between reps (defeats loop hoisting; see PROFILE.md).

    layout: 'dense' profiles the production (P, C) observation layout
    (what CaptureVolume.optimize picks at canonical scale); 'sparse' the
    sparse-row fallback. The stage functions dispatch on the problem type,
    so both layouts share this harness.
    """
    import jax
    import jax.numpy as jnp

    from caliscope_tpu.ops.bucket import bucket_size
    from caliscope_tpu.solvers import bundle as B

    if layout == "dense":
        Pb = bucket_size(N_POINTS + 1, fine=True)
        problem = B.make_dense_problem(
            cam_idx, pt_idx, uv, K, dist, np.zeros(N_CAMERAS, bool), n_points=Pb
        )
        Xin = np.concatenate([X, np.tile(X.mean(axis=0), (Pb - N_POINTS, 1))])
    else:
        problem = B.make_problem(cam_idx, pt_idx, uv, K, dist, np.zeros(N_CAMERAS, bool))
        Xin = X
    cam9 = jnp.asarray(np.concatenate([rvecs, tvecs, np.ones((N_CAMERAS, 1)), dist[:, :2]], axis=1),
                       np.asarray(problem.uv).dtype)
    Xd = jnp.asarray(Xin, cam9.dtype)
    lam = jnp.asarray(1e-4, cam9.dtype)
    n_points = Xin.shape[0]
    CHAIN = 10

    def chain(fn):
        """fn: seed_scalar -> scalar. Returns best-of-3 seconds per rep."""
        @jax.jit
        def reps(seed):
            def body(i, s):
                # s feeds the stage input (defeats loop hoisting) and the
                # stage output feeds s (defeats dead-code elimination)
                return s + fn(s * 1e-30 + 1.0) * 1e-30
            return jax.lax.fori_loop(0, CHAIN, body, seed)

        float(reps(jnp.asarray(0.0, cam9.dtype)))  # compile
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(reps(jnp.asarray(0.0, cam9.dtype)))
            best = min(best, time.perf_counter() - t0)
        return best / CHAIN

    def stage_blocks(eps):
        r, w, Jc, Jp, rq, qidx, Jq, cost = B._masked_blocks(problem, cam9 * eps, Xd, "linear", 1.0)
        return cost + jnp.sum(r) + jnp.sum(Jc) * 1e-30

    def stage_grad(eps):
        r, w, Jc, Jp, rq, qidx, Jq, _ = B._masked_blocks(problem, cam9 * eps, Xd, "linear", 1.0)
        g_c, g_p, d_c, d_p = B._gradient_and_diag(problem, w, r, Jc, Jp, rq, qidx, Jq, n_points)
        return jnp.sum(g_c) + jnp.sum(g_p) + jnp.sum(d_c) * 1e-30 + jnp.sum(d_p) * 1e-30

    def make_solver_stage(kind):
        def stage(eps):
            r, w, Jc, Jp, rq, qidx, Jq, _ = B._masked_blocks(problem, cam9 * eps, Xd, "linear", 1.0)
            g_c, g_p, d_c, d_p = B._gradient_and_diag(problem, w, r, Jc, Jp, rq, qidx, Jq, n_points)
            if kind == "schur":
                dxc, dxp = B._solve_schur(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, 1e-6, 30)
            else:
                dxc, dxp = B._solve_cg(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, 1e-6, 30)
            return jnp.sum(dxc) + jnp.sum(dxp)
        return stage

    def stage_cost(eps):
        return B._cost_only(problem, cam9 * eps, Xd, "linear", 1.0)

    rows = [
        ("residual+jacobian blocks", chain(stage_blocks)),
        ("  + gradient/diag reductions", chain(stage_grad)),
        ("  + schur solve", chain(make_solver_stage("schur"))),
        ("  + cg solve (instead)", chain(make_solver_stage("cg"))),
        ("cost-only eval (step accept)", chain(stage_cost)),
    ]
    print(f"# LM iteration profile [{layout} layout] @ {N_OBS} obs / {N_POINTS} pts / {N_CAMERAS} cams (cumulative stages)")
    if layout == "dense":
        print(
            "# CAUTION: cumulative stage cuts force the dense layout's fused\n"
            "# intermediates (Jacobians, Schur coupling) to materialize and\n"
            "# OVERSTATE the fused iteration severalfold (see PROFILE.md).\n"
            "# For honest dense marginals use tools/profile_dense_fused.py\n"
            "# (variant-based, REPS-slope methodology)."
        )
    for name, secs in rows:
        print(f"{name:34s} {secs * 1e3:9.2f} ms/rep")
    return rows


def _emit(metric, value, unit, vs_baseline, **extra):
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:
        platform = "unknown"
    row = {"metric": metric, "value": round(value, 3), "unit": unit,
           "vs_baseline": round(vs_baseline, 3), "platform": platform}
    row.update(extra)
    print(json.dumps(row), flush=True)


class _SectionTimeout(Exception):
    pass


class _section_guard:
    """SIGALRM watchdog around one bench section: a wedged compile service
    or tunnel must skip the section, not starve the headline metric (the
    driver records whatever bench.py manages to print)."""

    def __init__(self, name: str, seconds: int):
        self.name = name
        self.seconds = seconds

    def __enter__(self):
        import signal

        def on_alarm(_sig, _frm):
            raise _SectionTimeout(self.name)

        self._old = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, exc_type, exc, tb):
        import signal

        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        if exc_type is _SectionTimeout:
            _log(f"SKIPPED {self.name}: exceeded {self.seconds}s (wedged compile/tunnel?)")
            return True
        if exc_type is not None and exc_type is not KeyboardInterrupt:
            _log(f"SKIPPED {self.name}: {exc_type.__name__}: {exc}")
            return True
        return False


def _load_device_probe():
    """Import caliscope_tpu/device_probe.py WITHOUT the package __init__
    (which imports jax — and jax must not be imported until the platform
    env var is settled)."""
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "caliscope_tpu", "device_probe.py")
    spec = importlib.util.spec_from_file_location("_caliscope_device_probe", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scaling_subprocess() -> bool:
    """Run the scaling section in a fresh CPU-pinned interpreter.

    When a TPU platform plugin owns the parent process, jax.devices("cpu")
    raises (the plugin registers as the ONLY backend) — but the scaling
    benchmark is defined on the 8-virtual-device CPU mesh. A child process
    pinned to JAX_PLATFORMS=cpu always has that mesh available. Pass the
    child's stdout (the metric JSON line) straight through."""
    import subprocess

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "CALISCOPE_BENCH_FORCE_CPU": "1",
        "CALISCOPE_BENCH_ONLY": "scaling",
        "CALISCOPE_PLATFORM_SETTLED": "1",
    })
    env.pop("JAX_COMPILATION_CACHE_DIR", None)  # child re-keys by platform
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        capture_output=True, text=True,
        timeout=int(os.environ.get("CALISCOPE_BENCH_SECTION_TIMEOUT", 1200)),
    )
    emitted = False
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
            emitted = True
    if not emitted:
        _log(f"scaling subprocess emitted nothing (rc={proc.returncode}): {proc.stderr[-400:]}")
    return emitted


def main():
    only = os.environ.get("CALISCOPE_BENCH_ONLY", "").split(",") if os.environ.get("CALISCOPE_BENCH_ONLY") else None

    if os.environ.get("CALISCOPE_BENCH_FORCE_CPU"):
        # Child of _scaling_subprocess (or an explicit-CPU invocation): skip
        # the device probe entirely and pin the CPU backend before jax init.
        # Pin the env var BEFORE finalizing the cache dir so the cache key
        # matches the pinned platform — an 'auto'-keyed cache could load
        # plugin-baked entries across the machine-feature boundary the
        # comment above _finalize_cache_dir warns about.
        os.environ["JAX_PLATFORMS"] = "cpu"
        _finalize_cache_dir()
        import jax

        jax.config.update("jax_platforms", "cpu")
    # The tunneled TPU plugin's registration name has changed across rounds
    # (axon -> tpu) and its compile service can wedge for hours, so the
    # ambient JAX_PLATFORMS cannot be trusted: probe candidates out of
    # process and adopt the first that executes a real op, else pin CPU.
    elif not _load_device_probe().apply_resolved_platform(logger=_log):
        _log("NO WORKING ACCELERATOR (wedged tunnel/compile service or renamed plugin); "
             "forcing CPU — TPU-named metrics below are CPU-fallback measurements")
        _finalize_cache_dir()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        _finalize_cache_dir()

    def want(name):
        return only is None or name in only

    if "--profile" in sys.argv:
        data = _synth_problem()
        if "--sparse" in sys.argv:
            layouts = ["sparse"]
        elif "--dense" in sys.argv:
            layouts = ["dense"]
        else:
            layouts = ["dense", "sparse"]
        for layout in layouts:
            profile_iteration(*data, layout=layout)
        return

    if want("detect"):
        with _section_guard("detect", int(os.environ.get("CALISCOPE_BENCH_SECTION_TIMEOUT", 1200))):
            _log("detection benchmark")
            ours_fps, compute_fps, cv_fps = bench_detect()
            _emit("detect_frames_per_sec_720p", ours_fps, "frames/s", ours_fps / cv_fps)
            detect_roof = {}
            try:
                from tools.roofline import detect_roofline

                detect_roof = detect_roofline(DETECT_WH[1], DETECT_WH[0], 1.0 / compute_fps)
            except Exception as e:
                _log(f"detect roofline skipped: {e}")
            _emit(
                "detect_frames_per_sec_720p_compute_bound", compute_fps, "frames/s",
                compute_fps / cv_fps, **detect_roof,
            )

    data = None
    if want("scaling"):
        with _section_guard("scaling", int(os.environ.get("CALISCOPE_BENCH_SECTION_TIMEOUT", 1200))):
            import jax

            try:
                n_cpu = len(jax.devices("cpu"))
            except RuntimeError:
                n_cpu = 0
            if n_cpu >= 8:
                data = _synth_problem()
                _log("scaling benchmark (virtual CPU mesh)")
                ratios, med, samples = bench_scaling(*data)
                if ratios:
                    retained_pct = 100.0 * float(np.median(ratios))
                    spread = {
                        "ratio_min_pct": round(100.0 * min(ratios), 1),
                        "ratio_max_pct": round(100.0 * max(ratios), 1),
                        "reps": len(ratios),
                        "iters_per_rep": SCALING_ITERS,
                        "median_iter_per_s_by_devices": {str(k): round(v, 3) for k, v in med.items()},
                    }
                    _emit(
                        "ba_shard_8dev_throughput_retained", retained_pct, "%",
                        retained_pct / 80.0, **spread,
                    )
            else:
                # TPU plugin owns this process: the CPU mesh only exists in a
                # CPU-pinned child interpreter.
                _log("scaling: no in-process CPU mesh; delegating to CPU subprocess")
                _scaling_subprocess()

    if want("ba"):
        if data is None:
            _log("synthesizing problem")
            data = _synth_problem()
        _log("benching ours")
        ours, cost = bench_ours(*data)
        _log(f"ours {ours['production']:.3f}s/iter (sparse layout {ours['sparse_layout']:.3f}); benching reference proxy")
        ref_s = min(bench_reference_equivalent(*data), PINNED_REFERENCE_S)
        _log(f"reference proxy {ref_s:.3f}s/iter (pinned idle-host floor {PINNED_REFERENCE_S})")
        roofline = {}
        try:
            from tools.roofline import lm_iteration_roofline

            roofline = lm_iteration_roofline(
                N_OBS, N_POINTS, N_CAMERAS, ours["production"], dense_grid_points=None,
            )
        except Exception as e:  # roofline is reporting-only; never sink the metric
            _log(f"roofline computation skipped: {e}")
        _emit(
            "ba_lm_iterations_per_sec_141k_obs_sparse_layout", 1.0 / ours["sparse_layout"],
            "iter/s", ref_s / ours["sparse_layout"],
        )
        # HEADLINE (last line): the production configuration — the dense
        # (P, C) layout CaptureVolume.optimize() picks at this scale.
        _emit(
            "ba_lm_iterations_per_sec_141k_obs", 1.0 / ours["production"], "iter/s",
            ref_s / ours["production"], **roofline,
        )


if __name__ == "__main__":
    main()
