"""Intrinsic calibration: Zhang closed-form init + batched joint LM.

Replaces cv2.calibrateCamera / cv2.fisheye.calibrate (reference
src/caliscope/core/calibrate_intrinsics.py:89-171) with a TPU-native solver:

1. Per-frame planar homographies — one masked, batched DLT over all selected
   frames (ops/pnp.homography_dlt), not a per-frame loop.
2. Zhang (2000) closed-form K from the homography constraints (the B-matrix
   eigen problem), plus pose-from-homography per frame for extrinsic inits.
3. Joint Levenberg-Marquardt over [fx, fy, cx, cy, dist...] + 6 params/frame,
   pixel residuals, dense normal equations (dimension 9-or-8 + 6F stays tiny)
   — the whole refinement is one jitted lax.while_loop.

Both camera models: Brown-Conrady (5 coef) and fisheye-equidistant (4 coef).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from caliscope_tpu.ops.lie import so3_exp, so3_log
from caliscope_tpu.ops.pnp import homography_dlt, pose_from_homography
from caliscope_tpu.ops.projection import project_points


@dataclass
class IntrinsicSolveResult:
    K: np.ndarray  # (3,3)
    dist: np.ndarray  # (5,) brown / (4,) fisheye
    rvecs: np.ndarray  # (F,3) per-frame board->camera
    tvecs: np.ndarray  # (F,3)
    rmse: float  # pixel RMSE over used observations
    n_frames: int
    converged: bool
    n_iterations: int


def zhang_intrinsics_from_homographies(H: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Closed-form K from planar homographies (Zhang 2000).

    H: (F,3,3) board-plane -> pixel homographies; mask: (F,) valid frames.
    Solves V b = 0 for B = K^-T K^-1 (6-vector, symmetric), then factors K.
    Falls back to a centered-principal-point estimate if B is not positive
    definite (handled by the caller via nan checks).
    """

    def v_ij(H, i, j):
        return jnp.stack(
            [
                H[..., 0, i] * H[..., 0, j],
                H[..., 0, i] * H[..., 1, j] + H[..., 1, i] * H[..., 0, j],
                H[..., 1, i] * H[..., 1, j],
                H[..., 2, i] * H[..., 0, j] + H[..., 0, i] * H[..., 2, j],
                H[..., 2, i] * H[..., 1, j] + H[..., 1, i] * H[..., 2, j],
                H[..., 2, i] * H[..., 2, j],
            ],
            axis=-1,
        )

    v01 = v_ij(H, 0, 1)  # (F,6)
    v00 = v_ij(H, 0, 0)
    v11 = v_ij(H, 1, 1)
    V = jnp.concatenate([v01, v00 - v11], axis=0)  # (2F,6)
    m2 = jnp.concatenate([mask, mask], axis=0).astype(V.dtype)[:, None]
    V = V * m2
    _, vecs = jnp.linalg.eigh(V.T @ V)
    b = vecs[:, 0]
    B11, B12, B22, B13, B23, B33 = b
    # Closed-form factorization (Zhang appendix B)
    v0 = (B12 * B13 - B11 * B23) / (B11 * B22 - B12**2)
    lam = B33 - (B13**2 + v0 * (B12 * B13 - B11 * B23)) / B11
    alpha = jnp.sqrt(jnp.abs(lam / B11))
    beta = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12**2)))
    gamma = -B12 * alpha**2 * beta / lam
    u0 = gamma * v0 / beta - B13 * alpha**2 / lam
    K = jnp.array([[alpha, 0.0, u0], [0.0, beta, v0], [0.0, 0.0, 1.0]], H.dtype)
    return K


def _residuals(params, obj_pts, img_pts, mask, n_dist: int, fisheye: bool, fix_aspect: bool):
    """params = [fx, fy, cx, cy, dist(n_dist)] + per-frame [rvec(3), t(3)].
    Returns masked pixel residuals (F, K, 2)."""
    fx = params[0]
    fy = jnp.where(fix_aspect, params[0], params[1])
    cx, cy = params[2], params[3]
    dist = params[4 : 4 + n_dist]
    K = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], params.dtype)
    K = K.at[0, 0].set(fx).at[1, 1].set(fy).at[0, 2].set(cx).at[1, 2].set(cy)
    pose = params[4 + n_dist :].reshape(-1, 6)
    uv = project_points(
        obj_pts, pose[:, None, 0:3], pose[:, None, 3:6], K, dist, fisheye
    )
    return (uv - img_pts) * mask[..., None]


@partial(jax.jit, static_argnames=("n_dist", "fisheye", "fix_aspect", "max_iter"))
def _lm_refine(params0, obj_pts, img_pts, mask, n_dist, fisheye, fix_aspect, max_iter=300, robust_f=0.0):
    """LM over K + dist + per-frame poses; robust_f > 0 enables soft_l1 IRLS
    at that pixel scale (scipy least_squares convention: weighted residual
    r * (1 + |r|^2/f^2)^(-1/4), robust cost f^2 * 2(sqrt(1+z) - 1)), which
    downweights gross snap outliers without discarding edge coverage.
    robust_f = 0 keeps the exact quadratic cost (cv2.calibrateCamera parity).
    """
    robust_f = jnp.asarray(robust_f, params0.dtype)
    robust = robust_f > 0
    f2 = jnp.where(robust, robust_f**2, 1.0)

    # Frames with <4 valid corners (incl. all-masked padding frames from the
    # shape-bucketed caller) contribute zero residual rows, leaving their six
    # pose parameters unconstrained; a unit prior on exactly those diagonal
    # entries keeps the normal equations well-conditioned while their updates
    # stay zero (their gradient is zero).
    frame_ok = (jnp.sum(mask, axis=1) >= 4).astype(params0.dtype)
    prior = jnp.concatenate(
        [jnp.zeros(4 + n_dist, params0.dtype), jnp.repeat(1.0 - frame_ok, 6)]
    )

    def point_z(p):
        r = _residuals(p, obj_pts, img_pts, mask, n_dist, fisheye, fix_aspect)
        return r, jnp.sum(r**2, axis=-1) / f2  # (F,K)

    def cost_fn(p):
        r, z = point_z(p)
        robust_cost = jnp.sum(f2 * (jnp.sqrt(1.0 + z) - 1.0))
        return jnp.where(robust, robust_cost, 0.5 * jnp.sum(r**2))

    def flat_res(p):
        return _residuals(p, obj_pts, img_pts, mask, n_dist, fisheye, fix_aspect).ravel()

    def step(state):
        p, lam, cost, it, done = state
        r_pts, z = point_z(p)
        w = jnp.where(robust, (1.0 + z) ** -0.25, 1.0)[..., None]  # (F,K,1)
        r = (r_pts * w).ravel()
        J = jax.jacfwd(flat_res)(p) * jnp.broadcast_to(w, r_pts.shape).ravel()[:, None]
        g = J.T @ r
        H = J.T @ J
        D = jnp.maximum(jnp.diag(H), 1e-9)
        p_new = p - jnp.linalg.solve(H + lam * jnp.diag(D) + jnp.diag(prior), g)
        cost_new = cost_fn(p_new)
        accept = cost_new < cost
        lam = jnp.where(accept, lam * 0.35, lam * 4.0)
        p = jnp.where(accept, p_new, p)
        rel = (cost - cost_new) / jnp.maximum(cost, 1e-30)
        done = jnp.logical_and(accept, rel < 1e-10)
        cost = jnp.where(accept, cost_new, cost)
        return p, jnp.clip(lam, 1e-12, 1e8), cost, it + 1, done

    def cond(state):
        _p, _l, _c, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    state = (params0, jnp.asarray(1e-3, params0.dtype), cost_fn(params0), jnp.array(0), jnp.array(False))
    p, _lam, cost, it, done = jax.lax.while_loop(cond, step, state)
    return p, cost, it, done


def solve_intrinsics(
    obj_pts: np.ndarray,
    img_pts: np.ndarray,
    mask: np.ndarray,
    image_size: tuple[int, int],
    *,
    fisheye: bool = False,
    fix_aspect: bool = False,
    max_iter: int = 300,  # real sessions need ~120 LM iterations (60 truncated mid-descent)
    f_scale_px: float | None = None,
) -> IntrinsicSolveResult:
    """Calibrate K + distortion + per-frame poses from planar-target frames.

    Args:
        obj_pts: (F, K, 3) board-frame corner coords per frame (padded).
        img_pts: (F, K, 2) pixel observations (padded).
        mask:    (F, K) validity.
        image_size: (width, height) for the principal-point fallback.
        fisheye: equidistant 4-coef model instead of Brown 5-coef.
        f_scale_px: soft_l1 scale in pixels for robust refinement; None keeps
            the quadratic loss (cv2.calibrateCamera parity). The reported
            rmse is always the raw (unweighted) convention either way.

    Matches cv2.calibrateCamera's CALIB_USE_INTRINSIC_GUESS-from-Zhang
    behavior and RMSE convention (sqrt of mean squared point error).
    """
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # Bucket (frames, corners) to powers of two: sessions differ in frame
    # budget and board size, and the jitted LM would otherwise recompile per
    # dataset. All-masked padding frames are inert — zero residual rows plus
    # the unit pose prior in _lm_refine (see there).
    from caliscope_tpu.ops.bucket import bucket_size

    F_real, K_real = int(np.asarray(obj_pts).shape[0]), int(np.asarray(obj_pts).shape[1])
    Fb, Kb = bucket_size(F_real, floor=8), bucket_size(K_real, floor=8)
    obj_b = np.zeros((Fb, Kb, 3))
    obj_b[:F_real, :K_real] = obj_pts
    img_b = np.zeros((Fb, Kb, 2))
    img_b[:F_real, :K_real] = img_pts
    m_b = np.zeros((Fb, Kb), bool)
    m_b[:F_real, :K_real] = mask
    obj = jnp.asarray(obj_b, dtype)
    img = jnp.asarray(img_b, dtype)
    m = jnp.asarray(m_b, bool)
    F = Fb
    n_dist = 4 if fisheye else 5

    # 1. Batched homographies board-plane -> pixels
    H = homography_dlt(obj[..., :2], img, m)
    frame_ok = jnp.sum(m, axis=1) >= 4
    # padding/degenerate frames: a finite placeholder H keeps the pose init
    # NaN-free; their poses are inert in the LM either way
    H = jnp.where(frame_ok[:, None, None], H, jnp.eye(3, dtype=dtype))

    # 2. Zhang closed-form K (fallback: f = width, centered pp)
    K0 = zhang_intrinsics_from_homographies(H, frame_ok)
    w, h = image_size
    bad = jnp.logical_or(
        jnp.any(jnp.isnan(K0)),
        jnp.logical_or(K0[0, 0] <= 0, jnp.logical_or(K0[0, 0] > 50 * w, K0[1, 1] <= 0)),
    )
    K_fallback = jnp.array([[0.8 * w, 0, w / 2.0], [0, 0.8 * w, h / 2.0], [0, 0, 1.0]], dtype)
    K0 = jnp.where(bad, K_fallback, K0)

    # 3. Per-frame pose init from K^-1 H
    Hn = jnp.linalg.solve(K0[None].repeat(F, 0), H)
    rvec0, tvec0 = pose_from_homography(Hn)

    # 4. Joint LM
    params0 = jnp.concatenate(
        [
            jnp.array([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]], dtype),
            jnp.zeros(n_dist, dtype),
            jnp.concatenate([rvec0, tvec0], axis=1).ravel(),
        ]
    )
    robust_f = 0.0 if f_scale_px is None else float(f_scale_px)
    p, cost, it, done = _lm_refine(
        params0, obj, img, m.astype(dtype), n_dist, fisheye, fix_aspect, max_iter,
        robust_f=robust_f,
    )

    def plausible(params) -> bool:
        fx_, fy_, cx_, cy_ = (float(x) for x in np.asarray(params)[:4])
        return (
            0.1 * w <= fx_ <= 20 * w
            and 0.1 * w <= fy_ <= 20 * w
            and -0.5 * w <= cx_ <= 1.5 * w
            and -0.5 * h <= cy_ <= 1.5 * h
        )

    if not plausible(p):
        # Orientation-poor planar sessions admit absurd low-focal minima the
        # Zhang init can fall into; restart from the neutral fallback
        # intrinsics and keep whichever solution is physical (lower cost
        # breaks a tie between two physical solutions).
        Hn_fb = jnp.linalg.solve(K_fallback[None].repeat(F, 0), H)
        rvec_fb, tvec_fb = pose_from_homography(Hn_fb)
        params_fb = jnp.concatenate(
            [
                jnp.array([K_fallback[0, 0], K_fallback[1, 1], K_fallback[0, 2], K_fallback[1, 2]], dtype),
                jnp.zeros(n_dist, dtype),
                jnp.concatenate([rvec_fb, tvec_fb], axis=1).ravel(),
            ]
        )
        p2, cost2, it2, done2 = _lm_refine(
            params_fb, obj, img, m.astype(dtype), n_dist, fisheye, fix_aspect, max_iter,
            robust_f=robust_f,
        )
        if plausible(p2) or float(cost2) < float(cost):
            p, cost, it, done = p2, cost2, it2, done2

    r = np.asarray(_residuals(p, obj, img, m.astype(dtype), n_dist, fisheye, fix_aspect))
    n_obs = int(np.asarray(m).sum())
    rmse = float(np.sqrt(np.sum(r**2) / max(n_obs, 1)))

    p = np.asarray(p)
    K = np.array([[p[0], 0, p[2]], [0, p[0] if fix_aspect else p[1], p[3]], [0, 0, 1.0]])
    pose = p[4 + n_dist :].reshape(-1, 6)[:F_real]
    return IntrinsicSolveResult(
        K=K,
        dist=p[4 : 4 + n_dist].copy(),
        rvecs=pose[:, :3].copy(),
        tvecs=pose[:, 3:].copy(),
        rmse=rmse,
        n_frames=F_real,
        converged=bool(done),
        n_iterations=int(it),
    )
