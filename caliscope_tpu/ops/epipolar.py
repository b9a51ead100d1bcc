"""Essential-matrix estimation + RANSAC + pose recovery in pure JAX.

Replaces cv2.findEssentialMat / cv2.recoverPose / cv2.solvePnPRansac
(reference src/caliscope/core/bootstrap_pose/epipolar_pose_builder.py:110-233)
with fixed-iteration, vmapped hypothesize-and-verify:

- `essential_ransac` — M simultaneous 8-point hypotheses (masked normalized
  DLT on random minimal samples, rank-2 projection), scored by Sampson
  distance, winner refit on its inliers. All M hypotheses evaluate in one
  batched program — the classic sequential RANSAC loop becomes a vmap.
- `recover_pose` — E -> 4 (R, t) candidates, cheirality vote by two-view
  midpoint triangulation, batched over candidates.
- `pnp_ransac` — 6-point DLT hypotheses + damped-GN polish on inliers.

Inputs are normalized undistorted coordinates (K = I), matching the
reference's per-camera pre-undistortion strategy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from caliscope_tpu.ops.lie import so3_log
from caliscope_tpu.ops.pnp import projection_dlt, refine_pose_gn
from caliscope_tpu.ops.projection import project_normalized
from caliscope_tpu.ops.triangulate import triangulate_dlt


def _eight_point(xa, xb, w):
    """Masked/weighted 8-point algorithm. xa, xb: (..., N, 2) normalized
    coords; w: (..., N) weights. Returns E (..., 3, 3), rank-2 projected."""
    xa1 = jnp.concatenate([xa, jnp.ones_like(xa[..., :1])], axis=-1)
    xb1 = jnp.concatenate([xb, jnp.ones_like(xb[..., :1])], axis=-1)
    # rows: kron(xb, xa) -> [xb_i * xa_j] flattened, E as 9-vector (row-major)
    A = (xb1[..., :, None] * xa1[..., None, :]).reshape(xa.shape[:-1] + (9,))
    A = A * w[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[..., :, 0].reshape(vecs.shape[:-2] + (3, 3))
    # rank-2 projection with equal leading singular values
    U, S, Vt = jnp.linalg.svd(E)
    s = 0.5 * (S[..., 0] + S[..., 1])
    S2 = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return (U * S2[..., None, :]) @ Vt


def sampson_distance(E, xa, xb):
    """Squared Sampson distance per correspondence (normalized units)."""
    xa1 = jnp.concatenate([xa, jnp.ones_like(xa[..., :1])], axis=-1)
    xb1 = jnp.concatenate([xb, jnp.ones_like(xb[..., :1])], axis=-1)
    Ex = jnp.einsum("...ij,...nj->...ni", E, xa1)  # (..., N, 3)
    Etxp = jnp.einsum("...ji,...nj->...ni", E, xb1)
    num = jnp.einsum("...ni,...ni->...n", xb1, Ex) ** 2
    den = Ex[..., 0] ** 2 + Ex[..., 1] ** 2 + Etxp[..., 0] ** 2 + Etxp[..., 1] ** 2
    return num / jnp.maximum(den, 1e-18)


def essential_ransac(xa, xb, mask, threshold: float, n_iters: int = 256, seed: int = 0):
    """Fixed-iteration vmapped RANSAC for the essential matrix.

    Args:
        xa, xb: (N, 2) normalized correspondences (padded rows allowed).
        mask:   (N,) validity.
        threshold: inlier gate on sqrt(Sampson) in normalized units.
        n_iters: hypothesis count (all evaluated in one batch).

    Returns (E (3,3), inliers (N,) bool, n_inliers).
    """
    N = xa.shape[0]
    key = jax.random.PRNGKey(seed)
    w_valid = mask.astype(xa.dtype)
    # sample 8 indices per hypothesis, biased to valid rows via gumbel trick
    logits = jnp.where(mask, 0.0, -1e9)
    keys = jax.random.split(key, n_iters)

    def hypothesis(k):
        g = jax.random.gumbel(k, (N,)) + logits
        idx = jax.lax.top_k(g, 8)[1]
        E = _eight_point(xa[idx], xb[idx], jnp.ones((8,), xa.dtype))
        d2 = sampson_distance(E, xa, xb)
        inl = (d2 < threshold**2) & mask
        return E, jnp.sum(inl)

    Es, scores = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    E_best = Es[best]
    inl = (sampson_distance(E_best, xa, xb) < threshold**2) & mask
    # refit on inliers (weighted full 8-point)
    E_refit = _eight_point(xa, xb, inl.astype(xa.dtype))
    d2 = sampson_distance(E_refit, xa, xb)
    inl2 = (d2 < threshold**2) & mask
    use_refit = jnp.sum(inl2) >= jnp.sum(inl)
    E_final = jnp.where(use_refit, E_refit, E_best)
    inl_final = jnp.where(use_refit, inl2, inl)
    return E_final, inl_final, jnp.sum(inl_final)


def decompose_essential(E):
    """E -> (R1, R2, t) with ||t|| = 1 (Hartley-Zisserman)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    d = jnp.linalg.det(U @ Vt)
    Vt = Vt * jnp.where(d < 0, -1.0, 1.0)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return R1, R2, t


def _cheirality_count(R, t, xa, xb, mask):
    """Positive-depth count for pose (R, t) over masked correspondences."""
    P = jnp.zeros((2, 3, 4), xa.dtype)
    P = P.at[0, :3, :3].set(jnp.eye(3, dtype=xa.dtype))
    P = P.at[1, :3, :3].set(R)
    P = P.at[1, :3, 3].set(t)
    N = xa.shape[0]
    Pb = jnp.broadcast_to(P, (N, 2, 3, 4))
    xn = jnp.stack([xa, xb], axis=1)  # (N,2,2)
    m2 = jnp.broadcast_to(mask[:, None], (N, 2))
    X = triangulate_dlt(Pb, xn, m2)  # (N,3)
    za = X[:, 2]
    zb = jnp.einsum("j,nj->n", R[2], X) + t[2]
    return jnp.sum((za > 0) & (zb > 0) & mask), X


def recover_pose(E, xa, xb, mask):
    """Choose the (R, t) candidate with the best cheirality vote.

    Returns (R, t, cheirality_inlier_mask) — mirrors cv2.recoverPose.
    """
    R1, R2, t = decompose_essential(E)
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])

    def score(R, tt):
        n, _ = _cheirality_count(R, tt, xa, xb, mask)
        return n

    counts = jax.vmap(score)(cands_R, cands_t)
    best = jnp.argmax(counts)
    R_best, t_best = cands_R[best], cands_t[best]
    _, X = _cheirality_count(R_best, t_best, xa, xb, mask)
    za = X[:, 2]
    zb = jnp.einsum("j,nj->n", R_best[2], X) + t_best[2]
    cheir = (za > 0) & (zb > 0) & mask
    return R_best, t_best, cheir


def pnp_ransac(obj_pts, img_xn, mask, threshold: float, n_iters: int = 128, seed: int = 0, gn_iters: int = 10):
    """Robust resection: 6-point DLT hypotheses + GN polish on the consensus.

    Returns (rvec, tvec, inliers (N,), median_err over valid rows).
    """
    N = obj_pts.shape[0]
    key = jax.random.PRNGKey(seed)
    logits = jnp.where(mask, 0.0, -1e9)
    keys = jax.random.split(key, n_iters)

    def hypothesis(k):
        g = jax.random.gumbel(k, (N,)) + logits
        idx = jax.lax.top_k(g, 6)[1]
        rv, tv = projection_dlt(obj_pts[idx], img_xn[idx], jnp.ones((6,), obj_pts.dtype))
        uv = project_normalized(obj_pts, rv, tv)
        err = jnp.linalg.norm(uv - img_xn, axis=-1)
        inl = (err < threshold) & mask
        return rv, tv, jnp.sum(inl)

    rvs, tvs, scores = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    rv0, tv0 = rvs[best], tvs[best]
    uv = project_normalized(obj_pts, rv0, tv0)
    inl = (jnp.linalg.norm(uv - img_xn, axis=-1) < threshold) & mask
    theta = refine_pose_gn(obj_pts, img_xn, inl.astype(obj_pts.dtype), rv0, tv0, iters=gn_iters)
    rvec, tvec = theta[:3], theta[3:]
    uv = project_normalized(obj_pts, rvec, tvec)
    err = jnp.linalg.norm(uv - img_xn, axis=-1)
    inl_final = (err < threshold) & mask
    valid_err = jnp.where(mask, err, jnp.nan)
    med = jnp.nanmedian(valid_err)
    return rvec, tvec, inl_final, med
