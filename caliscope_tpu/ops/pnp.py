"""Batched PnP (camera-to-object resection) in pure JAX.

Replaces the reference's per-item cv2.solvePnP stack (IPPE for planar boards,
SQPNP for non-planar, ITERATIVE fallback — reference
src/caliscope/core/bootstrap_pose/pose_network_builder.py:273-321). The
reference's hot loop #3 runs thousands of tiny PnPs sequentially; here every
(camera, sync, object) group solves in ONE vmapped call on padded blocks:

  init  — planar: normalized-DLT homography -> pose-from-homography;
          non-planar: 11-parameter DLT of the projection matrix;
          both branches are computed and the planarity mask selects.
  refine— damped Gauss-Newton on normalized reprojection (fixed iterations,
          fori_loop, jacfwd Jacobian), which reaches the same optimum as
          OpenCV's ITERATIVE refinement.

All inputs are in *normalized undistorted* coordinates (K = I), matching the
reference's pre-undistort strategy (pose_network_builder.py:211-240).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from caliscope_tpu.ops.lie import so3_exp, so3_log
from caliscope_tpu.ops.projection import project_normalized


def _hartley_normalize(pts, mask):
    """Similarity-normalize 2D points to zero mean / sqrt(2) RMS. Returns
    (pts_norm, T (3,3)) with homogeneous transform T mapping raw -> norm."""
    w = mask.astype(pts.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(pts * w, axis=-2, keepdims=True) / n
    centered = (pts - mean) * w
    rms = jnp.sqrt(jnp.maximum(jnp.sum(centered * centered, axis=(-2, -1), keepdims=True) / n, 1e-18))
    s = jnp.sqrt(2.0) / rms[..., 0]
    pts_n = centered * s[..., None, :]
    sx = s[..., 0]
    T = jnp.zeros(pts.shape[:-2] + (3, 3), pts.dtype)
    T = T.at[..., 0, 0].set(sx)
    T = T.at[..., 1, 1].set(sx)
    T = T.at[..., 2, 2].set(1.0)
    T = T.at[..., 0, 2].set(-sx * mean[..., 0, 0])
    T = T.at[..., 1, 2].set(-sx * mean[..., 0, 1])
    return pts_n, T


def homography_dlt(src, dst, mask):
    """Masked planar homography via normalized DLT.

    src, dst: (..., K, 2); mask: (..., K). Returns H (..., 3, 3) with
    dst ~ H @ src (homogeneous).
    """
    src_n, T_s = _hartley_normalize(src, mask)
    dst_n, T_d = _hartley_normalize(dst, mask)
    x, y = src_n[..., 0], src_n[..., 1]
    u, v = dst_n[..., 0], dst_n[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # rows: [-x,-y,-1, 0,0,0, ux,uy,u] and [0,0,0, -x,-y,-1, vx,vy,v]
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2) * jnp.concatenate([mask, mask], axis=-1).astype(src.dtype)[..., None]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # Denormalize: H = T_d^-1 Hn T_s
    H = jnp.linalg.solve(T_d, Hn @ T_s)
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1e-12, H[..., 2:3, 2:3])


def _orthonormalize(M):
    """Nearest rotation matrix (SVD, det +1)."""
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    return (U * D[..., None, :]) @ Vt


def pose_from_homography(H):
    """H maps object-plane (x, y, 1) -> normalized image coords; recover
    (rvec, tvec) with R = [r1 r2 r1xr2] orthonormalized (Zhang 2000)."""
    h1, h2, h3 = H[..., :, 0], H[..., :, 1], H[..., :, 2]
    lam = 2.0 / jnp.maximum(
        jnp.linalg.norm(h1, axis=-1) + jnp.linalg.norm(h2, axis=-1), 1e-12
    )
    # Sign: object must sit in front of the camera (positive depth) — flip if
    # the projected translation depth is negative.
    sign = jnp.where(h3[..., 2] * lam < 0, -1.0, 1.0)
    lam = lam * sign
    r1 = h1 * lam[..., None]
    r2 = h2 * lam[..., None]
    r3 = jnp.cross(r1, r2)
    R = _orthonormalize(jnp.stack([r1, r2, r3], axis=-1))
    t = h3 * lam[..., None]
    return so3_log(R), t


def projection_dlt(obj_pts, img_xn, mask):
    """Non-planar init: DLT for the 3x4 projection matrix P with
    img ~ P @ [X;1], then factor P -> (rvec, t). Needs >= 6 points."""
    X, Y, Z = obj_pts[..., 0], obj_pts[..., 1], obj_pts[..., 2]
    u, v = img_xn[..., 0], img_xn[..., 1]
    zero = jnp.zeros_like(X)
    one = jnp.ones_like(X)
    r1 = jnp.stack([X, Y, Z, one, zero, zero, zero, zero, -u * X, -u * Y, -u * Z, -u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, zero, X, Y, Z, one, -v * X, -v * Y, -v * Z, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2) * jnp.concatenate([mask, mask], axis=-1).astype(obj_pts.dtype)[..., None]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    # Scale/sign: ||third row of R|| = 1 and mean depth positive.
    scale = 1.0 / jnp.maximum(jnp.linalg.norm(P[..., 2, :3], axis=-1), 1e-12)
    w = mask.astype(obj_pts.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    mean_obj = jnp.sum(obj_pts * w[..., None], axis=-2) / n[..., None]
    depth = jnp.einsum("...j,...j->...", P[..., 2, :3], mean_obj) + P[..., 2, 3]
    sign = jnp.where(depth * scale < 0, -1.0, 1.0)
    P = P * (scale * sign)[..., None, None]
    R = _orthonormalize(P[..., :3, :3])
    t = P[..., :3, 3]
    return so3_log(R), t


def refine_pose_gn(obj_pts, img_xn, mask, rvec0, tvec0, iters: int = 12, damping: float = 1e-6):
    """Damped Gauss-Newton refinement of (rvec, t) on normalized reprojection.

    Batched over leading axes; fixed iteration count (lax.fori_loop).
    """
    w = mask.astype(obj_pts.dtype)

    def residuals(theta):
        uv = project_normalized(obj_pts, theta[..., :3], theta[..., 3:])
        return ((uv - img_xn) * w[..., None]).reshape(obj_pts.shape[:-2] + (-1,))

    def body(_, theta):
        r = residuals(theta)
        J = jax.jacfwd(lambda th: residuals(th))(theta) if theta.ndim == 1 else None
        # batched jacobian via vmap happens at call site; here theta is 1D
        JtJ = J.T @ J + damping * jnp.eye(6, dtype=theta.dtype)
        g = J.T @ r
        step = jnp.linalg.solve(JtJ, g)
        return theta - step

    theta0 = jnp.concatenate([rvec0, tvec0], axis=-1)
    if theta0.ndim == 1:
        return jax.lax.fori_loop(0, iters, body, theta0)
    # batched: vmap the single-item refiner
    flat = theta0.reshape(-1, 6)
    obj_flat = obj_pts.reshape((-1,) + obj_pts.shape[-2:])
    img_flat = img_xn.reshape((-1,) + img_xn.shape[-2:])
    mask_flat = mask.reshape(-1, mask.shape[-1])

    def solve_one(o, i, m, th):
        return refine_pose_gn(o, i, m, th[:3], th[3:], iters, damping)

    out = jax.vmap(solve_one)(obj_flat, img_flat, mask_flat, flat)
    return out.reshape(theta0.shape)


def solve_pnp_batch(obj_pts, img_xn, mask, planar_tol: float = 1e-6, iters: int = 12):
    """Solve PnP for a batch of groups.

    Args:
        obj_pts: (G, K, 3) object-frame points (padded).
        img_xn:  (G, K, 2) normalized undistorted observations.
        mask:    (G, K) validity.

    Returns:
        rvec (G,3), tvec (G,3), rms (G,) masked normalized reprojection RMSE,
        n_points (G,).

    Planarity is detected per group from the object points' z-extent after
    centering (boards are defined with z approx 0; two-sided boards with a
    back face at z = thickness are non-planar and take the DLT branch).
    """
    w = mask.astype(obj_pts.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    mean = jnp.sum(obj_pts * w[..., None], axis=-2) / n[..., None]
    centered = (obj_pts - mean[..., None, :]) * w[..., None]
    # planar iff all points lie in a plane: smallest eigenvalue of scatter ~ 0
    scatter = jnp.einsum("...ki,...kj->...ij", centered, centered)
    eigvals = jnp.linalg.eigvalsh(scatter)
    planar = eigvals[..., 0] < planar_tol * jnp.maximum(eigvals[..., 2], 1e-12)

    # Planar branch (use local plane coords: points' xy after centering —
    # valid because boards are built in the z=0 plane; for generality project
    # onto the two principal axes of the scatter).
    _, eigvecs = jnp.linalg.eigh(scatter)
    axes = eigvecs[..., :, 1:]  # (G,3,2) two principal in-plane axes
    # ensure right-handed plane basis (normal = axis1 x axis2 consistent)
    plane_xy = jnp.einsum("...kj,...ji->...ki", centered, axes)
    H = homography_dlt(plane_xy, img_xn, mask)
    rvec_p, t_p = pose_from_homography(H)
    # Convert plane-frame pose back to object frame: X_obj = mean + axes @ x_plane
    # x_cam = R_plane @ x_plane + t_plane; x_plane = axes^T (X_obj - mean)
    R_plane = so3_exp(rvec_p)
    normal = jnp.cross(axes[..., :, 0], axes[..., :, 1])
    basis = jnp.concatenate([axes, normal[..., :, None]], axis=-1)  # (G,3,3) plane->obj (right-handed)
    R_obj_p = R_plane @ jnp.swapaxes(basis, -1, -2)
    t_obj_p = t_p - jnp.einsum("...ij,...j->...i", R_obj_p, mean)
    rvec_planar = so3_log(_orthonormalize(R_obj_p))

    # Non-planar branch
    rvec_np, t_np = projection_dlt(obj_pts, img_xn, mask)

    rvec0 = jnp.where(planar[..., None], rvec_planar, rvec_np)
    tvec0 = jnp.where(planar[..., None], t_obj_p, t_np)

    # Planar two-fold (IPPE) ambiguity: under noise an oblique planar target
    # admits a second pose whose plane normal is the REFLECTION of the first
    # about the line of sight (Schweighofer & Pinz). Refine from BOTH lobes
    # and keep the lower-error optimum — the batched equivalent of
    # cv2.SOLVEPNP_IPPE's two analytic solutions.
    R0 = so3_exp(rvec0)
    n_cam = R0[..., :, 2]  # plane normal in camera frame (object e_z)
    c_cam = tvec0 + jnp.einsum("...ij,...j->...i", R0, mean)  # object centroid
    v_hat = c_cam / jnp.maximum(jnp.linalg.norm(c_cam, axis=-1, keepdims=True), 1e-9)
    n_ref = 2.0 * jnp.sum(n_cam * v_hat, axis=-1, keepdims=True) * v_hat - n_cam
    axis = jnp.cross(n_cam, n_ref)
    sin_a = jnp.linalg.norm(axis, axis=-1)
    cos_a = jnp.clip(jnp.sum(n_cam * n_ref, axis=-1), -1.0, 1.0)
    ang = jnp.arctan2(sin_a, cos_a)
    axis_u = axis / jnp.maximum(sin_a[..., None], 1e-9)
    R_delta = so3_exp(axis_u * ang[..., None])
    rvec0_b = so3_log(R_delta @ R0)

    def _refine_and_score(rv, tv):
        th = refine_pose_gn(obj_pts, img_xn, mask, rv, tv, iters=iters)
        uv = project_normalized(obj_pts, th[..., None, :3], th[..., None, 3:])
        err2 = jnp.sum((uv - img_xn) ** 2, axis=-1) * w
        return th, jnp.sqrt(jnp.sum(err2, axis=-1) / n)

    theta_a, rms_a = _refine_and_score(rvec0, tvec0)
    theta_b, rms_b = _refine_and_score(rvec0_b, tvec0)
    use_b = planar & (rms_b < rms_a)
    theta = jnp.where(use_b[..., None], theta_b, theta_a)
    rms = jnp.where(use_b, rms_b, rms_a)
    return theta[..., :3], theta[..., 3:], rms, jnp.sum(mask, axis=-1)
