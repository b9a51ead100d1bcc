"""Batched DLT triangulation (fixed-width, masked) — the TPU replacement for
the reference's group-by-camera-set numpy SVD batching
(reference src/caliscope/core/point_data.py:34-229).

TPU-first redesign: instead of ragged per-camera-set groups, every 3D point is
triangulated from a fixed-width (max_views) padded block of normalized
observations with a validity mask. Masked rows contribute zero rows to the
DLT system, which leaves the minimizer unchanged, so ONE statically-shaped
`eigh` batch handles every grouping — no host-side regrouping, no recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(P, xn, mask, refine_iters: int = 2):
    """Triangulate one 3D point per batch row from padded multi-view obs.

    Args:
        P:    (..., V, 3, 4) normalized projection matrices [R|t] per view.
        xn:   (..., V, 2) undistorted *normalized* image coords per view.
        mask: (..., V) boolean/float validity per view.
        refine_iters: Gauss-Newton polish steps after the DLT (see below).

    Returns:
        xyz: (..., 3) triangulated points (garbage where <2 valid views —
             callers filter with the mask count).

    Method: rows [x*P2 - P0; y*P2 - P1] per view; solve min |A h|, |h|=1 via
    eigh of the 4x4 normal matrix A^T A (cheap, batched, MXU/VPU friendly),
    then a few Gauss-Newton steps on the true reprojection objective.

    Why the polish: forming A^T A squares the system's condition number,
    which f64 absorbs but f32 does not — on the TPU (f32-only) the raw
    DLT carried visible conditioning noise on real 720p sessions. The GN
    polish is a batched elementwise 3x3 normal solve on the unsquared
    residuals; combined with the package's f32 matmul-precision default
    it makes on-chip triangulation match x64 (4_cam_recording
    committed-rig evaluation: 0.7998 px RMSE on TPU vs 0.7998 in x64;
    1.35/1.62 before these fixes). It also IMPROVES f64 results (0.833
    -> 0.800 px on the same rig): DLT minimizes algebraic error while GN
    minimizes the reprojection objective the reports measure.
    """
    x = xn[..., 0:1]  # (...,V,1)
    y = xn[..., 1:2]
    P0, P1, P2 = P[..., 0, :], P[..., 1, :], P[..., 2, :]  # (...,V,4)
    rows_x = x * P2 - P0
    rows_y = y * P2 - P1
    A = jnp.concatenate([rows_x, rows_y], axis=-2)  # (...,2V,4)
    m = jnp.concatenate([mask, mask], axis=-1).astype(A.dtype)[..., None]
    A = A * m
    AtA = jnp.einsum("...vi,...vj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]  # eigenvector of smallest eigenvalue
    w = h[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    X = h[..., :3] / w

    mf = mask.astype(A.dtype)
    for _ in range(refine_iters):
        q = jnp.einsum("...vij,...j->...vi", P[..., :, :3], X) + P[..., :, 3]  # (...,V,3)
        z = q[..., 2]
        safe = jnp.abs(z) > 1e-9
        inv_z = jnp.where(safe, 1.0 / jnp.where(safe, z, 1.0), 0.0)
        u = q[..., 0] * inv_z
        v = q[..., 1] * inv_z
        ru = (u - xn[..., 0]) * mf  # (...,V)
        rv = (v - xn[..., 1]) * mf
        # d u / dX = (P0[:3] - u * P2[:3]) / z   (same for v with P1)
        Ju = (P[..., 0, :3] - u[..., None] * P[..., 2, :3]) * inv_z[..., None] * mf[..., None]
        Jv = (P[..., 1, :3] - v[..., None] * P[..., 2, :3]) * inv_z[..., None] * mf[..., None]
        g = jnp.einsum("...vi,...v->...i", Ju, ru) + jnp.einsum("...vi,...v->...i", Jv, rv)
        H = jnp.einsum("...vi,...vj->...ij", Ju, Ju) + jnp.einsum("...vi,...vj->...ij", Jv, Jv)
        H = H + 1e-9 * jnp.eye(3, dtype=A.dtype)
        # closed-form 3x3 solve (batched adjugate; H is SPD + damped)
        a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
        d, e, f = H[..., 1, 1], H[..., 1, 2], H[..., 2, 2]
        c00 = d * f - e * e
        c01 = c * e - b * f
        c02 = b * e - c * d
        c11 = a * f - c * c
        c12 = b * c - a * e
        c22 = a * d - b * b
        det = a * c00 + b * c01 + c * c02
        ok = jnp.abs(det) > 1e-30
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        step = jnp.stack(
            [
                c00 * g[..., 0] + c01 * g[..., 1] + c02 * g[..., 2],
                c01 * g[..., 0] + c11 * g[..., 1] + c12 * g[..., 2],
                c02 * g[..., 0] + c12 * g[..., 1] + c22 * g[..., 2],
            ],
            axis=-1,
        ) * inv_det[..., None]
        X = X - step
    return X


def triangulate_groups(proj_mats, cam_idx, xn, point_idx, n_points, max_views):
    """Scatter flat observations into padded per-point view blocks, then DLT.

    Args:
        proj_mats: (C, 3, 4) normalized projection matrix per camera.
        cam_idx:   (N,) int camera index per observation.
        xn:        (N, 2) normalized undistorted coords per observation.
        point_idx: (N,) int 3D-point index per observation in [0, n_points).
        n_points:  static int number of 3D points.
        max_views: static int padding width (>= max cameras per point).

    Returns:
        xyz:     (n_points, 3)
        n_views: (n_points,) number of contributing observations per point.

    The slot assignment (rank of each obs within its point) is computed with a
    stable argsort — fully on-device, no host regrouping.
    """
    N = cam_idx.shape[0]
    order = jnp.argsort(point_idx, stable=True)
    sorted_pt = point_idx[order]
    # rank within group = position - first position of the group
    pos = jnp.arange(N)
    is_start = jnp.concatenate([jnp.ones(1, bool), sorted_pt[1:] != sorted_pt[:-1]])
    group_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    slot = pos - group_start
    # scatter into (n_points, max_views)
    valid = slot < max_views
    dest_pt = jnp.where(valid, sorted_pt, n_points)  # overflow rows dropped
    dest_slot = jnp.where(valid, slot, 0)
    xn_pad = jnp.zeros((n_points + 1, max_views, 2), xn.dtype).at[dest_pt, dest_slot].set(xn[order])
    cam_pad = jnp.zeros((n_points + 1, max_views), cam_idx.dtype).at[dest_pt, dest_slot].set(cam_idx[order])
    mask_pad = jnp.zeros((n_points + 1, max_views), bool).at[dest_pt, dest_slot].set(valid)
    xn_pad, cam_pad, mask_pad = xn_pad[:-1], cam_pad[:-1], mask_pad[:-1]
    P = proj_mats[cam_pad]  # (n_points, max_views, 3, 4)
    xyz = triangulate_dlt(P, xn_pad, mask_pad)
    n_views = jnp.sum(mask_pad, axis=-1)
    return xyz, n_views
