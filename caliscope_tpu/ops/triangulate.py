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


def triangulate_dlt(P, xn, mask):
    """Triangulate one 3D point per batch row from padded multi-view obs.

    Args:
        P:    (..., V, 3, 4) normalized projection matrices [R|t] per view.
        xn:   (..., V, 2) undistorted *normalized* image coords per view.
        mask: (..., V) boolean/float validity per view.

    Returns:
        xyz: (..., 3) triangulated points (garbage where <2 valid views —
             callers filter with the mask count).

    Method: rows [x*P2 - P0; y*P2 - P1] per view; solve min |A h|, |h|=1 via
    eigh of the 4x4 normal matrix A^T A (cheap, batched, MXU/VPU friendly).
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
    return h[..., :3] / w


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
