"""Similarity (sim(3)) transforms and Umeyama alignment.

Replacement for the reference's core/alignment.py (SimilarityTransform:13,
estimate_similarity_transform:84, apply_similarity_transform:155). Camera
extrinsics update rule is the subtle part and matches the reference exactly:
for a world-frame similarity X' = s R X + t, camera centers move as
C' = s R C + t while camera orientation updates as R_cam' = R_cam R^T —
scale must NOT enter the rotation (alignment.py:178-190).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SimilarityParams:
    """s, R (3,3), t (3,): X' = s * R @ X + t."""

    scale: float
    rotation: np.ndarray
    translation: np.ndarray

    def matrix(self) -> np.ndarray:
        m = np.eye(4)
        m[:3, :3] = self.scale * np.asarray(self.rotation)
        m[:3, 3] = np.asarray(self.translation)
        return m

    def inverse(self) -> "SimilarityParams":
        R = np.asarray(self.rotation)
        s = float(self.scale)
        Rt = R.T
        return SimilarityParams(1.0 / s, Rt, -Rt @ np.asarray(self.translation) / s)

    def apply(self, X):
        X = np.asarray(X)
        return (self.scale * (np.asarray(self.rotation) @ X.T)).T + np.asarray(self.translation)


def umeyama(src, dst, with_scale: bool = True):
    """Least-squares similarity aligning src -> dst (both (N,3)).

    Returns (s, R, t) with dst ~= s R src + t. Umeyama 1991 closed form with
    reflection guard; differentiable JAX implementation.
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    n = src.shape[0]
    cov = (dc.T @ sc) / n
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], src.dtype).at[2].set(d))
    R = U @ D @ Vt
    var_s = jnp.mean(jnp.sum(sc * sc, axis=1))
    if with_scale:
        s = jnp.sum(S * jnp.diag(D)) / var_s
    else:
        s = jnp.asarray(1.0, src.dtype)
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def apply_similarity_to_points(s, R, t, X):
    return s * jnp.einsum("ij,...j->...i", R, X) + t


def apply_similarity_to_extrinsics(s, R, t, R_cams, t_cams):
    """Update world->camera extrinsics for a world-frame similarity transform.

    Camera center C = -R_cam^T t_cam moves to C' = s R C + t;
    orientation R_cam' = R_cam R^T; then t_cam' = -R_cam' C'.
    """
    R_cams = jnp.asarray(R_cams)
    t_cams = jnp.asarray(t_cams)
    C = -jnp.einsum("...ji,...j->...i", R_cams, t_cams)
    C_new = s * jnp.einsum("ij,...j->...i", R, C) + t
    R_new = R_cams @ R.T
    t_new = -jnp.einsum("...ij,...j->...i", R_new, C_new)
    return R_new, t_new
