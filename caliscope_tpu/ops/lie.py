"""SO(3)/SE(3) operations: exponential/log maps, quaternions, composition.

TPU-native replacement for the reference's cv2.Rodrigues and
scipy.spatial.transform.Rotation usage (reference:
src/caliscope/cameras/camera_array.py:121-135,
src/caliscope/core/bootstrap_pose/pose_network_builder.py:416).

All functions are branch-free (where-selects with safe denominators) so they
are jit/vmap-safe and differentiable, including at the theta -> 0 singularity.
Convention: rotations are world->camera matrices R with x_cam = R @ X + t,
matching the reference's CameraData.transformation.

Array-namespace dispatch: every function runs under numpy when handed host
ndarrays and under jax.numpy otherwise (tracers, device arrays, lists). The
math is identical either way; the split exists because the pose-graph algebra
calls these with tiny per-pair arrays of data-dependent shape, and each eager
device call at a fresh shape costs an XLA trace/compile worth far more than
the flops. Host callers get numpy in -> numpy out with zero device traffic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def _ns(a):
    """numpy for host ndarrays, jax.numpy for everything else."""
    return np if isinstance(a, np.ndarray) else jnp


def _safe_norm(v, axis=-1, keepdims=False):
    xp = _ns(v)
    sq = xp.sum(v * v, axis=axis, keepdims=keepdims)
    return xp.sqrt(xp.maximum(sq, _EPS))


def skew(v):
    """(...,3) -> (...,3,3) cross-product matrix."""
    xp = _ns(v)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = xp.zeros_like(x)
    return xp.stack(
        [
            xp.stack([zero, -z, y], axis=-1),
            xp.stack([z, zero, -x], axis=-1),
            xp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(rvec):
    """Rodrigues vector (...,3) -> rotation matrix (...,3,3).

    Uses the Taylor-safe form sin(t)/t and (1-cos(t))/t^2 so gradients are
    finite at t=0.
    """
    xp = _ns(rvec)
    theta2 = xp.sum(rvec * rvec, axis=-1)[..., None, None]
    theta = xp.sqrt(xp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos t)/t^2 with series fallback
    a = xp.where(small, 1.0 - theta2 / 6.0, xp.sin(theta) / theta)
    b = xp.where(small, 0.5 - theta2 / 24.0, (1.0 - xp.cos(theta)) / xp.maximum(theta2, _EPS))
    K = skew(rvec)
    eye = xp.broadcast_to(xp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a * K + b * (K @ K)


def quat_from_matrix(R):
    """Rotation matrix (...,3,3) -> unit quaternion (...,4) [w,x,y,z].

    Branchless Shepperd-style: computes all four candidate quaternions and
    selects the numerically best by largest pivot (vmap/jit safe, robust near
    theta = pi where the classic trace formula fails).
    """
    xp = _ns(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 pivot
    qw = xp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = xp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = xp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = xp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = xp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    best = xp.argmax(pivots, axis=-1)
    cands = xp.stack([qw, qx, qy, qz], axis=-2)  # (...,4cand,4comp)
    idx = best[..., None, None].astype(xp.int32) * xp.ones((1, 4), xp.int32)
    q = xp.take_along_axis(cands, idx, axis=-2)[..., 0, :]
    q = q / _safe_norm(q, keepdims=True)
    # Canonicalize sign: w >= 0
    return q * xp.where(q[..., :1] < 0, -1.0, 1.0)


def matrix_from_quat(q):
    """Unit quaternion (...,4) [w,x,y,z] -> rotation matrix (...,3,3)."""
    xp = _ns(q)
    q = q / _safe_norm(q, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return xp.stack(
        [
            xp.stack([r00, r01, r02], axis=-1),
            xp.stack([r10, r11, r12], axis=-1),
            xp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def so3_log(R):
    """Rotation matrix (...,3,3) -> Rodrigues vector (...,3).

    Goes through the quaternion (robust at theta near 0 and pi):
    rvec = 2 * atan2(|v|, w) * v/|v|.
    """
    xp = _ns(R)
    q = quat_from_matrix(R)
    w = q[..., 0]
    v = q[..., 1:]
    vnorm = _safe_norm(v)
    theta = 2.0 * xp.arctan2(vnorm, w)
    small = vnorm < 1e-8
    scale = xp.where(small, 2.0 / xp.maximum(w, _EPS), theta / vnorm)
    return v * scale[..., None]


def rotation_geodesic_angle(R_a, R_b):
    """Geodesic angle (radians) between two rotations, batched.

    Parity with the reference's rotation-outlier metric
    (pose_network_builder.py:331 uses angle of R_a R_b^T).
    """
    xp = _ns(R_a)
    R_rel = R_a @ xp.swapaxes(R_b, -1, -2)
    cos = (xp.trace(R_rel, axis1=-2, axis2=-1) - 1.0) / 2.0
    return xp.arccos(xp.clip(cos, -1.0, 1.0))


def quaternion_average(quats, weights=None):
    """Average rotations by the eigenvector method (Markley et al. 2007).

    quats: (N,4) [w,x,y,z]; returns (4,). Sign-invariant: builds M = sum w_i
    q_i q_i^T and takes the principal eigenvector — the reference's
    quaternion_average (pose_network_builder.py:416) does the same via numpy.
    """
    xp = _ns(quats)
    if weights is None:
        weights = xp.ones(quats.shape[0], dtype=quats.dtype)
    M = xp.einsum("n,ni,nj->ij", weights, quats, quats)
    _, vecs = xp.linalg.eigh(M)
    q = vecs[:, -1]
    return q * xp.where(q[0] < 0, -1.0, 1.0)


def se3_matrix(R, t):
    """(...,3,3),(...,3) -> (...,4,4) homogeneous transform."""
    xp = _ns(R)
    batch = xp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = xp.broadcast_to(R, batch + (3, 3))
    t = xp.broadcast_to(t, batch + (3,))
    top = xp.concatenate([R, t[..., None]], axis=-1)
    bottom = xp.broadcast_to(xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,))
    return xp.concatenate([top, bottom[..., None, :]], axis=-2)


def se3_compose(R_ab, t_ab, R_bc, t_bc):
    """Compose T_ab (x_a = R_ab x_b + t_ab) with T_bc -> T_ac."""
    return R_ab @ R_bc, (R_ab @ t_bc[..., None])[..., 0] + t_ab


def se3_inverse(R, t):
    xp = _ns(R)
    Rt = xp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_apply(R, t, X):
    """Apply x' = R @ X + t. X: (...,3) broadcastable against R (...,3,3)."""
    xp = _ns(R)
    return xp.einsum("...ij,...j->...i", R, X) + t
