"""SO(3)/SE(3) operations: exponential/log maps, quaternions, composition.

TPU-native replacement for the reference's cv2.Rodrigues and
scipy.spatial.transform.Rotation usage (reference:
src/caliscope/cameras/camera_array.py:121-135,
src/caliscope/core/bootstrap_pose/pose_network_builder.py:416).

All functions are branch-free (jnp.where with safe denominators) so they are
jit/vmap-safe and differentiable, including at the theta -> 0 singularity.
Convention: rotations are world->camera matrices R with x_cam = R @ X + t,
matching the reference's CameraData.transformation.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _safe_norm(v, axis=-1, keepdims=False):
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, _EPS))


def skew(v):
    """(...,3) -> (...,3,3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(rvec):
    """Rodrigues vector (...,3) -> rotation matrix (...,3,3).

    Uses the Taylor-safe form sin(t)/t and (1-cos(t))/t^2 so gradients are
    finite at t=0.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos t)/t^2 with series fallback
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    K = skew(rvec)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a * K + b * (K @ K)


def quat_from_matrix(R):
    """Rotation matrix (...,3,3) -> unit quaternion (...,4) [w,x,y,z].

    Branchless Shepperd-style: computes all four candidate quaternions and
    selects the numerically best by largest pivot (vmap/jit safe, robust near
    theta = pi where the classic trace formula fails).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 pivot
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4cand,4comp)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32) * jnp.ones((1, 4), jnp.int32), axis=-2)[
        ..., 0, :
    ]
    q = q / _safe_norm(q, keepdims=True)
    # Canonicalize sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def matrix_from_quat(q):
    """Unit quaternion (...,4) [w,x,y,z] -> rotation matrix (...,3,3)."""
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
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def so3_log(R):
    """Rotation matrix (...,3,3) -> Rodrigues vector (...,3).

    Goes through the quaternion (robust at theta near 0 and pi):
    rvec = 2 * atan2(|v|, w) * v/|v|.
    """
    q = quat_from_matrix(R)
    w = q[..., 0]
    v = q[..., 1:]
    vnorm = _safe_norm(v)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < 1e-8
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / vnorm)
    return v * scale[..., None]


def rotation_geodesic_angle(R_a, R_b):
    """Geodesic angle (radians) between two rotations, batched.

    Parity with the reference's rotation-outlier metric
    (pose_network_builder.py:331 uses angle of R_a R_b^T).
    """
    R_rel = R_a @ jnp.swapaxes(R_b, -1, -2)
    cos = (jnp.trace(R_rel, axis1=-2, axis2=-1) - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def quaternion_average(quats, weights=None):
    """Average rotations by the eigenvector method (Markley et al. 2007).

    quats: (N,4) [w,x,y,z]; returns (4,). Sign-invariant: builds M = sum w_i
    q_i q_i^T and takes the principal eigenvector — the reference's
    quaternion_average (pose_network_builder.py:416) does the same via numpy.
    """
    if weights is None:
        weights = jnp.ones(quats.shape[0], dtype=quats.dtype)
    M = jnp.einsum("n,ni,nj->ij", weights, quats, quats)
    _, vecs = jnp.linalg.eigh(M)
    q = vecs[:, -1]
    return q * jnp.where(q[0] < 0, -1.0, 1.0)


def se3_matrix(R, t):
    """(...,3,3),(...,3) -> (...,4,4) homogeneous transform."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def se3_compose(R_ab, t_ab, R_bc, t_bc):
    """Compose T_ab (x_a = R_ab x_b + t_ab) with T_bc -> T_ac."""
    return R_ab @ R_bc, (R_ab @ t_bc[..., None])[..., 0] + t_ab


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_apply(R, t, X):
    """Apply x' = R @ X + t. X: (...,3) broadcastable against R (...,3,3)."""
    return jnp.einsum("...ij,...j->...i", R, X) + t
