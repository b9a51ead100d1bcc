"""The single differentiable camera projection function and its inverse.

Replaces the reference's scattered cv2 entry points (cv2.projectPoints,
cv2.fisheye.projectPoints, cv2.undistortPoints, cv2.fisheye.undistortPoints —
see reference src/caliscope/core/reprojection.py:18-33,
src/caliscope/cameras/camera_array.py:135-174) with one JAX function family
from which residuals, Jacobians (via jacfwd), PnP and triangulation all
derive.

Camera models:
- Brown-Conrady (``fisheye=False``): distortions = [k1, k2, p1, p2, k3]
  (OpenCV layout). Shorter vectors are zero-padded.
- Fisheye equidistant (``fisheye=True``): distortions = [k1, k2, k3, k4],
  theta_d = theta * (1 + k1 t^2 + k2 t^4 + k3 t^6 + k4 t^8).

Intrinsics are passed as K (3,3); skew is ignored (reference never uses it).
All functions broadcast over leading axes and are jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_DIST_BROWN = 5
N_DIST_FISHEYE = 4


def pad_distortions(dist, fisheye: bool):
    """Zero-pad/truncate a distortion vector to the model's canonical length."""
    n = N_DIST_FISHEYE if fisheye else N_DIST_BROWN
    dist = jnp.atleast_1d(jnp.asarray(dist))
    k = dist.shape[-1]
    if k < n:
        pad = [(0, 0)] * (dist.ndim - 1) + [(0, n - k)]
        dist = jnp.pad(dist, pad)
    return dist[..., :n]


def _distort_brown(xn, dist):
    """Normalized undistorted (..., 2) -> normalized distorted (..., 2)."""
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def _distort_fisheye(xn, dist):
    """Equidistant model: normalized pinhole (..., 2) -> distorted (..., 2)."""
    k1, k2, k3, k4 = (dist[..., i] for i in range(4))
    x, y = xn[..., 0], xn[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = theta_d / r
    return xn * scale[..., None]


def distort_normalized(xn, dist, fisheye: bool):
    dist = pad_distortions(dist, fisheye)
    return _distort_fisheye(xn, dist) if fisheye else _distort_brown(xn, dist)


def normalized_to_pixels(xn, K):
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack([xn[..., 0] * fx + cx, xn[..., 1] * fy + cy], axis=-1)


def pixels_to_normalized(uv, K):
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def project_points(X, rvec, tvec, K, dist, fisheye: bool, min_depth: float = 1e-6):
    """World points (..., 3) -> pixel coords (..., 2).

    x_cam = R(rvec) @ X + t; perspective divide; distortion; K.
    Depth is clamped away from zero so the function (and its jacfwd) stays
    finite for points behind/at the camera — callers mask such observations.
    """
    from caliscope_tpu.ops.lie import so3_exp

    R = so3_exp(rvec)
    xc = jnp.einsum("...ij,...j->...i", R, X) + tvec
    z = xc[..., 2:3]
    z = jnp.where(jnp.abs(z) < min_depth, jnp.where(z < 0, -min_depth, min_depth), z)
    xn = xc[..., :2] / z
    xd = distort_normalized(xn, dist, fisheye)
    return normalized_to_pixels(xd, K)


def project_normalized(X, rvec, tvec, min_depth: float = 1e-6):
    """World points -> undistorted normalized image coords (pinhole, K=I)."""
    from caliscope_tpu.ops.lie import so3_exp

    R = so3_exp(rvec)
    xc = jnp.einsum("...ij,...j->...i", R, X) + tvec
    z = xc[..., 2:3]
    z = jnp.where(jnp.abs(z) < min_depth, jnp.where(z < 0, -min_depth, min_depth), z)
    return xc[..., :2] / z


def _undistort_brown_iter(xd, dist, iters: int):
    """Fixed-point inversion of the Brown model (OpenCV-style iteration)."""

    def body(_, xn):
        k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x_new = (xd[..., 0] - dx) / radial
        y_new = (xd[..., 1] - dy) / radial
        return jnp.stack([x_new, y_new], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xd)


def _undistort_fisheye_iter(xd, dist, iters: int):
    """Newton inversion of theta_d = theta * poly(theta^2); then scale by tan."""
    k1, k2, k3, k4 = (dist[..., i] for i in range(4))
    theta_d = jnp.sqrt(jnp.maximum(jnp.sum(xd * xd, axis=-1), 1e-18))

    def body(_, theta):
        t2 = theta * theta
        poly = 1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
        dpoly = theta * (2 * k1 + t2 * (4 * k2 + t2 * (6 * k3 + t2 * 8 * k4)))
        f = theta * poly - theta_d
        fp = poly + theta * dpoly
        return theta - f / jnp.where(jnp.abs(fp) < 1e-12, 1.0, fp)

    theta = jax.lax.fori_loop(0, iters, body, theta_d)
    scale = jnp.tan(theta) / theta_d
    return xd * scale[..., None]


def undistort_points(uv, K, dist, fisheye: bool, output: str = "normalized", iters: int = 20):
    """Remove lens distortion from pixel points (..., 2).

    output='normalized' (K=I plane, for triangulation/BA conditioning — see
    reference camera_array.py:137-151) or 'pixels' (reproject through K).
    """
    dist = pad_distortions(dist, fisheye)
    xd = pixels_to_normalized(uv, K)
    xn = _undistort_fisheye_iter(xd, dist, iters) if fisheye else _undistort_brown_iter(xd, dist, iters)
    if output == "normalized":
        return xn
    return normalized_to_pixels(xn, K)
