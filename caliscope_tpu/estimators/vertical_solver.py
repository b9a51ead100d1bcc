"""Gravity-direction fit from a perspective up-field.

Parity: reference src/caliscope/estimators/vertical_solver.py:221
(fit_gravity — hand-rolled numpy LM with Huber loss and a spherical-manifold
parameterization). Here the same estimator is a jitted JAX LM, batched over
frames.

Model: for a pinhole camera with intrinsics K, the image-space "up" direction
at a pixel with normalized ray p = (x, y, 1) under camera-frame gravity g is
the projection derivative  d(x) ∝ (g_xy - p_xy * g_z)  (moving a world point
along -g changes its projection along this direction). The fit minimizes the
Huber-robustified angular misfit between that prediction and the observed
per-pixel up directions, over g on the unit sphere (2-parameter tangent
update, renormalized each step).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class GravityFit:
    gravity_cam: np.ndarray  # (3,) unit vector, camera frame (gravity points down)
    residual_deg: float  # robust mean angular residual
    inlier_fraction: float
    converged: bool


def _tangent_basis(g):
    a = jnp.where(jnp.abs(g[2]) < 0.9, jnp.array([0.0, 0.0, 1.0], g.dtype), jnp.array([1.0, 0.0, 0.0], g.dtype))
    t1 = jnp.cross(g, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(g, t1)
    return t1, t2


def _predicted_up(g, pn):
    """Image-space up direction (unnormalized) at normalized points pn (N,2)."""
    return jnp.stack([g[0] - pn[:, 0] * g[2], g[1] - pn[:, 1] * g[2]], axis=1)


def _residuals(g, pn, up_obs, weights):
    """Sine-of-angle residual between predicted and observed up directions."""
    pred = _predicted_up(g, pn)
    norm = jnp.maximum(jnp.linalg.norm(pred, axis=1), 1e-9)
    pred = pred / norm[:, None]
    cross = pred[:, 0] * up_obs[:, 1] - pred[:, 1] * up_obs[:, 0]
    return cross * weights


@partial(jax.jit, static_argnames=("iters",))
def _fit_one(pn, up_obs, weights, g0, huber_delta: float, iters: int = 30):
    def huber_w(r):
        a = jnp.abs(r)
        return jnp.where(a <= huber_delta, 1.0, huber_delta / jnp.maximum(a, 1e-12))

    def cost(g):
        r = _residuals(g, pn, up_obs, weights)
        a = jnp.abs(r)
        rho = jnp.where(a <= huber_delta, 0.5 * r**2, huber_delta * (a - 0.5 * huber_delta))
        return jnp.sum(rho)

    def step(state):
        g, lam, c, it, done = state
        t1, t2 = _tangent_basis(g)

        def r_of_theta(th):
            gg = g + th[0] * t1 + th[1] * t2
            gg = gg / jnp.maximum(jnp.linalg.norm(gg), 1e-12)
            return _residuals(gg, pn, up_obs, weights)

        th0 = jnp.zeros(2, g.dtype)
        r = r_of_theta(th0)
        w = huber_w(r)
        J = jax.jacfwd(r_of_theta)(th0)
        Jw = J * w[:, None]
        H = Jw.T @ J
        grad = Jw.T @ r
        d = jnp.maximum(jnp.diag(H), 1e-12)
        th = -jnp.linalg.solve(H + lam * jnp.diag(d), grad)
        g_new = g + th[0] * t1 + th[1] * t2
        g_new = g_new / jnp.maximum(jnp.linalg.norm(g_new), 1e-12)
        c_new = cost(g_new)
        accept = c_new < c
        lam = jnp.where(accept, lam * 0.3, lam * 5.0)
        g = jnp.where(accept, g_new, g)
        rel = (c - c_new) / jnp.maximum(c, 1e-30)
        done = jnp.logical_and(accept, rel < 1e-10)
        return g, jnp.clip(lam, 1e-10, 1e8), jnp.where(accept, c_new, c), it + 1, done

    def cond(state):
        _g, _l, _c, it, done = state
        return jnp.logical_and(it < iters, jnp.logical_not(done))

    state = (g0, jnp.asarray(1e-3, g0.dtype), cost(g0), jnp.array(0), jnp.array(False))
    g, _lam, c, it, done = jax.lax.while_loop(cond, step, state)
    r = _residuals(g, pn, up_obs, weights)
    return g, r, it, done


def fit_gravity(
    up_field: np.ndarray,
    K: np.ndarray,
    sample_stride: int = 8,
    weights: np.ndarray | None = None,
    huber_delta: float = 0.1,
) -> GravityFit:
    """Fit camera-frame gravity from a dense up-field.

    Args:
        up_field: (H, W, 2) unit image-space up directions per pixel.
        K: (3, 3) camera intrinsics.
        sample_stride: subsample the field for the fit.
        weights: optional (H, W) confidence weights.
    """
    H, W = up_field.shape[:2]
    ys, xs = np.mgrid[0:H:sample_stride, 0:W:sample_stride]
    xs, ys = xs.ravel(), ys.ravel()
    up = up_field[ys, xs]
    norm = np.linalg.norm(up, axis=1)
    good = norm > 1e-6
    xs, ys, up = xs[good], ys[good], up[good] / norm[good][:, None]
    w = np.ones(len(xs)) if weights is None else weights[ys, xs]

    pn = np.stack([(xs - K[0, 2]) / K[0, 0], (ys - K[1, 2]) / K[1, 1]], axis=1)
    # init: mean observed up direction lifted to a 3D guess (y-down image ->
    # gravity approx (mean_up_x, mean_up_y, 0) flipped)
    mu = up.mean(axis=0)
    g0 = np.array([mu[0], mu[1], 0.0])
    n0 = np.linalg.norm(g0)
    g0 = g0 / n0 if n0 > 1e-9 else np.array([0.0, 1.0, 0.0])

    g, r, it, done = _fit_one(
        jnp.asarray(pn), jnp.asarray(up), jnp.asarray(w), jnp.asarray(g0), huber_delta
    )
    g = np.asarray(g)
    r = np.asarray(r)
    ang = np.degrees(np.arcsin(np.clip(np.abs(r / np.maximum(w, 1e-9)), 0, 1)))
    return GravityFit(
        gravity_cam=g,
        residual_deg=float(np.median(ang)),
        inlier_fraction=float(np.mean(ang < 5.0)),
        converged=bool(done) or int(it) > 0,
    )
