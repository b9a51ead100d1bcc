"""Reprojection residuals + per-observation Jacobian blocks.

Parity: reference src/caliscope/core/reprojection.py (project_points:18,
reprojection_errors:35, joint_residuals:75, joint_jacobian:128). The reference
assembles a scipy COO/CSR sparse Jacobian from cv2.projectPoints' returned
Jacobians; here every observation's residual derives from ONE differentiable
projection and its Jacobian blocks come from `jax.jacfwd` vmapped over the
observation axis — there is no general sparse matrix anywhere, only
(N, 2, 9) camera blocks + (N, 2, 3) point blocks consumed by segment-sum
normal-equation products (see solvers/bundle.py).

Camera parameter block layout (reference bundle_parameterization.py:37-136):
    cam9 = [rvec(3), tvec(3), s, k1, k2]
with fx = s * fx_init, fy = s * fy_init and [k1, k2] replacing the first two
distortion coefficients; remaining coefficients stay at their initial values.
Residuals are pixel errors scaled by 1/fx_init per camera so every camera
contributes in comparable normalized units (reference reprojection.py:75-110).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from caliscope_tpu.ops.projection import project_points

N_CAM_PARAMS = 9  # 6 extrinsic + [s, k1, k2]


def camera_matrices_from_block(cam9, K0):
    """cam9 (..., 9) + initial K0 (..., 3, 3) -> effective K (..., 3, 3)."""
    s = cam9[..., 6]
    K = K0 * 1.0
    K = K.at[..., 0, 0].set(K0[..., 0, 0] * s)
    K = K.at[..., 1, 1].set(K0[..., 1, 1] * s)
    return K


def effective_distortions(cam9, dist0):
    """Replace the first two coefficients with the free [k1, k2]."""
    d = dist0 * 1.0
    d = d.at[..., 0].set(cam9[..., 7])
    d = d.at[..., 1].set(cam9[..., 8])
    return d


def project_with_block(X, cam9, K0, dist0, fisheye_flag, any_fisheye: bool = True):
    """Project world point(s) X through the 9-parameter camera block.

    fisheye_flag is a traced bool array — both camera models are evaluated
    and selected, so mixed rigs batch in one call. `any_fisheye` is a
    STATIC hint: all-Brown rigs (the common case) pass False and skip the
    fisheye model entirely — under jacfwd the equidistant model's atan and
    its 12 tangents are a measurable share of the block-building cost.
    """
    rvec = cam9[..., 0:3]
    tvec = cam9[..., 3:6]
    K = camera_matrices_from_block(cam9, K0)
    dist = effective_distortions(cam9, dist0)
    uv_brown = project_points(X, rvec, tvec, K, dist, False)
    if not any_fisheye:
        return uv_brown
    uv_fish = project_points(X, rvec, tvec, K, dist[..., :4], True)
    return jnp.where(fisheye_flag[..., None], uv_fish, uv_brown)


def _obs_residual(cam9, X, uv, K0, dist0, fisheye_flag, inv_fx, any_fisheye: bool = True):
    """Single-observation normalized residual (2,)."""
    uv_hat = project_with_block(X, cam9, K0, dist0, fisheye_flag, any_fisheye)
    return (uv_hat - uv) * inv_fx


def observation_residuals(cam9_all, X_all, cam_idx, pt_idx, uv, K0_all, dist0_all, fisheye_all, inv_fx_all, any_fisheye: bool = True):
    """Residuals for all observations: (N, 2) in 1/fx_init-normalized units."""
    cam9 = cam9_all[cam_idx]
    X = X_all[pt_idx]
    uv_hat = project_with_block(X, cam9, K0_all[cam_idx], dist0_all[cam_idx], fisheye_all[cam_idx], any_fisheye)
    return (uv_hat - uv) * inv_fx_all[cam_idx][:, None]


def observation_jacobian_blocks(cam9_all, X_all, cam_idx, pt_idx, uv, K0_all, dist0_all, fisheye_all, inv_fx_all, any_fisheye: bool = True):
    """Per-observation Jacobian blocks of the normalized residual.

    Returns (r (N,2), Jc (N,2,9), Jp (N,2,3)) — forward-mode through the
    single projection function, vmapped over observations. This replaces the
    reference's cv2-Jacobian + chain-rule + COO assembly
    (reference reprojection.py:128-233) with a dense-blocks representation
    that maps directly onto segment-sum normal equations.
    """

    def one(cam9, X, uv_i, K0, dist0, fe, ifx):
        f = lambda c, x: _obs_residual(c, x, uv_i, K0, dist0, fe, ifx, any_fisheye)
        r = f(cam9, X)
        Jc = jax.jacfwd(f, argnums=0)(cam9, X)
        Jp = jax.jacfwd(f, argnums=1)(cam9, X)
        return r, Jc, Jp

    return jax.vmap(one)(
        cam9_all[cam_idx],
        X_all[pt_idx],
        uv,
        K0_all[cam_idx],
        dist0_all[cam_idx],
        fisheye_all[cam_idx],
        inv_fx_all[cam_idx],
    )


def _obs_minor_lane_math(cam9_all, X_all, cam_idx, pt_idx, K0_all, dist0_all, fisheye_all, inv_fx_all, any_fisheye: bool):
    """Shared lane-wise setup for the obs-minor sparse builders.

    Returns (xc [3 x (N,)], H, per-obs scalars) where H maps the six
    per-observation unknowns (xc0, xc1, xc2, s, k1, k2) to the normalized
    PROJECTION (2 lanes) — residual subtraction happens in the callers.

    Why this exists (round 5, measured on a v5e): the row-major sparse
    builder (vmap of jacfwd over (N, ...) rows) costs ~29 ms/iter at the
    canonical scale because every (N, k<128)-shaped intermediate is
    physically tiled (8, 128) over its MINOR dims — a (N, 2, 9) tensor
    occupies ~57x its logical bytes and every op pays that traffic. Here
    ALL per-observation math runs on flat (N,) lanes (full tile
    occupancy), the camera nonlinearity (rodrigues + its tangents) is
    computed per CAMERA ((C,) tables) and gathered per lane, and the
    Jacobian blocks come from jax.linearize of H against the 6 basis
    tangents plus a hand-unrolled chain rule through R and dR/drvec.
    Identical math to observation_jacobian_blocks (same z-clamp, same
    effective-intrinsics substitution) at f32 roundoff."""
    from caliscope_tpu.ops.lie import so3_exp

    R_all = so3_exp(cam9_all[:, 0:3])  # (C,3,3)
    dR_all = jax.vmap(jax.jacfwd(so3_exp))(cam9_all[:, 0:3])  # (C,3,3,3)
    ci, pi = cam_idx, pt_idx
    Xl = [X_all[:, j][pi] for j in range(3)]  # 3 x (N,)
    Rg = [[R_all[:, i, j][ci] for j in range(3)] for i in range(3)]
    xc = [sum(Rg[i][j] * Xl[j] for j in range(3)) + cam9_all[:, 3 + i][ci] for i in range(3)]

    fx0 = K0_all[:, 0, 0][ci]
    fy0 = K0_all[:, 1, 1][ci]
    cxs = K0_all[:, 0, 2][ci]
    cys = K0_all[:, 1, 2][ci]
    d2 = dist0_all[:, 2][ci]
    d3 = dist0_all[:, 3][ci]
    d4 = dist0_all[:, 4][ci]
    ifx = inv_fx_all[ci]
    s = cam9_all[:, 6][ci]
    k1 = cam9_all[:, 7][ci]
    k2 = cam9_all[:, 8][ci]
    fe = fisheye_all[ci] if any_fisheye else None

    def H(x0_, x1_, x2_, s_, k1_, k2_):
        # identical clamp to project_points (sign-preserving min depth)
        z = jnp.where(jnp.abs(x2_) < 1e-6, jnp.where(x2_ < 0, -1e-6, 1e-6), x2_)
        x = x0_ / z
        y = x1_ / z
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1_ + r2 * (k2_ + r2 * d4))
        xd = x * radial + 2.0 * d2 * x * y + d3 * (r2 + 2.0 * x * x)
        yd = y * radial + d2 * (r2 + 2.0 * y * y) + 2.0 * d3 * x * y
        if any_fisheye:
            # equidistant model on the same effective coefficients
            # ([k1, k2, dist0_2, dist0_3] — matches project_with_block)
            rn = jnp.sqrt(jnp.maximum(r2, 1e-18))
            theta = jnp.arctan(rn)
            t2 = theta * theta
            theta_d = theta * (1.0 + t2 * (k1_ + t2 * (k2_ + t2 * (d2 + t2 * d3))))
            sc = theta_d / rn
            xd = jnp.where(fe, x * sc, xd)
            yd = jnp.where(fe, y * sc, yd)
        return xd * fx0 * s_ + cxs, yd * fy0 * s_ + cys

    return xc, H, (s, k1, k2, ifx, Rg, dR_all, ci, Xl)


def observation_residuals_obs_minor(cam9_all, X_all, cam_idx, pt_idx, uv_t, K0_all, dist0_all, fisheye_all, inv_fx_all, any_fisheye: bool = True):
    """Obs-minor residuals (2, N) — see _obs_minor_lane_math."""
    xc, H, (s, k1, k2, ifx, *_rest) = _obs_minor_lane_math(
        cam9_all, X_all, cam_idx, pt_idx, K0_all, dist0_all, fisheye_all, inv_fx_all, any_fisheye
    )
    u, v = H(xc[0], xc[1], xc[2], s, k1, k2)
    return jnp.stack([(u - uv_t[0]) * ifx, (v - uv_t[1]) * ifx])


def observation_blocks_obs_minor(cam9_all, X_all, cam_idx, pt_idx, uv_t, K0_all, dist0_all, fisheye_all, inv_fx_all, any_fisheye: bool = True):
    """Obs-minor Jacobian blocks: r (2,N), Jc (2,9,N), Jp (2,3,N).

    Same quantities as observation_jacobian_blocks transposed — built
    entirely from (N,) lane math (see _obs_minor_lane_math)."""
    xc, H, (s, k1, k2, ifx, Rg, dR_all, ci, Xl) = _obs_minor_lane_math(
        cam9_all, X_all, cam_idx, pt_idx, K0_all, dist0_all, fisheye_all, inv_fx_all, any_fisheye
    )
    (u, v), lin = jax.linearize(H, xc[0], xc[1], xc[2], s, k1, k2)
    ru = (u - uv_t[0]) * ifx
    rv = (v - uv_t[1]) * ifx
    zer = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    Jb = []
    for b in range(6):
        tangents = [zer] * 6
        tangents[b] = one
        du, dv = lin(*tangents)
        Jb.append((du * ifx, dv * ifx))
    # chain rule: dxc/drvec_k = (dR/drvec_k) @ X, unrolled over lanes
    dxc_drv = [
        [sum(dR_all[:, i, j, k][ci] * Xl[j] for j in range(3)) for k in range(3)]
        for i in range(3)
    ]
    cols = [
        (
            sum(Jb[i][0] * dxc_drv[i][k] for i in range(3)),
            sum(Jb[i][1] * dxc_drv[i][k] for i in range(3)),
        )
        for k in range(3)
    ]
    cols += Jb  # tvec (= d/dxc), then s, k1, k2
    pcols = [
        (
            sum(Jb[i][0] * Rg[i][k] for i in range(3)),
            sum(Jb[i][1] * Rg[i][k] for i in range(3)),
        )
        for k in range(3)
    ]
    r = jnp.stack([ru, rv])  # (2,N)
    Jc = jnp.stack([jnp.stack([c[0] for c in cols]), jnp.stack([c[1] for c in cols])])  # (2,9,N)
    Jp = jnp.stack([jnp.stack([c[0] for c in pcols]), jnp.stack([c[1] for c in pcols])])  # (2,3,N)
    return r, Jc, Jp


def dense_observation_residuals(cam9_all, X_all, uv_t, K0_all, dist0_all, fisheye_all, inv_fx_all, any_fisheye: bool = True):
    """Residuals in the DENSE observation layout, POINT-MINOR.

    The observation structure of bundle adjustment is at most dense in
    (points x cameras) — a camera sees a world point at most once — so
    laying the observation axis out as a dense grid makes BOTH indices
    array axes: no cam_idx/pt_idx gathers on the way in, and every
    normal-equation reduction downstream becomes a dense einsum instead of
    a segment scatter.

    Layout (round 4): the LONG point axis is MINORMOST. TPU memory tiles
    are (8, 128) over the two minor dims; the earlier (P, C, 2) layout put
    the size-2 residual axis in lanes, so ~98% of every tile the program
    moved was padding (measured ~11 GB/s effective HBM bandwidth, 1.3% of
    peak, on the full LM iteration). With P in lanes every per-observation
    tensor tiles at full occupancy. uv_t: (C, 2, P); returns (C, 2, P)."""

    def one(cam9, X, uv_i, K0, dist0, fe, ifx):
        return _obs_residual(cam9, X, uv_i, K0, dist0, fe, ifx, any_fisheye)

    # per-POINT inner vmap with out_axes=-1, matching the blocks builder:
    # XLA then keeps every projection intermediate point-minor (lanes fully
    # occupied). The per-camera bulk form (project (P, 2), transpose after)
    # left intermediates point-MAJOR with 2-3 lanes live and measured ~2.5
    # ms per cost eval at canonical scale vs ~0.1 ms for this form.
    inner = jax.vmap(one, in_axes=(None, 0, 1, None, None, None, None), out_axes=-1)
    return jax.vmap(inner, in_axes=(0, None, 0, 0, 0, 0, 0))(
        cam9_all, X_all, uv_t, K0_all, dist0_all, fisheye_all, inv_fx_all
    )


def dense_observation_jacobian_blocks(cam9_all, X_all, uv_t, K0_all, dist0_all, fisheye_all, inv_fx_all, any_fisheye: bool = True):
    """Jacobian blocks in the dense layout, POINT-MINOR (see
    dense_observation_residuals for the layout rationale).

    uv_t: (C, 2, P). Returns (r (C,2,P), Jc (C,2,9,P), Jp (C,2,3,P)) —
    same jacfwd-through-one-projection construction as
    observation_jacobian_blocks, but the (point, camera) pairing is
    positional (zero index arrays) and vmap's out_axes places the point
    batch axis LAST, so the jacobians land lane-major without any
    transpose."""

    def one(cam9, X, uv_i, K0, dist0, fe, ifx):
        f = lambda c, x: _obs_residual(c, x, uv_i, K0, dist0, fe, ifx, any_fisheye)
        r = f(cam9, X)
        Jc = jax.jacfwd(f, argnums=0)(cam9, X)
        Jp = jax.jacfwd(f, argnums=1)(cam9, X)
        return r, Jc, Jp

    inner = jax.vmap(one, in_axes=(None, 0, 1, None, None, None, None), out_axes=-1)  # over points
    outer = jax.vmap(inner, in_axes=(0, None, 0, 0, 0, 0, 0))  # over cameras
    return outer(cam9_all, X_all, uv_t, K0_all, dist0_all, fisheye_all, inv_fx_all)


def reprojection_errors(cam9_all, X_all, cam_idx, pt_idx, uv, K0_all, dist0_all, fisheye_all):
    """Per-observation PIXEL-space errors (N, 2) for reports
    (reference reprojection.py:35-72)."""
    cam9 = cam9_all[cam_idx]
    uv_hat = project_with_block(X_all[pt_idx], cam9, K0_all[cam_idx], dist0_all[cam_idx], fisheye_all[cam_idx])
    return uv_hat - uv


# ---------------------------------------------------------------------------
# Distance-constraint residuals (board-rigidity rows)
# ---------------------------------------------------------------------------


def constraint_residuals(X_all, pa_idx, pa_w, pb_idx, pb_w, target, weight):
    """Distance-constraint rows (reference reprojection.py:112-119).

    Each endpoint is a weighted mean of up to 4 world points (single corners
    use one unit weight; centroid endpoints use 4 x 0.25 — the reference's
    width-4 row groups). Padded slots carry zero weight.

    Args:
        X_all:  (P, 3) world points.
        pa_idx/pb_idx: (Q, 4) point indices per endpoint.
        pa_w/pb_w:     (Q, 4) endpoint weights (sum to 1 per row).
        target: (Q,) measured distances (meters).
        weight: (Q,) residual weights (1/sigma in solver units).

    Returns (Q,) residuals weight * (||pa - pb|| - target).
    """
    pa = jnp.einsum("qk,qkj->qj", pa_w, X_all[pa_idx])
    pb = jnp.einsum("qk,qkj->qj", pb_w, X_all[pb_idx])
    d = jnp.sqrt(jnp.maximum(jnp.sum((pa - pb) ** 2, axis=-1), 1e-18))
    return (d - target) * weight


def constraint_jacobian_blocks(X_all, pa_idx, pa_w, pb_idx, pb_w, target, weight):
    """Analytic constraint Jacobian blocks.

    d r / d pa = weight * (pa - pb)/||pa - pb||, chained by the endpoint
    weights to each participating point. Returns (r (Q,), idx (Q, 8),
    J (Q, 8, 3)) where the 8 slots are [4 x endpoint A, 4 x endpoint B].
    """
    pa = jnp.einsum("qk,qkj->qj", pa_w, X_all[pa_idx])
    pb = jnp.einsum("qk,qkj->qj", pb_w, X_all[pb_idx])
    diff = pa - pb
    d = jnp.sqrt(jnp.maximum(jnp.sum(diff**2, axis=-1), 1e-18))
    r = (d - target) * weight
    u = diff / d[:, None]  # (Q,3) unit direction
    Ja = weight[:, None, None] * pa_w[:, :, None] * u[:, None, :]  # (Q,4,3)
    Jb = -weight[:, None, None] * pb_w[:, :, None] * u[:, None, :]
    idx = jnp.concatenate([pa_idx, pb_idx], axis=1)  # (Q,8)
    J = jnp.concatenate([Ja, Jb], axis=1)  # (Q,8,3)
    return r, idx, J


# ---------------------------------------------------------------------------
# Robust loss (IRLS weights, scipy least_squares-compatible)
# ---------------------------------------------------------------------------


def robust_weights_and_cost(r2_elements, loss: str, f_scale: float):
    """Per-element IRLS weights and total robust cost.

    scipy convention: cost = 0.5 * f_scale^2 * sum(rho(r^2 / f_scale^2));
    GN reweighting uses rho'(z). loss='linear' or 'soft_l1'
    (reference capture_volume.py:387-411 uses exactly these two).
    """
    if loss == "linear":
        return jnp.ones_like(r2_elements), 0.5 * jnp.sum(r2_elements)
    if loss == "soft_l1":
        z = r2_elements / (f_scale**2)
        rho = 2.0 * (jnp.sqrt(1.0 + z) - 1.0)
        w = 1.0 / jnp.sqrt(1.0 + z)  # rho'(z)
        cost = 0.5 * (f_scale**2) * jnp.sum(rho)
        return w, cost
    raise ValueError(f"Unknown loss: {loss}")
