"""PnP oracle tests vs cv2.solvePnP on planar and non-planar targets."""

import cv2
import numpy as np

from caliscope_tpu.ops import lie, pnp


def make_pose(rng):
    rvec = rng.normal(scale=0.5, size=3)
    tvec = np.array([rng.normal(scale=0.2), rng.normal(scale=0.2), rng.uniform(1.5, 3.0)])
    return rvec, tvec


def planar_board(rows=5, cols=7, spacing=0.05):
    jj, ii = np.meshgrid(np.arange(cols), np.arange(rows))
    return np.stack(
        [(jj.ravel() - 3) * spacing, (ii.ravel() - 2) * spacing, np.zeros(rows * cols)], axis=1
    )


def project_normed(obj, rvec, tvec):
    R = cv2.Rodrigues(rvec)[0]
    xc = (R @ obj.T).T + tvec
    return xc[:, :2] / xc[:, 2:3]


def pose_err(rvec_a, tvec_a, rvec_b, tvec_b):
    Ra = cv2.Rodrigues(np.asarray(rvec_a, dtype=np.float64))[0]
    Rb = cv2.Rodrigues(np.asarray(rvec_b, dtype=np.float64))[0]
    ang = np.rad2deg(float(lie.rotation_geodesic_angle(Ra, Rb)))
    return ang, np.linalg.norm(np.asarray(tvec_a) - np.asarray(tvec_b))


def test_planar_pnp_exact(rng):
    obj = planar_board()
    G = 20
    objs, imgs, masks, truths = [], [], [], []
    for _ in range(G):
        rvec, tvec = make_pose(rng)
        objs.append(obj)
        imgs.append(project_normed(obj, rvec, tvec))
        masks.append(np.ones(len(obj), bool))
        truths.append((rvec, tvec))
    rv, tv, rms, n = pnp.solve_pnp_batch(np.stack(objs), np.stack(imgs), np.stack(masks))
    for g in range(G):
        ang, dt = pose_err(rv[g], tv[g], *truths[g])
        assert ang < 1e-5 and dt < 1e-6, (g, ang, dt)
    assert np.asarray(rms).max() < 1e-9


def test_planar_pnp_noisy_matches_cv2(rng):
    obj = planar_board()
    rvec, tvec = make_pose(rng)
    xn = project_normed(obj, rvec, tvec) + rng.normal(scale=0.5 / 1400, size=(len(obj), 2))
    ok, rv_cv, tv_cv = cv2.solvePnP(obj, xn.reshape(-1, 1, 2), np.eye(3), None, flags=cv2.SOLVEPNP_IPPE)
    rv_cv, tv_cv = cv2.solvePnP(obj, xn.reshape(-1, 1, 2), np.eye(3), None, rv_cv, tv_cv, True, cv2.SOLVEPNP_ITERATIVE)[1:]
    rv, tv, rms, _ = pnp.solve_pnp_batch(obj[None], xn[None], np.ones((1, len(obj)), bool))
    ang, dt = pose_err(rv[0], tv[0], rv_cv.ravel(), tv_cv.ravel())
    assert ang < 0.05 and dt < 5e-4  # same optimum as cv2's refined solution


def test_pnp_masked_padding(rng):
    """Garbage in masked slots must not affect the solution."""
    obj = planar_board()
    rvec, tvec = make_pose(rng)
    xn = project_normed(obj, rvec, tvec)
    K = len(obj)
    obj_pad = np.vstack([obj, rng.normal(size=(10, 3))])
    xn_pad = np.vstack([xn, rng.normal(size=(10, 2))])
    mask = np.concatenate([np.ones(K, bool), np.zeros(10, bool)])
    rv, tv, rms, n = pnp.solve_pnp_batch(obj_pad[None], xn_pad[None], mask[None])
    ang, dt = pose_err(rv[0], tv[0], rvec, tvec)
    assert ang < 1e-5 and dt < 1e-6
    assert int(n[0]) == K


def test_nonplanar_pnp(rng):
    """Two-sided-board-like object (z=0 face + z=0.01 face)."""
    front = planar_board()
    back = planar_board() + np.array([0, 0, 0.012])
    obj = np.vstack([front, back])
    rvec, tvec = make_pose(rng)
    xn = project_normed(obj, rvec, tvec)
    rv, tv, rms, _ = pnp.solve_pnp_batch(obj[None], xn[None], np.ones((1, len(obj)), bool))
    ang, dt = pose_err(rv[0], tv[0], rvec, tvec)
    assert ang < 1e-4 and dt < 1e-5


def test_minimal_planar_four_points(rng):
    half = 0.05
    obj = np.array([[-half, -half, 0], [half, -half, 0], [half, half, 0], [-half, half, 0]])
    rvec, tvec = make_pose(rng)
    xn = project_normed(obj, rvec, tvec)
    rv, tv, rms, _ = pnp.solve_pnp_batch(obj[None], xn[None], np.ones((1, 4), bool))
    ang, dt = pose_err(rv[0], tv[0], rvec, tvec)
    assert ang < 1e-4 and dt < 1e-5
