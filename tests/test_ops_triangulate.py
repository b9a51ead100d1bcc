"""Triangulation correctness: exact recovery, masking, grouping, noise."""

import numpy as np

from caliscope_tpu.ops import lie, triangulate


def make_cameras(n_cams=4, radius=2.0):
    """Ring of cameras looking at origin; returns (C,3,4) projection mats."""
    proj = []
    for i in range(n_cams):
        angle = 2 * np.pi * i / n_cams
        C = np.array([radius * np.cos(angle), radius * np.sin(angle), 0.6])
        z_axis = -C / np.linalg.norm(C)  # look at origin
        up = np.array([0.0, 0.0, 1.0])
        x_axis = np.cross(z_axis, up)
        x_axis /= np.linalg.norm(x_axis)
        y_axis = np.cross(z_axis, x_axis)
        R = np.stack([x_axis, y_axis, z_axis])  # world->cam rows
        t = -R @ C
        proj.append(np.hstack([R, t[:, None]]))
    return np.stack(proj)


def project(P, X):
    xh = P @ np.append(X, 1.0)
    return xh[:2] / xh[2]


def test_dlt_exact_recovery(rng):
    P = make_cameras()
    X_true = rng.uniform(-0.5, 0.5, size=(20, 3))
    xn = np.stack([[project(P[c], X) for c in range(4)] for X in X_true])
    mask = np.ones((20, 4), bool)
    xyz = np.asarray(triangulate.triangulate_dlt(np.broadcast_to(P, (20, 4, 3, 4)), xn, mask))
    np.testing.assert_allclose(xyz, X_true, atol=1e-9)


def test_dlt_masked_rows_ignored(rng):
    P = make_cameras()
    X_true = np.array([0.1, -0.2, 0.3])
    xn = np.stack([project(P[c], X_true) for c in range(4)])
    xn_corrupt = xn.copy()
    xn_corrupt[3] = [99.0, -99.0]  # garbage in masked slot
    mask = np.array([True, True, True, False])
    xyz = np.asarray(triangulate.triangulate_dlt(P[None], xn_corrupt[None], mask[None]))[0]
    np.testing.assert_allclose(xyz, X_true, atol=1e-9)


def test_triangulate_groups_mixed_visibility(rng):
    P = make_cameras()
    n_pts = 30
    X_true = rng.uniform(-0.5, 0.5, size=(n_pts, 3))
    cam_idx, pt_idx, xn = [], [], []
    for p in range(n_pts):
        vis = rng.choice(4, size=rng.integers(2, 5), replace=False)
        for c in vis:
            cam_idx.append(c)
            pt_idx.append(p)
            xn.append(project(P[c], X_true[p]))
    # shuffle to prove order independence
    order = rng.permutation(len(cam_idx))
    cam_idx = np.array(cam_idx)[order]
    pt_idx = np.array(pt_idx)[order]
    xn = np.array(xn)[order]
    xyz, n_views = triangulate.triangulate_groups(P, cam_idx, xn, pt_idx, n_pts, max_views=4)
    np.testing.assert_allclose(np.asarray(xyz), X_true, atol=1e-8)
    assert (np.asarray(n_views) >= 2).all()


def test_triangulate_groups_matches_cv2_two_view(rng):
    import cv2

    P = make_cameras(2)
    X_true = rng.uniform(-0.5, 0.5, size=(10, 3))
    xn0 = np.array([project(P[0], X) for X in X_true])
    xn1 = np.array([project(P[1], X) for X in X_true])
    X_cv = cv2.triangulatePoints(P[0], P[1], xn0.T, xn1.T)
    X_cv = (X_cv[:3] / X_cv[3]).T
    cam_idx = np.array([0] * 10 + [1] * 10)
    pt_idx = np.tile(np.arange(10), 2)
    xn = np.vstack([xn0, xn1])
    xyz, _ = triangulate.triangulate_groups(P, cam_idx, xn, pt_idx, 10, max_views=2)
    np.testing.assert_allclose(np.asarray(xyz), X_cv, atol=1e-8)


def test_noise_robustness(rng):
    P = make_cameras(4)
    X_true = rng.uniform(-0.5, 0.5, size=(50, 3))
    noise_sigma = 0.5 / 1400.0  # 0.5 px at f=1400 in normalized coords
    cam_idx = np.repeat(np.arange(4), 50)
    pt_idx = np.tile(np.arange(50), 4)
    xn = np.concatenate([[project(P[c], X) for X in X_true] for c in range(4)])
    xn = xn + rng.normal(scale=noise_sigma, size=xn.shape)
    xyz, _ = triangulate.triangulate_groups(P, cam_idx, xn, pt_idx, 50, max_views=4)
    err = np.linalg.norm(np.asarray(xyz) - X_true, axis=1)
    assert np.median(err) < 0.005  # < 5 mm at 2 m range with 0.5 px noise
