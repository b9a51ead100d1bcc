"""Markerless (epipolar) pose bootstrap: essential matrix + scaffold resection.

Parity: reference src/caliscope/core/bootstrap_pose/epipolar_pose_builder.py
(pooled_correspondences:67, recover_pair_pose:110, triangulate_scaffold:164,
resection_camera:183, _assemble_from_scaffold:237,
build_epipolar_pose_network:281). Used when observations carry no obj_loc
(markerless body-pose data): each pair's pooled 2D-2D correspondences give an
essential-matrix relative pose; one scaffold pair's cloud anchors the rig and
every other camera registers by resection; the scaffold is chosen by
third-view validation (how well OTHER cameras fit its cloud), which catches
wrong-but-self-consistent essential estimates near the coplanarity degeneracy.

TPU-first difference: RANSAC loops (essential + resection) are fixed-iteration
vmapped hypothesize-and-verify batches (ops/epipolar.py) rather than
sequential cv2 loops; the tiny scaffold-selection logic stays host-side.
"""

from __future__ import annotations

import logging
from itertools import combinations

import numpy as np

from caliscope_tpu.cameras import CameraArray, CameraData
from caliscope_tpu.exceptions import CalibrationError
from caliscope_tpu.observations import ImagePoints
from caliscope_tpu.ops.bucket import bucket_size, pad_rows

logger = logging.getLogger(__name__)

RANSAC_THRESHOLD_PX = 3.0  # pixel gate, converted per pair to normalized units
MIN_CORRESPONDENCES = 8
MIN_RESECTION_POINTS = 50
CONDITIONING_FLOOR = 0.5
MAX_SCAFFOLD_CANDIDATES = 12
ESSENTIAL_RANSAC_ITERS = 512
PNP_RANSAC_ITERS = 256


def pooled_correspondences(ip: ImagePoints, cam_a: int, cam_b: int):
    """Matched pixels for one pair, pooled over every shared frame.

    Returns (keys (N,3) [obj, kp, sync], pix_a (N,2), pix_b (N,2)).
    """
    sel_a = ip.cam_id == cam_a
    sel_b = ip.cam_id == cam_b
    key_a = {}
    for i in np.where(sel_a)[0]:
        key_a[(int(ip.object_id[i]), int(ip.keypoint_id[i]), int(ip.sync_index[i]))] = i
    rows_a, rows_b, keys = [], [], []
    for i in np.where(sel_b)[0]:
        k = (int(ip.object_id[i]), int(ip.keypoint_id[i]), int(ip.sync_index[i]))
        j = key_a.get(k)
        if j is not None:
            rows_a.append(j)
            rows_b.append(i)
            keys.append(k)
    if not rows_a:
        return np.empty((0, 3), np.int64), np.empty((0, 2)), np.empty((0, 2))
    keys = np.asarray(keys, np.int64)
    pa = ip.img_xy[rows_a]
    pb = ip.img_xy[rows_b]
    finite = np.isfinite(pa).all(axis=1) & np.isfinite(pb).all(axis=1)
    return keys[finite], pa[finite], pb[finite]


def recover_pair_pose(pixels_a, pixels_b, *, camera_a: CameraData, camera_b: CameraData, seed: int = 0) -> dict:
    """Essential relative pose of b w.r.t. a (unit baseline) from pixels."""
    import jax.numpy as jnp

    from caliscope_tpu.ops.epipolar import essential_ransac, recover_pose

    norm_a = camera_a.undistort_points(pixels_a, output="normalized")
    norm_b = camera_b.undistort_points(pixels_b, output="normalized")
    mean_focal = 0.5 * (camera_a.matrix[0, 0] + camera_b.matrix[0, 0])
    threshold = RANSAC_THRESHOLD_PX / mean_focal
    # bucket correspondence count: per-pair N varies, masks make filler free
    N = len(norm_a)
    Nb = bucket_size(N)
    mask = np.zeros(Nb, bool)
    mask[:N] = True
    na_b, nb_b = jnp.asarray(pad_rows(norm_a, Nb)), jnp.asarray(pad_rows(norm_b, Nb))
    E, inl, n_inl = essential_ransac(
        na_b, nb_b, jnp.asarray(mask), threshold,
        n_iters=ESSENTIAL_RANSAC_ITERS, seed=seed,
    )
    E = np.asarray(E)
    inl = np.asarray(inl)
    if int(n_inl) < MIN_CORRESPONDENCES:
        raise ValueError(f"essential-matrix estimation degenerate ({int(n_inl)} inliers)")
    s = np.linalg.svd(E, compute_uv=False)
    conditioning = float(s[1] / s[0]) if s[0] > 1e-12 else 0.0
    R, t, cheir = recover_pose(jnp.asarray(E), na_b, nb_b, jnp.asarray(inl))
    cheir = np.asarray(cheir)[:N]
    inl = inl[:N]
    return {
        "rotation": np.asarray(R),
        "translation": np.asarray(t),
        "inlier_fraction": float(inl.sum() / max(len(inl), 1)),
        "n_inliers": int(inl.sum()),
        "n_total": int(len(inl)),
        "cheirality_inliers": int(cheir.sum()),
        "conditioning": conditioning,
        "norm_a": norm_a,
        "norm_b": norm_b,
        "inlier_index": np.flatnonzero(cheir),
    }


def triangulate_scaffold(pair_pose: dict, keys: np.ndarray) -> dict[tuple[int, int, int], np.ndarray]:
    """Two-view cloud in camera a's frame at unit baseline."""
    import jax.numpy as jnp

    from caliscope_tpu.ops.triangulate import triangulate_dlt

    idx = pair_pose["inlier_index"]
    if len(idx) == 0:
        return {}
    na = pair_pose["norm_a"][idx]
    nb = pair_pose["norm_b"][idx]
    P = np.zeros((2, 3, 4))
    P[0, :3, :3] = np.eye(3)
    P[1, :3, :3] = pair_pose["rotation"]
    P[1, :3, 3] = pair_pose["translation"]
    N = len(idx)
    Nb = bucket_size(N)
    Pb = np.broadcast_to(P, (Nb, 2, 3, 4))
    xn = pad_rows(np.stack([na, nb], axis=1), Nb)
    vmask = np.zeros((Nb, 2), bool)
    vmask[:N] = True
    X = np.asarray(triangulate_dlt(jnp.asarray(Pb), jnp.asarray(xn), jnp.asarray(vmask)))[:N]
    finite = np.isfinite(X).all(axis=1) & (np.abs(X) < 1e6).all(axis=1)
    return {tuple(int(v) for v in keys[i]): X[j] for j, i in enumerate(idx) if finite[j]}


def resection_camera(cloud: dict, ip: ImagePoints, cam_id: int, camera: CameraData, seed: int = 0):
    """Pose one camera against the scaffold cloud via vmapped PnP-RANSAC.

    Returns (R, t, n_points, median normalized reprojection error).
    """
    import jax.numpy as jnp

    from caliscope_tpu.ops.epipolar import pnp_ransac
    from caliscope_tpu.ops.lie import so3_exp

    if not cloud:
        raise ValueError("scaffold cloud is empty")
    sel = np.where(ip.cam_id == cam_id)[0]
    obj, pix = [], []
    for i in sel:
        k = (int(ip.object_id[i]), int(ip.keypoint_id[i]), int(ip.sync_index[i]))
        xyz = cloud.get(k)
        if xyz is not None and np.isfinite(ip.img_xy[i]).all():
            obj.append(xyz)
            pix.append(ip.img_xy[i])
    if len(obj) < MIN_RESECTION_POINTS:
        raise ValueError(f"only {len(obj)} cloud points to resection against")
    obj = np.asarray(obj)
    xn = camera.undistort_points(np.asarray(pix), output="normalized")
    threshold = RANSAC_THRESHOLD_PX / camera.matrix[0, 0]
    n = len(obj)
    nb = bucket_size(n)
    mask_b = np.zeros(nb, bool)
    mask_b[:n] = True
    rvec, tvec, inl, med = pnp_ransac(
        jnp.asarray(pad_rows(obj, nb)), jnp.asarray(pad_rows(xn, nb)), jnp.asarray(mask_b), threshold,
        n_iters=PNP_RANSAC_ITERS, seed=seed,
    )
    if int(np.asarray(inl).sum()) < 4:
        raise ValueError("PnP-RANSAC failed (too few inliers)")
    R = np.asarray(so3_exp(np.asarray(rvec)))
    return R, np.asarray(tvec), len(obj), float(med)


def _assemble_from_scaffold(scaffold_pair, scaffold_pose, scaffold_keys, cam_ids, ip, camera_array):
    anchor_cam, other_cam = scaffold_pair
    cloud = triangulate_scaffold(scaffold_pose, scaffold_keys)
    poses = {
        anchor_cam: (np.eye(3), np.zeros(3)),
        other_cam: (scaffold_pose["rotation"], scaffold_pose["translation"]),
    }
    reproj_errors = []
    n_failures = 0
    for cam_id in cam_ids:
        if cam_id in poses:
            continue
        try:
            R, t, _n, err = resection_camera(cloud, ip, cam_id, camera_array.cameras[cam_id])
        except ValueError:
            n_failures += 1
            continue
        poses[cam_id] = (R, t)
        reproj_errors.append(err)
    worst = max(reproj_errors) if reproj_errors else 0.0
    return poses, (n_failures, worst, -scaffold_pose["cheirality_inliers"])


def build_epipolar_pose_network(image_points: ImagePoints, camera_array: CameraArray):
    """Recover the rig from 2D-2D correspondences alone (scale arbitrary)."""
    from caliscope_tpu.solvers.pose_network import PairedPoseNetwork, StereoPair, stereo_rmse

    observed = set(int(c) for c in np.unique(image_points.cam_id))
    cam_ids = sorted(
        cid for cid, cam in camera_array.cameras.items() if not cam.ignore and cid in observed
    )
    if len(cam_ids) < 2:
        raise CalibrationError(
            f"Epipolar bootstrap needs at least 2 cameras with observations, found {len(cam_ids)}."
        )

    pair_poses: dict[tuple[int, int], dict] = {}
    pair_keys: dict[tuple[int, int], np.ndarray] = {}
    for cam_a, cam_b in combinations(cam_ids, 2):
        keys, pa, pb = pooled_correspondences(image_points, cam_a, cam_b)
        if len(keys) < MIN_CORRESPONDENCES:
            continue
        try:
            pose = recover_pair_pose(
                pa, pb, camera_a=camera_array.cameras[cam_a], camera_b=camera_array.cameras[cam_b],
                seed=cam_a * 1000 + cam_b,
            )
        except ValueError as exc:
            logger.warning(f"Pair {cam_a}-{cam_b}: essential-matrix recovery failed ({exc})")
            continue
        pair_poses[(cam_a, cam_b)] = pose
        pair_keys[(cam_a, cam_b)] = keys
        logger.info(
            f"Pair {cam_a}-{cam_b}: {pose['n_inliers']}/{pose['n_total']} inliers, "
            f"{pose['cheirality_inliers']} cheirality, E conditioning {pose['conditioning']:.3f}"
        )
        if pose["conditioning"] < CONDITIONING_FLOOR:
            logger.warning(
                f"Pair {cam_a}-{cam_b}: essential matrix poorly conditioned "
                f"({pose['conditioning']:.3f} < {CONDITIONING_FLOOR})."
            )

    if not pair_poses:
        raise CalibrationError(
            f"Insufficient camera overlap for epipolar bootstrap: no camera pair reached the "
            f"{MIN_CORRESPONDENCES} shared correspondences an essential matrix needs. Cameras must "
            f"share observations of the moving subject across frames."
        )

    candidates = sorted(pair_poses, key=lambda p: pair_poses[p]["cheirality_inliers"], reverse=True)
    candidates = candidates[:MAX_SCAFFOLD_CANDIDATES]

    best_poses, best_score, best_pair = None, None, None
    for pair in candidates:
        poses, score = _assemble_from_scaffold(
            pair, pair_poses[pair], pair_keys[pair], cam_ids, image_points, camera_array
        )
        if best_score is None or score < best_score:
            best_poses, best_score, best_pair = poses, score, pair

    assert best_poses is not None and best_pair is not None
    anchor_cam = best_pair[0]
    logger.info(
        f"Selected scaffold {best_pair[0]}-{best_pair[1]} (failures={best_score[0]}, "
        f"worst third-view reprojection={best_score[1]:.5f}); posed "
        f"{len(best_poses)}/{len(cam_ids)} cameras, anchor = cam {anchor_cam}"
    )

    # Package as anchor-relative StereoPairs (primary < secondary convention)
    # and score each by stereo RMSE like the PnP path.
    aggregated: dict[tuple[int, int], StereoPair] = {}
    for cam_id, (R, t) in best_poses.items():
        if cam_id == anchor_cam:
            continue
        sp = StereoPair(anchor_cam, cam_id, float("nan"), R, t)
        if sp.primary_cam_id > sp.secondary_cam_id:
            sp = sp.inverted()
        aggregated[sp.pair] = sp

    # Temporarily pose cameras to compute stereo RMSE scores
    scored: dict[tuple[int, int], StereoPair] = {}
    for pair, sp in aggregated.items():
        rmse = stereo_rmse(sp, image_points, camera_array)
        score = rmse if np.isfinite(rmse) else 1e6
        scored[pair] = StereoPair(sp.primary_cam_id, sp.secondary_cam_id, score, sp.rotation, sp.translation)

    return PairedPoseNetwork.from_raw_estimates(scored)
