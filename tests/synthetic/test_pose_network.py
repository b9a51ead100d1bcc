"""Pose-network bootstrap vs ground truth on synthetic scenes."""

import numpy as np
import pytest

from caliscope_tpu.ops import lie, similarity
from caliscope_tpu.solvers import pose_network as pn
from caliscope_tpu.synthetic import factories
from caliscope_tpu.synthetic.camera_synthesizer import strip_extrinsics
from caliscope_tpu.synthetic.faults import VisibilityFilter


def pose_errors_after_alignment(cameras_hat, cameras_true):
    """Procrustes-align estimated camera centers to truth; return per-camera
    (rotation deg, center meters) errors."""
    ids = sorted(cameras_true.posed_cameras.keys())
    C_hat = np.stack([-cameras_hat.cameras[i].rotation.T @ cameras_hat.cameras[i].translation for i in ids])
    C_true = np.stack([-cameras_true.cameras[i].rotation.T @ cameras_true.cameras[i].translation for i in ids])
    s, R, t = similarity.umeyama(C_hat, C_true)
    rot_errs, c_errs = [], []
    for k, i in enumerate(ids):
        Rh, th = similarity.apply_similarity_to_extrinsics(
            s, np.asarray(R), np.asarray(t), cameras_hat.cameras[i].rotation, cameras_hat.cameras[i].translation
        )
        rot_errs.append(np.rad2deg(float(lie.rotation_geodesic_angle(np.asarray(Rh), cameras_true.cameras[i].rotation))))
        C_al = similarity.apply_similarity_to_points(s, np.asarray(R), np.asarray(t), C_hat[k])
        c_errs.append(float(np.linalg.norm(np.asarray(C_al) - C_true[k])))
    return np.array(rot_errs), np.array(c_errs)


def test_pnp_bootstrap_recovers_ring(rng):
    scene = factories.default_ring_scene(noise_sigma_px=0.5)
    ip = scene.image_points_noisy()
    cams = strip_extrinsics(scene.cameras)
    net = pn.build_pnp_pose_network(ip, cams)
    anchor = net.apply_to(cams)
    assert cams.all_extrinsics_calibrated
    rot, cen = pose_errors_after_alignment(cams, scene.cameras)
    # bootstrap alone (before BA) should be well under a degree / cm here
    assert rot.max() < 1.0, rot
    assert cen.max() < 0.02, cen


def test_bootstrap_exact_with_perfect_points():
    scene = factories.default_ring_scene()
    ip = scene.image_points_perfect()
    cams = strip_extrinsics(scene.cameras)
    net = pn.build_pnp_pose_network(ip, cams)
    net.apply_to(cams)
    rot, cen = pose_errors_after_alignment(cams, scene.cameras)
    assert rot.max() < 1e-4
    assert cen.max() < 1e-5


def test_bridging_spans_disjoint_pair():
    """Cameras 0 and 2 never observe the target simultaneously (disjoint
    occlusion windows); the graph must bridge them through 1/3."""
    scene = factories.default_ring_scene(n_frames=24)
    vf = VisibilityFilter(occlusions=[(0, 0, 11), (2, 12, 23)])
    ip = vf.apply(scene.image_points_perfect())
    # premise: no (sync) where both 0 and 2 see anything
    syncs_0 = set(ip.sync_index[ip.cam_id == 0])
    syncs_2 = set(ip.sync_index[ip.cam_id == 2])
    assert not (syncs_0 & syncs_2)
    cams = strip_extrinsics(scene.cameras)
    net = pn.build_pnp_pose_network(ip, cams)
    assert net.get_pair(0, 2) is not None  # bridged
    net.apply_to(cams)
    rot, cen = pose_errors_after_alignment(cams, scene.cameras)
    assert rot.max() < 1e-3
    assert cen.max() < 1e-4


def test_outlier_rejection_tames_bad_pnp(rng):
    """5% gross outliers should barely move the bootstrap."""
    from caliscope_tpu.synthetic.faults import inject_outliers

    scene = factories.default_ring_scene(noise_sigma_px=0.3)
    ip, _ = inject_outliers(scene.image_points_noisy(), fraction=0.05, magnitude_px=40.0, rng=rng)
    cams = strip_extrinsics(scene.cameras)
    net = pn.build_pnp_pose_network(ip, cams)
    net.apply_to(cams)
    rot, cen = pose_errors_after_alignment(cams, scene.cameras)
    assert rot.max() < 1.5
    assert cen.max() < 0.03


def test_anchor_camera_is_identity():
    scene = factories.default_ring_scene()
    cams = strip_extrinsics(scene.cameras)
    net = pn.build_pnp_pose_network(scene.image_points_perfect(), cams)
    anchor = net.apply_to(cams)
    np.testing.assert_allclose(cams.cameras[anchor].rotation, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(cams.cameras[anchor].translation, np.zeros(3), atol=1e-12)


def test_network_toml_roundtrip(tmp_path):
    scene = factories.default_ring_scene()
    net = pn.build_pnp_pose_network(scene.image_points_perfect(), strip_extrinsics(scene.cameras))
    p = tmp_path / "stereo_pairs.toml"
    net.to_toml(p)
    net2 = pn.PairedPoseNetwork.from_toml(p)
    for key, sp in net.pairs.items():
        sp2 = net2.get_pair(*key)
        np.testing.assert_allclose(sp2.rotation, sp.rotation, atol=1e-12)
        np.testing.assert_allclose(sp2.translation, sp.translation, atol=1e-12)
        assert sp2.error_score == pytest.approx(sp.error_score, abs=1e-9)
