"""Premise checks on the synthetic scene engine itself.

If these fail, every downstream solver test is meaningless — mirrors the
reference's scene-factory premise checks (scene_factories.py:899+).
"""

import numpy as np

from caliscope_tpu.observations import STATIC_SYNC_INDEX
from caliscope_tpu.synthetic import factories
from caliscope_tpu.synthetic.faults import VisibilityFilter, inject_outliers


def test_default_ring_scene_premises():
    scene = factories.default_ring_scene()
    ip = scene.image_points_perfect()
    assert len(ip) > 1000  # plenty of observations
    # every camera sees the board
    assert set(np.unique(ip.cam_id)) == {0, 1, 2, 3}
    # obj_loc present everywhere (charuco-style known geometry)
    assert ip.has_obj_loc
    # all pairs share observations
    cov = scene.coverage_matrix(ip)
    off_diag = cov[~np.eye(4, dtype=bool)]
    assert (off_diag > 50).all()


def test_perfect_points_triangulate_to_ground_truth():
    scene = factories.default_ring_scene()
    ip = scene.image_points_perfect()
    wp_hat = ip.triangulate(scene.cameras)
    wp_true = scene.world_points()
    # join on keys
    kh = {tuple(k): i for i, k in enumerate(wp_hat.keys())}
    errs = []
    for i, k in enumerate(wp_true.keys()):
        if tuple(k) in kh:
            errs.append(np.linalg.norm(wp_hat.xyz[kh[tuple(k)]] - wp_true.xyz[i]))
    assert len(errs) > 0.9 * len(wp_true)
    assert np.max(errs) < 1e-8


def test_noise_is_seeded_and_sized():
    scene = factories.default_ring_scene(noise_sigma_px=0.5)
    a = scene.image_points_noisy()
    b = scene.image_points_noisy()
    np.testing.assert_array_equal(a.img_xy, b.img_xy)  # deterministic
    p = scene.image_points_perfect()
    resid = a.img_xy - p.img_xy
    assert abs(resid.std() - 0.5) < 0.05


def test_static_markers_scene():
    scene = factories.ring_with_static_markers(n_static_markers=2)
    static_ids = scene.static_object_ids()
    assert static_ids == frozenset({100, 101})
    ip = scene.image_points_perfect()
    wp = ip.triangulate(scene.cameras, static_object_ids=static_ids)
    static_rows = wp.sync_index == STATIC_SYNC_INDEX
    # 2 markers x 4 corners = 8 static world points
    assert static_rows.sum() == 8
    wp_true = scene.world_points()
    true_static = {tuple(k): wp_true.xyz[i] for i, k in enumerate(wp_true.keys()) if k[0] == STATIC_SYNC_INDEX}
    for i in np.where(static_rows)[0]:
        k = tuple(wp.keys()[i])
        assert np.linalg.norm(wp.xyz[i] - true_static[k]) < 1e-8


def test_visibility_filter_kills_pair_linkage():
    scene = factories.default_ring_scene()
    ip = scene.image_points_perfect()
    vf = VisibilityFilter(killed_pairs=[(0, 2)])
    filtered = vf.apply(ip)
    cov = scene.coverage_matrix(filtered)
    assert cov[0, 2] == 0 and cov[2, 0] == 0
    assert cov[0, 1] > 0  # other links survive


def test_outlier_injection(rng):
    scene = factories.default_ring_scene()
    ip = scene.image_points_perfect()
    corrupted, mask = inject_outliers(ip, fraction=0.05, magnitude_px=30.0, rng=rng)
    moved = np.linalg.norm(corrupted.img_xy - ip.img_xy, axis=1)
    assert np.allclose(moved[mask], 30.0)
    assert (moved[~mask] == 0).all()
    assert abs(mask.mean() - 0.05) < 0.01
