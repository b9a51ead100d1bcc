"""Bundle-adjustment oracle: EXECUTE the reference's scipy-TRF solver on the
identical problem and require our jitted LM to land on the same solution.

The pose-network oracle (test_oracles.py) already pins the bootstrap against
the reference; this closes the loop on the other half of the pipeline — the
solver itself. Both engines get byte-identical inputs (cameras, observations,
triangulated points from OUR triangulation) and both solutions are scored
with OUR reprojection metric, so the comparison cannot be gamed by metric
differences. Reference entry point: src/caliscope/core/capture_volume.py:322
(scipy.optimize.least_squares, method=trf, analytic sparse Jacobian).

The reference needs pandas/scipy (present in the image) and rtoml (absent) —
a tomllib-backed shim covers the read-side API its imports touch.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF_SRC = Path("/root/reference/src")


@pytest.fixture(scope="module")
def reference_modules():
    pd = pytest.importorskip("pandas")
    pytest.importorskip("scipy")
    if not REF_SRC.exists():
        pytest.skip("reference checkout not available")
    if "rtoml" not in sys.modules:
        import tomllib

        rtoml = types.ModuleType("rtoml")
        rtoml.load = lambda f: tomllib.loads(
            f.read_text() if hasattr(f, "read_text") else f.read()
        )
        rtoml.loads = tomllib.loads
        sys.modules["rtoml"] = rtoml
    if str(REF_SRC) not in sys.path:
        sys.path.insert(0, str(REF_SRC))
    from caliscope.cameras.camera_array import CameraArray as RefCameraArray
    from caliscope.cameras.camera_array import CameraData as RefCameraData
    from caliscope.core.capture_volume import CaptureVolume as RefCaptureVolume
    from caliscope.core.point_data import ImagePoints as RefImagePoints
    from caliscope.core.point_data import WorldPoints as RefWorldPoints

    return {
        "pd": pd,
        "CameraArray": RefCameraArray,
        "CameraData": RefCameraData,
        "CaptureVolume": RefCaptureVolume,
        "ImagePoints": RefImagePoints,
        "WorldPoints": RefWorldPoints,
    }


def _shared_problem():
    """One bootstrapped-but-unoptimized volume both engines will refine."""
    from caliscope_tpu.synthetic.factories import default_ring_scene
    from caliscope_tpu.volume import CaptureVolume

    scene = default_ring_scene(n_cameras=3, n_frames=10, seed=21)
    vol = CaptureVolume.bootstrap(scene.image_points_noisy(), scene.cameras)
    return vol


def _to_reference_volume(vol, ref):
    pd = ref["pd"]
    cams = {}
    for cid, c in vol.camera_array.cameras.items():
        cams[cid] = ref["CameraData"](
            cam_id=cid,
            size=tuple(c.size),
            matrix=np.array(c.matrix, dtype=float),
            distortions=np.array(c.distortions, dtype=float),
            rotation=np.array(c.rotation, dtype=float),
            translation=np.array(c.translation, dtype=float),
            fisheye=bool(c.fisheye),
        )
    ip = vol.image_points
    ip_df = pd.DataFrame(
        {
            "sync_index": ip.sync_index.astype(int),
            "cam_id": ip.cam_id.astype(int),
            "object_id": ip.object_id.astype(int),
            "keypoint_id": ip.keypoint_id.astype(int),
            "img_loc_x": ip.img_xy[:, 0],
            "img_loc_y": ip.img_xy[:, 1],
            "obj_loc_x": ip.obj_loc[:, 0],
            "obj_loc_y": ip.obj_loc[:, 1],
            "obj_loc_z": ip.obj_loc[:, 2],
        }
    )
    wp = vol.world_points
    wp_df = pd.DataFrame(
        {
            "sync_index": wp.sync_index.astype(int),
            "object_id": wp.object_id.astype(int),
            "keypoint_id": wp.keypoint_id.astype(int),
            "x_coord": wp.xyz[:, 0],
            "y_coord": wp.xyz[:, 1],
            "z_coord": wp.xyz[:, 2],
            "frame_time": np.nan,
        }
    )
    return ref["CaptureVolume"](
        camera_array=ref["CameraArray"](cameras=cams),
        image_points=ref["ImagePoints"](ip_df),
        world_points=ref["WorldPoints"](wp_df),
    )


def _our_rmse_of(vol, ref_volume):
    """Score the reference's converged solution with OUR reprojection metric
    by copying its cameras + points back into our CaptureVolume."""
    from caliscope_tpu.volume import CaptureVolume

    cams = vol.camera_array.copy()
    for cid, rc in ref_volume.camera_array.cameras.items():
        cams.cameras[cid].rotation = np.array(rc.rotation, dtype=float)
        cams.cameras[cid].translation = np.array(rc.translation, dtype=float).reshape(3)
        cams.cameras[cid].matrix = np.array(rc.matrix, dtype=float)
        cams.cameras[cid].distortions = np.array(rc.distortions, dtype=float).ravel()
    df = ref_volume.world_points.df
    xyz = df[["x_coord", "y_coord", "z_coord"]].to_numpy()
    back = CaptureVolume(
        camera_array=cams,
        image_points=vol.image_points,
        world_points=vol.world_points.with_xyz(xyz),
        constraints=vol.constraints,
    )
    return back, back.reprojection_report.overall_rmse


@pytest.fixture(scope="module")
def solved_pair(reference_modules):
    """Both engines run once on the identical bootstrapped problem."""
    vol = _shared_problem()
    ours = vol.optimize()
    ref_opt = _to_reference_volume(vol, reference_modules).optimize()
    return vol, ours, ref_opt


class TestBundleAdjustmentOracle:
    def test_matches_scipy_trf_on_identical_problem(self, reference_modules, solved_pair):
        vol, ours, ref_opt = solved_pair
        rmse_initial = vol.reprojection_report.overall_rmse
        rmse_ours = ours.reprojection_report.overall_rmse
        _, rmse_ref = _our_rmse_of(vol, ref_opt)

        # Both must improve on the bootstrap and agree at convergence: the
        # problem has one basin here, so independent solvers land together.
        assert rmse_ours < rmse_initial
        assert rmse_ref < rmse_initial
        assert rmse_ours == pytest.approx(rmse_ref, rel=0.02), (
            f"ours {rmse_ours:.5f}px vs scipy-TRF {rmse_ref:.5f}px"
        )

    def test_camera_geometry_agrees_with_scipy_trf(self, reference_modules, solved_pair):
        vol, ours, ref_opt = solved_pair
        back, _ = _our_rmse_of(vol, ref_opt)

        for cid in ours.camera_array.posed_cameras:
            c_ours = ours.camera_array.cameras[cid]
            c_ref = back.camera_array.cameras[cid]
            center_ours = -c_ours.rotation.T @ c_ours.translation
            center_ref = -c_ref.rotation.T @ c_ref.translation
            assert np.linalg.norm(center_ours - center_ref) < 2e-3, (
                f"camera {cid} centers differ by "
                f"{np.linalg.norm(center_ours - center_ref) * 1000:.2f} mm"
            )
            rel = c_ours.rotation @ c_ref.rotation.T
            angle = np.degrees(np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1)))
            assert angle < 0.1, f"camera {cid} rotations differ by {angle:.4f} deg"

    @pytest.mark.slow
    def test_soft_l1_agrees_under_contamination(self, reference_modules):
        """Same robust-loss semantics: inject gross outliers, run both
        engines with soft_l1 at 1px scale, solutions must still agree."""
        vol = _shared_problem()
        rng = np.random.default_rng(5)
        ip = vol.image_points
        n_bad = max(4, len(ip) // 50)
        bad = rng.choice(len(ip), size=n_bad, replace=False)
        xy = ip.img_xy.copy()
        xy[bad] += rng.uniform(30, 80, size=(n_bad, 2)) * rng.choice([-1, 1], (n_bad, 2))
        from caliscope_tpu.observations import ImagePoints
        from caliscope_tpu.volume import CaptureVolume

        dirty = CaptureVolume(
            camera_array=vol.camera_array,
            image_points=ImagePoints(
                sync_index=ip.sync_index,
                cam_id=ip.cam_id,
                object_id=ip.object_id,
                keypoint_id=ip.keypoint_id,
                img_xy=xy,
                obj_loc=ip.obj_loc,
                frame_time=ip.frame_time,
            ),
            world_points=vol.world_points,
            constraints=vol.constraints,
        )
        f = dirty.pixel_f_scale(1.0)
        # IRLS on heavy contamination converges slowly in both engines; give
        # headroom and compare the solutions, not the termination flags
        ours = dirty.optimize(loss="soft_l1", f_scale=f, max_nfev=600, strict=False)
        ref_opt = _to_reference_volume(dirty, reference_modules).optimize(
            loss="soft_l1", f_scale=f
        )
        _, rmse_ref = _our_rmse_of(dirty, ref_opt)
        rmse_ours = ours.reprojection_report.overall_rmse
        assert rmse_ours == pytest.approx(rmse_ref, rel=0.05), (
            f"robust: ours {rmse_ours:.5f}px vs scipy-TRF {rmse_ref:.5f}px"
        )


class TestFilterSemanticsOracle:
    def test_percentile_filter_keeps_the_same_observations(self, reference_modules, solved_pair):
        """The production filter (worst 2.5% per camera, safety floor) must
        retain the same observation keyset as the reference's on the same
        optimized volume — the thresholds come from each engine's own
        reprojection report, so this also cross-checks the error metric."""
        vol, ours, ref_opt = solved_pair
        ours_f = ours.filter_by_percentile_error(2.5)

        # mirror our converged solution into the reference and filter there
        ref_mirror = _to_reference_volume(ours, reference_modules)
        ref_f = ref_mirror.filter_by_percentile_error(2.5)

        def keyset(sync, cam, obj, kp):
            return set(zip(map(int, sync), map(int, cam), map(int, obj), map(int, kp)))

        ours_keys = keyset(
            ours_f.image_points.sync_index,
            ours_f.image_points.cam_id,
            ours_f.image_points.object_id,
            ours_f.image_points.keypoint_id,
        )
        rdf = ref_f.image_points.df
        ref_keys = keyset(rdf["sync_index"], rdf["cam_id"], rdf["object_id"], rdf["keypoint_id"])
        only_ours = ours_keys - ref_keys
        only_ref = ref_keys - ours_keys
        # identical solutions -> identical errors; allow a hair of slack for
        # observations sitting exactly on the percentile boundary
        slack = max(2, len(ours_keys) // 500)
        assert len(only_ours) <= slack and len(only_ref) <= slack, (
            f"filter keysets diverge: {len(only_ours)} only-ours, {len(only_ref)} only-reference"
        )


class TestAnchoringOracle:
    """The anchoring suite was written from scratch (different code, same
    contract — reference capture_volume.py:833-1331); executing the
    reference on the identical volume proves the contract held."""

    def _pose_delta(self, ours_vol, ref_vol):
        worst_center, worst_angle = 0.0, 0.0
        for cid, c in ours_vol.camera_array.posed_cameras.items():
            rc = ref_vol.camera_array.cameras[cid]
            ours_center = -c.rotation.T @ c.translation
            ref_center = -np.asarray(rc.rotation).T @ np.asarray(rc.translation).reshape(3)
            worst_center = max(worst_center, float(np.linalg.norm(ours_center - ref_center)))
            rel = c.rotation @ np.asarray(rc.rotation).T
            ang = np.degrees(np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1)))
            worst_angle = max(worst_angle, float(ang))
        return worst_center, worst_angle

    def test_align_rotate_translate_ground_center_match(self, reference_modules, solved_pair):
        _vol, ours, _ref = solved_pair
        ref_mirror = _to_reference_volume(ours, reference_modules)

        sync = int(ours.image_points.sync_index[0])
        ours_chain = (
            ours.align_to_object(sync, object_id=0)
            .rotate("z", 30.0)
            .translate(x=0.1, y=-0.2, z=0.05)
            .grounded()
            .centered()
        )
        ref_chain = (
            ref_mirror.align_to_object(sync, object_id=0)
            .rotate("z", 30.0)
            .translate(x=0.1, y=-0.2, z=0.05)
            .grounded()
            .centered()
        )
        dc, da = self._pose_delta(ours_chain, ref_chain)
        assert dc < 1e-6, f"camera centers diverge by {dc * 1000:.4f} mm after anchoring chain"
        assert da < 1e-4, f"camera rotations diverge by {da:.6f} deg after anchoring chain"

    def test_scaled_camera_distance_cue_matches(self, reference_modules, solved_pair):
        _vol, ours, _ref = solved_pair
        import caliscope.core.scale_cues as ref_cues

        from caliscope_tpu.scale import CameraDistance

        cams = sorted(ours.camera_array.posed_cameras)
        a, b = cams[0], cams[1]
        ours_scaled = ours.scaled(CameraDistance(cam_a=a, cam_b=b, meters=3.21))
        ref_scaled = _to_reference_volume(ours, reference_modules).scaled(
            ref_cues.CameraDistance(cam_a=a, cam_b=b, meters=3.21)
        )
        dc, da = self._pose_delta(ours_scaled, ref_scaled)
        assert dc < 1e-6 and da < 1e-4, f"scaled() diverges: {dc * 1000:.4f} mm / {da:.6f} deg"


class TestTrcExportOracle:
    def test_trc_headers_match_and_data_is_correct(self, reference_modules, tmp_path):
        """OpenSim interop, checked against the executed reference writer.

        Headers must match field-for-field. Data rows are checked against the
        SOURCE xyz instead of the reference's rows: the reference writer has
        a column-ordering bug (trc_export.py:58 inserts mean_frame_time into
        the alphabetized marker columns, then :77 slices columns[2:], which
        re-includes Time and silently drops the first marker's X) — its data
        section emits Time twice and loses one coordinate. We verify our
        writer does NOT reproduce that shift.
        """
        pd = reference_modules["pd"]
        import caliscope.export.trc_export as ref_trc

        from caliscope_tpu.export.trc import xyz_to_trc
        from caliscope_tpu.observations import WorldPoints

        rng = np.random.default_rng(9)
        n_frames, n_kp = 12, 3
        sync = np.repeat(np.arange(n_frames), n_kp)
        kp = np.tile(np.arange(n_kp), n_frames)
        xyz = rng.normal(size=(n_frames * n_kp, 3))
        ft = sync / 30.0

        class NamedTracker:
            name = "TEST"

            def get_point_name(self, keypoint_id):
                return f"kp{int(keypoint_id)}"

        wp = WorldPoints(
            sync_index=sync, object_id=np.zeros_like(sync), keypoint_id=kp, xyz=xyz, frame_time=ft
        )
        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        ours_path = xyz_to_trc(wp, NamedTracker(), tmp_path / "a" / "out.trc")
        ref_df = pd.DataFrame(
            {
                "sync_index": sync,
                "object_id": 0,
                "keypoint_id": kp,
                "x_coord": xyz[:, 0],
                "y_coord": xyz[:, 1],
                "z_coord": xyz[:, 2],
                "frame_time": ft,
            }
        )
        ref_trc.xyz_to_trc(ref_df, NamedTracker(), tmp_path / "b" / "out.trc")
        ours_lines = Path(ours_path).read_text().splitlines()
        ref_lines = (tmp_path / "b" / "out.trc").read_text().splitlines()

        # headers field-for-field identical (line 0 embeds the output path)
        norm = lambda line: line.rstrip("\t ").replace(str(tmp_path / "a"), "P").replace(
            str(tmp_path / "b"), "P"
        )
        for i in range(5):
            assert norm(ours_lines[i]) == norm(ref_lines[i]), (
                f"header line {i} differs:\n ours: {ours_lines[i]!r}\n  ref: {ref_lines[i]!r}"
            )

        # our data rows: Frame, Time, then exactly 3 coords per marker that
        # reproduce the source xyz in alphabetical marker order
        data = [l.split("\t") for l in ours_lines[6:] if l.strip()]
        assert len(data) == n_frames
        for f_i, row in enumerate(data):
            assert len(row) == 2 + 3 * n_kp, f"row {f_i} has {len(row)} fields"
            assert int(row[0]) == f_i
            assert float(row[1]) == pytest.approx(f_i / 30.0, abs=5e-4)
            coords = np.array([float(v) for v in row[2:]]).reshape(n_kp, 3)
            np.testing.assert_allclose(coords, xyz[f_i * n_kp : (f_i + 1) * n_kp], atol=1e-6)

        # and the reference bug is real + not reproduced: its data rows
        # duplicate the Time field; ours must not
        ref_row = ref_lines[6].split("\t")
        ours_row = ours_lines[6].split("\t")
        assert ref_row[1] == ref_row[2], "reference writer changed: revisit this oracle"
        assert ours_row[1] != ours_row[2] or float(ours_row[2]) != float(ours_row[1])


class TestAniposelibExportOracle:
    def test_aniposelib_toml_matches_reference_writer(self, reference_modules, solved_pair, tmp_path):
        """Pose2Sim/anipose interop: both writers must produce semantically
        identical cam_N sections (name/size/matrix/distortions/rotation as
        Rodrigues/translation) for the same calibrated rig."""
        import tomllib

        _vol, ours, _ref = solved_pair
        ours_path = tmp_path / "ours_anipose.toml"
        ours.camera_array.to_aniposelib_toml(ours_path)

        # reference writer needs rtoml.dump; lend it our first-party emitter
        import caliscope.persistence  # noqa: F401 — ensure the module's rtoml ref exists

        from caliscope_tpu.persistence import toml_dumps

        rtoml_shim = sys.modules["rtoml"]
        if not hasattr(rtoml_shim, "dump"):
            rtoml_shim.dump = lambda data, f: f.write(toml_dumps(data))
        ref_mirror = _to_reference_volume(ours, reference_modules)
        ref_path = tmp_path / "ref_anipose.toml"
        ref_mirror.camera_array.to_aniposelib_toml(ref_path)

        ours_data = tomllib.loads(ours_path.read_text())
        ref_data = tomllib.loads(ref_path.read_text())
        # metadata sections may differ; every cam_N section must agree
        cam_keys = {k for k in ref_data if k.startswith("cam_")}
        assert cam_keys and cam_keys == {k for k in ours_data if k.startswith("cam_")}
        for k in sorted(cam_keys):
            o, r = ours_data[k], ref_data[k]
            assert o["name"] == r["name"] and list(o["size"]) == list(r["size"])
            np.testing.assert_allclose(o["matrix"], r["matrix"], atol=1e-12)
            np.testing.assert_allclose(o["distortions"], r["distortions"], atol=1e-12)
            np.testing.assert_allclose(o["rotation"], r["rotation"], atol=1e-9)
            np.testing.assert_allclose(o["translation"], r["translation"], atol=1e-12)


class TestEpipolarBootstrapOracle:
    @pytest.mark.slow
    def test_markerless_rig_matches_reference_epipolar_builder(self, reference_modules):
        """Markerless bootstrap cross-check: the reference's cv2-based
        essential-matrix builder (findEssentialMat/recoverPose RANSAC,
        epipolar_pose_builder.py:281) and our vmapped 8-point RANSAC run on
        identical correspondences; the recovered rigs must agree up to the
        path's inherent scale gauge (unit scaffold baseline both sides)."""
        from caliscope.core.bootstrap_pose.build_paired_pose_network import (
            build_paired_pose_network as ref_build,
        )

        from caliscope_tpu.ops.similarity import umeyama
        from caliscope_tpu.solvers.pose_network import build_pose_network
        from caliscope_tpu.synthetic.camera_synthesizer import strip_extrinsics
        from caliscope_tpu.synthetic.factories import default_ring_scene

        scene = default_ring_scene(noise_sigma_px=0.5, n_frames=25)
        ip = scene.image_points_noisy()
        ip = type(ip)(
            sync_index=ip.sync_index,
            cam_id=ip.cam_id,
            object_id=ip.object_id,
            keypoint_id=ip.keypoint_id,
            img_xy=ip.img_xy,
            obj_loc=np.full_like(ip.obj_loc, np.nan),
            frame_time=ip.frame_time,
        )
        cams = strip_extrinsics(scene.cameras)

        ours_net = build_pose_network(ip, cams)
        ours_cams = cams.copy()
        ours_net.apply_to(ours_cams)

        # reference side: identical observations, markerless (NaN obj_loc)
        pd = reference_modules["pd"]
        ref_ip = reference_modules["ImagePoints"](
            pd.DataFrame(
                {
                    "sync_index": ip.sync_index.astype(int),
                    "cam_id": ip.cam_id.astype(int),
                    "object_id": ip.object_id.astype(int),
                    "keypoint_id": ip.keypoint_id.astype(int),
                    "img_loc_x": ip.img_xy[:, 0],
                    "img_loc_y": ip.img_xy[:, 1],
                    "obj_loc_x": np.nan,
                    "obj_loc_y": np.nan,
                    "obj_loc_z": np.nan,
                }
            )
        )
        ref_cams = reference_modules["CameraArray"](
            cameras={
                cid: reference_modules["CameraData"](
                    cam_id=cid,
                    size=tuple(c.size),
                    matrix=np.array(c.matrix, dtype=float),
                    distortions=np.array(c.distortions, dtype=float),
                )
                for cid, c in cams.cameras.items()
            }
        )
        ref_net = ref_build(ref_ip, ref_cams)
        ref_net.apply_to(ref_cams)

        centers_ours = {
            cid: -c.rotation.T @ c.translation for cid, c in ours_cams.posed_cameras.items()
        }
        centers_ref = {
            cid: -np.asarray(c.rotation).T @ np.asarray(c.translation).reshape(3)
            for cid, c in ref_cams.cameras.items()
            if c.rotation is not None and c.translation is not None
        }
        ids = sorted(set(centers_ours) & set(centers_ref))
        assert len(ids) == len(cams.cameras), f"rigs pose different cameras: {ids}"
        src = np.array([centers_ours[c] for c in ids])
        dst = np.array([centers_ref[c] for c in ids])
        s, R, t = umeyama(src, dst, with_scale=True)
        aligned = float(np.asarray(s)) * (np.asarray(R) @ src.T).T + np.asarray(t)
        errs = np.linalg.norm(aligned - dst, axis=1)
        # both rigs are noisy pre-BA estimates of the same geometry
        rig_diameter = float(np.linalg.norm(dst.max(0) - dst.min(0)))
        assert errs.max() < 0.03 * rig_diameter, (
            f"rigs disagree: max {errs.max():.4f} on diameter {rig_diameter:.3f}"
        )
