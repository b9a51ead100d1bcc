"""End-to-end workspace test: rendered videos -> detection -> calibration.

The full product loop on synthetic imagery with exactly known ground truth:
charuco videos are RENDERED (cv2 warp of a board image through known camera
projections), written into a reference-compatible workspace, then the whole
workflow runs through the Workspace orchestration — intrinsic calibration,
synchronized extraction, extrinsic calibration — and recovered camera poses
are Procrustes-compared to the ground truth rig.

This exercises, in one pass: FrameSource decode, sync mapping, the TPU
detection kernels, frame selection, the intrinsic solver, PnP bootstrap,
bundle adjustment, filtering, and persistence.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from caliscope_tpu.ops.similarity import umeyama
from caliscope_tpu.repositories import TargetRouting
from caliscope_tpu.targets import Charuco
from caliscope_tpu.workspace import StepStatus, Workspace

pytestmark = pytest.mark.slow

ROWS, COLS, SQ = 5, 7, 0.09
VOLUME_CENTER = np.array([0.0, 0.0, 0.55])
SQ_PX = 84
MARGIN = 40
IMG_SIZE = (640, 480)


def _board_image(ch: Charuco):
    cvd = cv2.aruco.getPredefinedDictionary(getattr(cv2.aruco, ch.dictionary))
    board = cv2.aruco.CharucoBoard((ch.columns, ch.rows), ch.square_size_m, ch.square_size_m * ch.aruco_scale, cvd)
    px = int(ch.columns * SQ_PX + 2 * MARGIN)
    py = int(ch.rows * SQ_PX + 2 * MARGIN)
    return board.generateImage((px, py), marginSize=MARGIN)


def _board_px_of_metric(xy_m):
    """Board-frame meters -> base-image pixel coords."""
    return np.array([MARGIN + xy_m[0] / SQ * SQ_PX - 0.5, MARGIN + xy_m[1] / SQ * SQ_PX - 0.5])


def _gt_cameras(n=4, f=900.0):
    """Ring of pinhole cameras aimed at the working volume (zero distortion
    keeps the warp exact)."""
    from caliscope_tpu.cameras import CameraArray, CameraData

    cams = {}
    for i in range(n):
        a = 2 * np.pi * i / n
        c = np.array([1.8 * np.cos(a), 1.8 * np.sin(a), 0.7])
        z = (VOLUME_CENTER - c) / np.linalg.norm(VOLUME_CENTER - c)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        K = np.array([[f, 0, IMG_SIZE[0] / 2], [0, f, IMG_SIZE[1] / 2], [0, 0, 1.0]])
        cams[i] = CameraData(cam_id=i, size=IMG_SIZE, matrix=K, distortions=np.zeros(5), rotation=R, translation=-R @ c)
    return CameraArray(cams)


def _render_frame(board_img, cam, board_pose_R, board_pose_t):
    """Warp the board image into the camera view via the exact homography."""
    bw, bh = COLS * SQ, ROWS * SQ
    board_corners_m = np.array([[0, 0, 0], [bw, 0, 0], [bw, bh, 0], [0, bh, 0]], float)
    world = (board_pose_R @ board_corners_m.T).T + board_pose_t
    camf = (cam.rotation @ world.T).T + cam.translation
    if (camf[:, 2] < 0.1).any():
        return np.full((IMG_SIZE[1], IMG_SIZE[0]), 255, np.uint8)
    # backface culling: a one-sided printed board is blank from behind.
    # Board axes: x right, y DOWN (image-row convention), so the printed
    # face's outward normal is -z in board coordinates.
    normal_w = board_pose_R @ np.array([0.0, 0.0, -1.0])
    center_w = world.mean(axis=0)
    cam_center = -cam.rotation.T @ cam.translation
    if np.dot(cam_center - center_w, normal_w) <= 0.05:
        return np.full((IMG_SIZE[1], IMG_SIZE[0]), 255, np.uint8)
    uv = (cam.matrix @ (camf / camf[:, 2:3]).T).T[:, :2]
    src = np.array([_board_px_of_metric(p[:2]) for p in board_corners_m], np.float32)
    H = cv2.getPerspectiveTransform(src, uv.astype(np.float32))
    img = cv2.warpPerspective(board_img, H, IMG_SIZE, borderValue=255)
    return cv2.GaussianBlur(img, (3, 3), 0.7)


def _write_video(path, frames, fps=30.0):
    path.parent.mkdir(parents=True, exist_ok=True)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, IMG_SIZE, isColor=False)
    for f in frames:
        w.write(f)
    w.release()


def _rot(axis, ang):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


def build_workspace(root):
    """Render the full synthetic project into `root` (reused by diagnostics)."""
    ws = Workspace.create(root)
    ch = Charuco(rows=ROWS, columns=COLS, square_size_m=SQ)
    ws.targets.save_intrinsic_charuco(ch)
    ws.targets.save_routing(TargetRouting(intrinsic="charuco", extrinsic="charuco"))
    board_img = _board_image(ch)
    gt = _gt_cameras()
    rng = np.random.default_rng(3)

    # intrinsic videos: board waved in front of each camera. The camera sees
    # the board's printed face (-z board normal) when the board's +z axis
    # points along the optical axis, i.e. base orientation = cam.rotation.T.
    for cid, cam in gt.cameras.items():
        frames = []
        center = -cam.rotation.T @ cam.translation  # camera position
        fwd = cam.rotation.T @ np.array([0, 0, 1.0])
        for t in range(30):
            depth = 1.0 + 0.8 * (t % 10) / 10
            pos = center + fwd * depth
            R = cam.rotation.T @ _rot(rng.normal(size=3), rng.uniform(0.05, 0.55))
            offs = R @ np.array([COLS * SQ / 2, ROWS * SQ / 2, 0.0])
            frames.append(_render_frame(board_img, cam, R, pos - offs + rng.uniform(-0.06, 0.06, 3)))
        _write_video(ws.video_path("intrinsic", cid), frames)

    # extrinsic videos: "station" sweep — the board pauses at 8 azimuths
    # (facing each camera and each camera-pair bisector) with tilt and height
    # variation, like an operator showing the board around the room. Verified
    # by visibility simulation to give every adjacent pair shared frontal
    # views at detectable marker scales.
    n_per = 12
    n_frames = 8 * n_per
    for cid, cam in gt.cameras.items():
        frames = []
        for t in range(n_frames):
            station, j = t // n_per, t % n_per
            az = 2 * np.pi * station / 8
            tilt = 1.25 + 0.15 * np.sin(2 * np.pi * j / n_per)
            pos = VOLUME_CENTER + np.array(
                [0.05 * np.cos(az + j), 0.05 * np.sin(az + j), 0.12 * np.sin(2 * np.pi * j / n_per + station)]
            )
            R = _rot([0, 0, 1], az) @ _rot([1, 0, 0], tilt)
            offs = R @ np.array([COLS * SQ / 2, ROWS * SQ / 2, 0.0])
            frames.append(_render_frame(board_img, cam, R, pos - offs))
        _write_video(ws.video_path("extrinsic", cid), frames)

    return ws, gt


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    return build_workspace(tmp_path_factory.mktemp("ws"))


class TestWorkflow:
    def test_full_pipeline(self, workspace):
        ws, gt = workspace
        ws.ensure_cameras_from_videos()
        st = ws.get_workflow_status()
        assert st.camera_count == 4
        assert st.intrinsic_step_status is StepStatus.AVAILABLE

        # intrinsics per camera (our detector + our Zhang/LM solver)
        for cid in ws.get_cam_ids():
            out = ws.run_intrinsic_calibration(cid, frame_step=1, progress=None)
            assert out.report.rmse < 1.0
            f_true = gt.cameras[cid].matrix[0, 0]
            assert abs(out.camera.matrix[0, 0] - f_true) / f_true < 0.03, (
                cid, out.camera.matrix[0, 0], f_true,
            )

        # synchronized extraction
        points = ws.extract_extrinsic_points(progress=None)
        assert len(points) > 500
        assert set(np.unique(points.cam_id)) == {0, 1, 2, 3}
        assert ws.get_workflow_status().extrinsic_2d_step_status is StepStatus.COMPLETE

        # extrinsic calibration
        run = ws.run_extrinsic_calibration(progress=None)
        volume = run.capture_volume
        assert volume.reprojection_report.overall_rmse < 1.0

        # Procrustes-compare camera centers to ground truth
        est = {cid: -c.rotation.T @ c.translation for cid, c in volume.camera_array.posed_cameras.items()}
        gtc = {cid: -c.rotation.T @ c.translation for cid, c in gt.cameras.items()}
        ids = sorted(set(est) & set(gtc))
        assert len(ids) == 4
        src = np.array([est[c] for c in ids])
        dst = np.array([gtc[c] for c in ids])
        s, R, t = umeyama(src, dst, with_scale=True)
        aligned = float(np.asarray(s)) * (np.asarray(R) @ src.T).T + np.asarray(t)
        errs = np.linalg.norm(aligned - dst, axis=1)
        assert errs.max() < 0.02, errs  # within 2 cm end-to-end from pixels
        # scale close to metric (board geometry anchors it)
        assert abs(float(np.asarray(s)) - 1.0) < 0.03

        assert ws.get_workflow_status().extrinsic_calibration_step_status is StepStatus.COMPLETE
        # persisted round trip
        assert ws.capture_volume.exists()
        reloaded = ws.capture_volume.load()
        assert reloaded.reprojection_report.overall_rmse == pytest.approx(
            volume.reprojection_report.overall_rmse, abs=1e-6
        )
