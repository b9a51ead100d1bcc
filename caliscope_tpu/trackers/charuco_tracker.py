"""ChArUco corner tracker: markers -> board homography -> X-corner snap.

Parity: reference src/caliscope/trackers/charuco_tracker.py:16-143 —
corner identity (object_id 0, keypoint_id = chessboard corner index),
mirror detection with a per-camera hint cache (:56-69, avoids the
wrong-orientation retry cost), two-sided identity split (back face =
object_id 1 at obj_loc z = +thickness, :77-85).

TPU-native pipeline (vs cv2.aruco.CharucoDetector.detectBoard + cornerSubPix):
1. detect ArUco markers (detect/aruco.py — one batched device program);
2. fit the board->image homography from decoded marker corners (the board is
   planar, so one homography is exact);
3. project expected chessboard corners, snap each to the nearest detected
   X-corner (detect/corners.py response + NMS + saddle subpixel);
4. unmatched expected corners are simply not emitted (partial boards fine).
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from caliscope_tpu.detect.aruco import assemble_marker_detections, detect_markers, marker_graph
from caliscope_tpu.detect.corners import detect_x_corners_device, xcorner_graph
from caliscope_tpu.detect.dictionaries import get_dictionary
from caliscope_tpu.packets import PixelFormat, PointPacket
from caliscope_tpu.targets.charuco import Charuco
from caliscope_tpu.tracker import Tracker

logger = logging.getLogger(__name__)

MIN_MARKERS_FOR_BOARD = 1
X_CORNER_KMAX = 256
_RUN_CHUNK = 8  # frames per device dispatch in _run_stack (see its docstring)


@partial(
    jax.jit, static_argnames=("n_bits", "k_max", "patch", "min_area", "ccl_iters", "x_kmax", "use_pallas", "packed4")
)
def _charuco_device_program(
    images,
    n_bits: int,
    k_max: int,
    patch: int,
    min_area: int,
    ccl_iters: int,
    x_kmax: int,
    use_pallas: bool,
    packed4: bool = False,
):
    """Markers + X-corners for a whole frame stack as ONE device program.

    One dispatch and one host->device upload per stack: through the TPU
    tunnel each dispatch costs ~50 ms of latency, so the charuco tracker's
    two detection stages (marker pipeline, X-corner pipeline) must not be
    separate programs. The uint8->float cast also happens on device, halving
    upload bytes vs shipping float32 frames.

    packed4: the input is (B, H, W // 2) uint8 holding two 4-bit pixels per
    byte (host `_pack4`); unpacked on device back to (B, H, W) gray in
    0..255. Halves the upload again for the link-bound half-res pass — the
    stages only need coarse candidates from it (bit decode averages whole
    cells, X-corner candidates are snapped then re-polished at full res
    host-side), so 16 gray levels are enough; see CharucoTracker docstring.
    """
    if packed4:
        hi = (images >> 4).astype(jnp.float32) * 17.0
        lo = (images & 0xF).astype(jnp.float32) * 17.0
        B_, H_, W2 = images.shape
        imgs = jnp.stack([hi, lo], axis=-1).reshape(B_, H_, W2 * 2)
    else:
        imgs = images.astype(jnp.float32) if images.dtype != jnp.float32 else images
    quads, cells, valid, _areas = marker_graph(imgs, n_bits, k_max, patch, min_area, ccl_iters)
    xy, _score, xvalid = xcorner_graph(imgs, x_kmax, use_pallas)
    # ONE flat f32 output: fetching a tuple pays the tunnel round-trip per
    # array (~27 ms each through the remote-device link); a single packed
    # buffer pays it once. The host unpacks by the statically-known shapes
    # (see _unpack_device_program).
    B = imgs.shape[0]
    return jnp.concatenate(
        [
            quads.reshape(B, -1),
            cells.reshape(B, -1).astype(jnp.float32),
            valid.reshape(B, -1).astype(jnp.float32),
            xy.reshape(B, -1),
            xvalid.reshape(B, -1).astype(jnp.float32),
        ],
        axis=1,
    )


def _unpack_device_program(packed: np.ndarray, n_bits: int, k_max: int, x_kmax: int):
    """Split the packed (B, :) device output back into
    (quads, cells, valid, xy, xvalid) by the program's static shapes."""
    B = packed.shape[0]
    nc = n_bits + 2
    sizes = [k_max * 4 * 2, k_max * nc * nc, k_max, x_kmax * 2, x_kmax]
    assert packed.shape[1] == sum(sizes), "packed layout drifted from the device program"
    offs = np.cumsum([0] + sizes)
    quads = packed[:, offs[0] : offs[1]].reshape(B, k_max, 4, 2)
    cells = packed[:, offs[1] : offs[2]].reshape(B, k_max, nc, nc)
    valid = packed[:, offs[2] : offs[3]].reshape(B, k_max) > 0.5
    xy = packed[:, offs[3] : offs[4]].reshape(B, x_kmax, 2)
    xvalid = packed[:, offs[4] : offs[5]].reshape(B, x_kmax) > 0.5
    return quads, cells, valid, xy, xvalid


@jax.jit
def _concat_chunks(outs):
    """On-device concat of the chunks' packed outputs so the host pays ONE
    d2h round trip for the whole stack (see _run_stack_chunks)."""
    return jnp.concatenate(outs, axis=0)


def _fit_homography(src: np.ndarray, dst: np.ndarray) -> np.ndarray | None:
    """Plain-numpy normalized DLT (board plane -> image)."""
    from caliscope_tpu.frame_selector import _frame_homography

    return _frame_homography(src, dst)


def _boxsum(stack: np.ndarray, s: int) -> np.ndarray:
    """u16 s x s box sum via cascaded hand-unrolled 2x2 strided adds.

    A reshape(B, h, s, w, s).sum(axis=(2, 4)) forces a full-size u16 copy
    with stride-hostile reduction axes (measured 80+ ms per 720p 16-stack
    at s=4); four strided slice-adds per halving touch the source once and
    shrink 4x each stage (~15 ms). s in {2, 4}: 255 * 16 fits u16."""
    assert s in (2, 4) and stack.dtype == np.uint8
    B, H, W = stack.shape
    hs, ws = H // s, W // s
    v = stack[:, : hs * s, : ws * s]
    acc = (
        v[:, 0::2, 0::2].astype(np.uint16)
        + v[:, 1::2, 0::2]
        + v[:, 0::2, 1::2]
        + v[:, 1::2, 1::2]
    )
    if s == 4:
        acc = acc[:, 0::2, 0::2] + acc[:, 1::2, 0::2] + acc[:, 0::2, 1::2] + acc[:, 1::2, 1::2]
    return acc


def _downsample(stack: np.ndarray, s: int) -> np.ndarray:
    """s x s mean downsample, host-side (keeps the source dtype's range)."""
    if stack.dtype == np.uint8:
        acc = _boxsum(stack, s)
        return ((acc + s * s // 2) // (s * s)).astype(np.uint8)
    B, H, W = stack.shape
    hs, ws = H // s, W // s
    v = stack[:, : hs * s, : ws * s].reshape(B, hs, s, ws, s)
    return v.mean(axis=(2, 4)).astype(stack.dtype)


def _downsample2(stack: np.ndarray) -> np.ndarray:
    return _downsample(stack, 2)


def _downsample_pack4(stack: np.ndarray, s: int) -> np.ndarray:
    """Fused s x s-mean downsample + 4-bit pack for uint8 stacks: quantizes
    straight off the u16 s x s box sum (q = (sum + s^2*8) >> log2(s^2*16)),
    skipping the intermediate low-res u8 plane's write+read."""
    acc = _boxsum(stack, s)
    ws2 = acc.shape[2] // 2 * 2  # low-res width must be even to pack
    acc = acc[:, :, :ws2]
    shift = (s * s * 16).bit_length() - 1  # s power of two: exact log2
    q = np.minimum((acc + s * s * 8) >> shift, 15).astype(np.uint8)
    return (q[:, :, 0::2] << 4) | q[:, :, 1::2]


def _pack4(stack: np.ndarray) -> np.ndarray:
    """Pack a (B, H, W) uint8 stack into (B, H, W // 2) bytes of two 4-bit
    pixels (round-to-nearest-16; device unpack maps q -> q * 17). W odd
    drops the last column — callers only ever pack the even-width half-res
    plane."""
    assert stack.dtype == np.uint8
    w2 = stack.shape[2] // 2
    q = np.minimum((stack[:, :, : w2 * 2].astype(np.uint16) + 8) >> 4, 15).astype(np.uint8)
    return (q[:, :, 0::2] << 4) | q[:, :, 1::2]


def _prefetched(gen, depth: int = 2):
    """Run a generator on a background thread with a small buffer: the
    consumer's host-side work then overlaps the generator's blocking device
    fetches (numpy and the device runtime release the GIL while waiting)."""
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=depth)
    END = object()

    def worker():
        try:
            for item in gen:
                q.put(item)
            q.put(END)
        except BaseException as e:  # forwarded to the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class CharucoTracker(Tracker):
    def __init__(
        self,
        charuco: Charuco,
        snap_radius_frac: float = 0.35,
        detect_scale: int | str = "auto",
        upload_bits: int | str = "auto",
    ):
        """detect_scale: 1 runs the device pipeline at full resolution;
        2 runs it on 2x2-mean downsampled frames and polishes the surviving
        corner candidates at full resolution HOST-side (the frames are
        already in host memory — no second upload). "auto" picks 2 for
        frames >= 600 px tall: host->device bytes are the end-to-end
        bottleneck on remote-attached devices (~4x fewer bytes), and
        full-res window refinement keeps subpixel accuracy.

        upload_bits: 8 ships the half-res pass as uint8; 4 packs two
        4-bit pixels per byte (half the upload again). 16 gray levels are
        enough for THIS pass — bit decode averages whole cells, quad edges
        are total-least-squares fits over a band of pixels, and X-corner
        candidates only seed the snap gates before the full-res host
        polish; the weak-detection full-res retry (always 8-bit) backstops
        low-contrast frames. "auto" packs exactly when the half-res pass is
        active on an accelerator backend (uploads are the bottleneck there;
        the CPU backend runs full-res uint8)."""
        self.charuco = charuco
        self.snap_radius_frac = snap_radius_frac
        self.detect_scale = detect_scale
        self.upload_bits = upload_bits
        self._mirror_hint: dict[int, bool] = {}  # cam_id -> saw mirrored last
        self._scale_hint: dict[int, int] = {}  # cam_id -> promoted coarse scale
        self._marker_board_corners = self._compute_marker_board_corners()
        self._inner_corners_2d = None  # cached: recomputed board geometry
        # cost ~0.2 ms per _detect_face call at batch rates

    def _scale_for(self, shape, cam_id: int | None = None) -> int:
        if self.detect_scale == "auto":
            # the two-pass scheme trades a little host work for 4-16x fewer
            # DEVICE-UPLOAD bytes — on a host-local (CPU) backend there is
            # no transfer to save and full resolution is accuracy-safest.
            if jax.default_backend() == "cpu":
                return 1
            if shape[-2] < 600:
                return 1
            # Coarse-to-fine pyramid with a per-camera hint: start at half
            # resolution; once a camera's detections are consistently STRONG
            # with large squares (>= _PROMOTE_SQUARE_PX full-res px, i.e.
            # comfortable bit-cell size at quarter res), later stacks start
            # at QUARTER resolution. The quality-gated full-res retry
            # escalates any frame that comes back weak, and a high retry
            # rate demotes the hint back to 2 — so the fast path can never
            # cost accuracy, only (rarely) an extra coarse pass.
            if cam_id is not None and self._scale_hint.get(cam_id) == 4:
                return 4
            return 2
        return int(self.detect_scale)

    @property
    def name(self) -> str:
        return "CHARUCO"

    @property
    def pixel_format(self) -> PixelFormat:
        return PixelFormat.GRAY

    # ---- board geometry -----------------------------------------------------
    def _compute_marker_board_corners(self) -> dict[int, np.ndarray]:
        """marker_id -> (4, 2) board-frame corner coords [TL, TR, BR, BL]
        (y down, matching the rendered board and image coords)."""
        s = self.charuco.square_size_m
        a = self.charuco.aruco_scale * s
        m = (s - a) / 2
        out = {}
        for mid, (c, r) in enumerate(self.charuco.marker_square_positions()):
            x0, y0 = c * s + m, r * s + m
            out[mid] = np.array([[x0, y0], [x0 + a, y0], [x0 + a, y0 + a], [x0, y0 + a]])
        return out

    def _board_inner_corners_2d(self) -> np.ndarray:
        if self._inner_corners_2d is None:
            self._inner_corners_2d = self.charuco.chessboard_corners()[:, :2]
        return self._inner_corners_2d

    # ---- detection ----------------------------------------------------------
    def _run_stack(self, stack: np.ndarray):
        """Run the fused device program on a (B, H, W) stack; returns
        (per-frame MarkerDetections, per-frame X-corner candidate arrays).

        The stack is dispatched in fixed-size chunks with every upload and
        program enqueued BEFORE the first fetch: the (async) host->device
        transfer of chunk k+1 then overlaps the compute of chunk k, which
        matters wherever the h2d link is the bottleneck (the dev tunnel
        moves 42 MB/s; even PCIe hosts gain the overlap). Fixed chunking
        also bounds the compiled shapes to (1, H, W) and (CHUNK, H, W)
        per resolution instead of one program per caller batch size."""
        dets_all: list = [None] * stack.shape[0]
        cand_all: list = [None] * stack.shape[0]
        for s, e, dets_list, cand_list in self._run_stack_chunks(stack):
            dets_all[s:e] = dets_list
            cand_all[s:e] = cand_list
        return dets_all, cand_all

    def _run_stack_chunks(self, stack: np.ndarray, scale: int | None = None):
        """Chunked generator form of _run_stack: ALL chunk uploads and
        programs are enqueued up front, then each chunk's packed result is
        fetched and unpacked as the consumer asks for it — the caller's
        host-side assembly of chunk k thereby overlaps the link transfer +
        compute of chunks k+1..., which matters wherever the h2d link is
        the bottleneck. Yields (start, end, dets_list, cand_list)."""
        d = get_dictionary(self.charuco.dictionary)
        B = stack.shape[0]
        if B == 0:
            return
        if scale is None:
            scale = self._scale_for(stack.shape)
        # min_area is a POOLED-cell-area threshold; at 1/s resolution the
        # same physical marker covers 1/s^2 the pixels
        min_area = max(49 // (scale * scale), 3)
        # chunking exists to overlap the h2d transfer with compute; at the
        # coarse scales a frame is 4-16x fewer bytes and each extra dispatch
        # costs ~13 ms of enqueue latency through a remote link, so coarse
        # passes use double-size chunks
        chunk = 1 if B == 1 else (_RUN_CHUNK if scale == 1 else 2 * _RUN_CHUNK)
        use_pallas = jax.default_backend() == "tpu"
        if self.upload_bits == "auto":
            pack4 = scale >= 2 and jax.default_backend() != "cpu"
        else:
            pack4 = int(self.upload_bits) == 4
        pack4 = pack4 and stack.dtype == np.uint8 and stack.shape[2] % (2 * scale) == 0
        outs = []
        for i in range(0, B, chunk):
            # per-chunk downsample: chunk k's host prep overlaps the link
            # transfer of chunks < k (the whole-stack form serialized ~16 ms
            # of numpy before the first byte moved)
            piece = stack[i : i + chunk]
            if scale > 1 and pack4:
                piece = _downsample_pack4(piece, scale)
            elif scale > 1:
                piece = _downsample(piece, scale)
            elif pack4:
                piece = _pack4(piece)
            if scale > 1:
                # the patch pyramid needs dims divisible by 8 and the Pallas
                # corner-response kernel slices full-lane (128-wide) slabs;
                # replicate-pad (edge values add no gradients for the
                # threshold to bite on). Packed widths count 2 px per byte.
                wq = (128 if use_pallas else 16) // (2 if pack4 else 1)
                ph = (-piece.shape[1]) % 16
                pw = (-piece.shape[2]) % wq
                if ph or pw:
                    piece = np.pad(piece, ((0, 0), (0, ph), (0, pw)), mode="edge")
            if piece.shape[0] < chunk:
                piece = np.concatenate(
                    [piece, np.broadcast_to(piece[-1:], (chunk - piece.shape[0], *piece.shape[1:]))]
                )
            outs.append(
                _charuco_device_program(
                    jnp.asarray(np.ascontiguousarray(piece)),
                    d.marker_size, 64, 96, min_area, 4, X_CORNER_KMAX, use_pallas, pack4,
                )
            )
        # Fetch strategy: each d2h fetch through a remote link is
        # latency-dominated (~27 ms flat for the ~15 KB/frame packed
        # buffer). Up to 3 chunks, one on-device concat + ONE fetch beats
        # per-chunk round trips outright; for longer streams, a 2-thread
        # pool overlaps fetch k+1's wait with fetch k's (and with the
        # still-streaming uploads of later chunks) while keeping per-chunk
        # results flowing to the consumer.
        from concurrent.futures import ThreadPoolExecutor

        n_chunks = len(outs)
        pool = fetched = None
        if n_chunks == 1:
            fetched = [np.asarray(outs[0])]
        elif n_chunks <= 3:
            cat = np.asarray(_concat_chunks(tuple(outs)))
            fetched = [cat[k * chunk : (k + 1) * chunk] for k in range(n_chunks)]
        else:
            pool = ThreadPoolExecutor(max_workers=2)
            futs = [pool.submit(np.asarray, o) for o in outs]
        try:
            for ci_ in range(n_chunks):
                s = ci_ * chunk
                e = min(s + chunk, B)
                packed = (fetched[ci_] if pool is None else futs[ci_].result())[: e - s]
                quads, cells, valid, xy, xvalid = _unpack_device_program(
                    packed, d.marker_size, 64, X_CORNER_KMAX
                )
                if scale > 1:
                    # 1/s-res pixel centers sit at full-res coords s*x +
                    # (s-1)/2. Candidates stay COARSE-ACCURATE here (~s/2
                    # px): the board assembly's homography/snap gates
                    # tolerate that, and only the few dozen WINNING corners
                    # per frame get the full-res host polish afterwards
                    # (_refine_hits) — refining all K_max candidates cost
                    # seconds of numpy per stack.
                    quads = quads * float(scale) + (scale - 1) / 2.0
                    xy = xy * float(scale) + (scale - 1) / 2.0
                dets_list = assemble_marker_detections(quads, cells, valid, d)
                cand_list = [xy[b][xvalid[b]] for b in range(e - s)]
                yield s, e, dets_list, cand_list
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    @staticmethod
    def _refine_hits(stack: np.ndarray, hits: list, scale: int = 2) -> None:
        """Full-res host polish of the winning corners of one coarse-scale
        pass. hits: list of [frame_idx_in_stack, kps, img_xy, ...] entries;
        img_xy is replaced in place with the refined positions
        (detect/corners.py::refine_corners_subpix_host). The integer
        re-seed search radius grows with the coarse scale: a 1/s-res
        candidate lands within ~s/2 px + subpix error of the true corner."""
        from caliscope_tpu.detect.corners import refine_corners_subpix_host

        if not hits:
            return
        all_xy = np.concatenate([h[2] for h in hits])
        fids = np.concatenate([np.full(len(h[2]), h[0], np.int64) for h in hits])
        refined = refine_corners_subpix_host(
            np.asarray(stack), all_xy, fids, relocalize=True, relocal_range=max(3, scale + 1)
        )
        o = 0
        for h in hits:
            n = len(h[2])
            h[2] = refined[o : o + n]
            o += n

    def _detect_face(self, gray: np.ndarray, dets=None, cand=None):
        """Detect on one orientation. Returns (keypoint_ids, img_xy) or None.

        dets/cand: optionally precomputed device outputs (marker detections
        and X-corner candidates) — the batched path runs the two device
        programs once over a whole frame stack and assembles per frame here.
        """
        if dets is None:
            dets = detect_markers(gray[None], self.charuco.dictionary)[0]
        if len(dets) < MIN_MARKERS_FOR_BOARD:
            return None
        src, dst = [], []
        for mid, corners in zip(dets.ids, dets.corners):
            board = self._marker_board_corners.get(int(mid))
            if board is None:
                continue
            src.append(board)
            dst.append(corners)
        if not src:
            return None
        marker_px = np.median([np.linalg.norm(c[0] - c[1]) for c in dets.corners])
        gate = max(3.0, 0.08 * marker_px)

        # Marker-consensus homography: the scene may contain standalone
        # markers that share ids with board markers (or mirror-aliased
        # decodes); greedily trim markers inconsistent with the board plane
        # until the survivors agree on ONE homography.
        src_m = list(src)
        dst_m = list(dst)
        H = None
        while src_m:
            s = np.concatenate(src_m)
            t = np.concatenate(dst_m)
            H = _fit_homography(s, t)
            if H is None:
                return None
            ones = np.ones((len(s), 1))
            reproj = (H @ np.hstack([s, ones]).T).T
            reproj = reproj[:, :2] / reproj[:, 2:3]
            per_marker = np.linalg.norm(reproj - t, axis=1).reshape(-1, 4).mean(axis=1)
            worst = int(np.argmax(per_marker))
            if per_marker[worst] <= gate:
                break
            if len(src_m) == 1:
                return None  # nothing consistent remains
            src_m.pop(worst)
            dst_m.pop(worst)
        src = np.concatenate(src_m)
        dst = np.concatenate(dst_m)
        if H is None:
            return None

        # Orientation gate: a physical front-face view preserves the board's
        # winding; a mirror-aliased decode (a mirror-symmetric marker read
        # with flipped corner winding) yields an orientation-REVERSING
        # homography. det of the projective Jacobian at the board center:
        cx, cy = self._board_inner_corners_2d().mean(axis=0)
        h = H
        w_c = h[2, 0] * cx + h[2, 1] * cy + h[2, 2]
        J = np.array(
            [
                [h[0, 0] * w_c - (h[0, 0] * cx + h[0, 1] * cy + h[0, 2]) * h[2, 0],
                 h[0, 1] * w_c - (h[0, 0] * cx + h[0, 1] * cy + h[0, 2]) * h[2, 1]],
                [h[1, 0] * w_c - (h[1, 0] * cx + h[1, 1] * cy + h[1, 2]) * h[2, 0],
                 h[1, 1] * w_c - (h[1, 0] * cx + h[1, 1] * cy + h[1, 2]) * h[2, 1]],
            ]
        )
        if np.linalg.det(J) < 0:
            return None

        inner = self._board_inner_corners_2d()

        if cand is None:
            # detected X-corners (device program)
            xy, _score, valid = detect_x_corners_device(gray[None].astype(np.float32), k_max=X_CORNER_KMAX)
            cand = np.asarray(xy)[0][np.asarray(valid)[0]]
        if len(cand) == 0:
            return None

        def project(Hm):
            ones = np.ones((len(inner), 1))
            p = (Hm @ np.hstack([inner, ones]).T).T
            return p[:, :2] / p[:, 2:3]

        def local_radii(expected):
            """Per-corner snap radius from the LOCAL projected grid spacing.

            Under strong perspective the square size varies across the board;
            a single global radius over-reaches at the compressed end and
            snaps corners to the wrong grid neighbor (an off-by-one that
            corner geometry alone cannot detect)."""
            cols = self.charuco.inner_columns
            n = len(expected)
            grid = expected.reshape(-1, cols, 2)
            spacing = np.full((grid.shape[0], cols), np.inf)
            if cols > 1:
                dh = np.linalg.norm(grid[:, 1:] - grid[:, :-1], axis=2)
                spacing[:, 1:] = np.minimum(spacing[:, 1:], dh)
                spacing[:, :-1] = np.minimum(spacing[:, :-1], dh)
            if grid.shape[0] > 1:
                dv = np.linalg.norm(grid[1:] - grid[:-1], axis=2)
                spacing[1:] = np.minimum(spacing[1:], dv)
                spacing[:-1] = np.minimum(spacing[:-1], dv)
            return self.snap_radius_frac * spacing.reshape(n)

        def snap(expected, radii):
            d2 = np.sum((expected[:, None, :] - cand[None, :, :]) ** 2, axis=2)
            nearest = np.argmin(d2, axis=1)
            dist = np.sqrt(d2[np.arange(len(expected)), nearest])
            keep = dist < radii
            chosen: dict[int, int] = {}
            for k in np.where(keep)[0]:
                c = int(nearest[k])
                if c not in chosen or dist[k] < dist[chosen[c]]:
                    chosen[c] = k
            kps = sorted(chosen.values())
            return np.asarray(kps, np.int64), nearest

        # Iterative homography refinement: the marker-seeded H extrapolates
        # poorly to the board's far end; each round folds the confidently
        # snapped corners back into the fit and re-projects.
        kps = np.zeros(0, np.int64)
        nearest = None
        prev_key = None
        for _ in range(3):
            expected = project(H)
            radii = local_radii(expected)
            kps, nearest = snap(expected, radii)
            if len(kps) < 4:
                break
            # converged: the snap set (corner -> candidate pairing) is what
            # the refit consumes; an unchanged set reproduces the same H
            key = (kps.tobytes(), nearest[kps].tobytes())
            if key == prev_key:
                break
            prev_key = key
            H2 = _fit_homography(
                np.concatenate([src, inner[kps]]),
                np.concatenate([dst, cand[nearest[kps]]]),
            )
            if H2 is None:
                break
            H = H2
        if len(kps) == 0:
            return None
        # final consistency gates: snapped corners AND the absolute marker
        # anchors must both agree with the refined H (a wrongly-anchored fit
        # can lock onto the corner grid while drifting off the markers)
        mproj = (H @ np.hstack([src, np.ones((len(src), 1))]).T).T
        mresid = np.linalg.norm(mproj[:, :2] / mproj[:, 2:3] - dst, axis=1)
        if np.median(mresid) > max(3.0, 0.08 * marker_px):
            return None
        expected = project(H)
        radii = local_radii(expected)
        resid = np.linalg.norm(expected[kps] - cand[nearest[kps]], axis=1)
        ok = resid < np.minimum(radii[kps], 0.25 * radii[kps] / self.snap_radius_frac)
        kps = kps[ok]
        kps = self._collinearity_gate(kps, cand, nearest)
        # a single anchoring marker fits any 4-point homography exactly, so
        # demand corroborating chessboard corners around it (a lone wall
        # marker that aliases a board id finds none)
        min_corners = 4 if len(src_m) == 1 else 1
        if len(kps) < min_corners:
            return None
        return kps, cand[nearest[kps]], len(src_m)

    def _collinearity_gate(self, kps: np.ndarray, cand: np.ndarray, nearest: np.ndarray) -> np.ndarray:
        """Drop snapped corners that break grid-line collinearity.

        A homography maps board grid lines to image LINES exactly, so a
        corner's distance to the line through its two opposite snapped
        neighbors is insensitive to perspective (unlike the H-residual gate,
        whose radius scales with square size and admits multi-pixel snaps
        onto spurious X-responses). Residual curvature is only lens
        distortion over a two-square chord (sub-pixel for real lenses).
        Iteratively removes the worst offender so one bad corner cannot
        condemn its good neighbors.
        """
        cols = self.charuco.inner_columns
        gate = 2.0  # px

        def line_dist(p, a, b):
            d = b - a
            n = np.linalg.norm(d)
            if n < 1e-9:
                return np.inf
            return abs(d[0] * (p[1] - a[1]) - d[1] * (p[0] - a[0])) / n

        kset = {int(k): cand[nearest[int(k)]] for k in kps}
        while len(kset) >= 3:
            worst_k, worst_dev = -1, gate
            for k, p in kset.items():
                c, r = k % cols, k // cols
                devs = []
                if 0 < c and c < cols - 1 and k - 1 in kset and k + 1 in kset:
                    devs.append(line_dist(p, kset[k - 1], kset[k + 1]))
                if k - cols in kset and k + cols in kset:
                    devs.append(line_dist(p, kset[k - cols], kset[k + cols]))
                if devs and min(devs) > worst_dev:
                    worst_k, worst_dev = k, min(devs)
            if worst_k < 0:
                break
            del kset[worst_k]
        return np.asarray(sorted(kset), np.int64)

    def _detect(self, frame: np.ndarray, cam_id: int = 0, rotation_count: int = 0) -> PointPacket:
        gray = frame if frame.ndim == 2 else frame.mean(axis=2)
        if self.charuco.inverted:
            gray = 255 - gray if gray.dtype == np.uint8 else 255.0 - gray.astype(np.float32)
        # Always try both orientations (reference charuco_tracker.py:56-69):
        # even a flat board is legitimately seen mirrored from behind
        # (translucent paper / print-through), and skipping the flip leaves
        # only the aliased unflipped attempt to win with wrong identities.
        orders = [False, True] if not self._mirror_hint.get(cam_id, False) else [True, False]

        # A mirrored board can alias to valid front-face ids (some dictionary
        # patterns are mirror-symmetric, undetectable at single-marker level),
        # so face selection scores by (surviving consensus markers, corners):
        # the true face keeps its whole marker set, the aliased one keeps 1-2.
        best = None  # (score, mirrored, kps, img_xy)

        def passes(best, scale):
            for mirrored in orders:
                g = np.ascontiguousarray(gray[:, ::-1] if mirrored else gray)
                dets_all, cand_all = [None], [None]
                for s, e, dl, cl in self._run_stack_chunks(g[None], scale):
                    dets_all[s:e] = dl
                    cand_all[s:e] = cl
                result = self._detect_face(g, dets=dets_all[0], cand=cand_all[0])
                if result is None:
                    continue
                kps, img_xy, n_markers = result
                if scale > 1:
                    hit = [0, kps, img_xy]
                    self._refine_hits(g[None], [hit], scale)
                    img_xy = hit[2]
                score = (n_markers, len(kps))
                if best is None or score > best[0]:
                    best = (score, mirrored, kps, img_xy)
                if self._is_strong(score):
                    break
            return best

        scale = self._scale_for(gray.shape, cam_id)
        best = passes(best, scale)
        if scale > 1 and (best is None or not self._is_strong(best[0])):
            # quality-gated full-res retry — see get_points_batch
            best = passes(best, 1)

        if best is None:
            return PointPacket.empty()
        self._mirror_hint[cam_id] = best[1]
        return self._packet_from(best, gray.shape[1])

    def _packet_from(self, best, width: int) -> PointPacket:
        """Finalize a winning face into a PointPacket (un-mirror x, split
        two-sided identity)."""
        _score, mirrored, kps, img_xy = best
        if mirrored:
            img_xy = img_xy.copy()
            img_xy[:, 0] = width - 1 - img_xy[:, 0]
        # Identity split only for a board with real substrate thickness: the
        # back face is object 1 with the SAME keypoint ids at z=+thickness.
        # At zero thickness a mirrored view IS the front face seen from
        # behind, so both share identity and BA fuses them into the same
        # world points (reference charuco_tracker.py:72-85).
        is_back = mirrored and self.charuco.thickness_m > 0
        object_id = 1 if is_back else 0
        obj_loc = self.charuco.object_corners(object_id)[kps]
        return PointPacket(
            object_id=np.full(len(kps), object_id),
            keypoint_id=kps,
            img_loc=img_xy,
            obj_loc=obj_loc,
        )

    def _is_strong(self, score) -> bool:
        """Strong acceptance: enough markers AND most corners recovered —
        the same criterion that skips the mirror retry."""
        n_markers, n_kps = score
        return n_markers >= 3 and n_kps >= 0.6 * self.charuco.n_corners

    def _orientation_passes(self, grays: np.ndarray, frame_ids: list, best: dict, orders, scale: int) -> None:
        """Run the two-orientation detection over grays[frame_ids] at the
        given device-pipeline scale, merging (score, mirrored, kps, img_xy)
        results into `best` keyed by frame id."""
        pending = list(frame_ids)
        for mirrored in orders:
            if not pending:
                break
            if not mirrored and len(pending) == grays.shape[0]:
                stack = grays  # full unmirrored pass: no 10+ MB copy
            else:
                stack = grays[pending]
                if mirrored:
                    stack = stack[:, :, ::-1]
                # no shape padding needed here: _run_stack dispatches in
                # fixed chunks, so a variable-length pending set reuses the
                # same compiled programs
                stack = np.ascontiguousarray(stack)
            still = []
            # chunk-by-chunk, with the generator's blocking fetches on a
            # background thread: assembly + refinement of chunk k overlap
            # the link transfer and device compute of later chunks
            for s, e, dets_list, cand_list in _prefetched(self._run_stack_chunks(stack, scale)):
                hits = []  # [j, kps, img_xy, b, n_markers] for this chunk
                for j in range(s, e):
                    b = pending[j]
                    result = self._detect_face(stack[j], dets=dets_list[j - s], cand=cand_list[j - s])
                    accepted = False
                    if result is not None:
                        kps, img_xy, n_markers = result
                        hits.append([j, kps, img_xy, b, n_markers])
                        accepted = self._is_strong((n_markers, len(kps)))
                    if not accepted:
                        still.append(b)
                if scale > 1:
                    self._refine_hits(stack, hits, scale)
                for j, kps, img_xy, b, n_markers in hits:
                    score = (n_markers, len(kps))
                    if b not in best or score > best[b][0]:
                        best[b] = (score, mirrored, kps, img_xy)
            pending = still

    def get_points_batch(self, frames: np.ndarray, cam_id: int = 0, rotation_count: int = 0) -> list[PointPacket]:
        """Device-batched detection over a (B, H, W[, 3]) frame stack.

        The two device programs (marker pipeline, X-corner pipeline) each run
        ONCE over the whole stack — on a TPU this is where the throughput is;
        per-frame dispatch would pay the device round trip B times. Host-side
        assembly (homography consensus, corner snap, gates) runs per frame on
        the precomputed outputs. Frames that fail the first orientation are
        retried as a second, smaller stack in the flipped orientation, and
        the better-scoring face wins — same semantics as get_points.
        """
        frames = np.asarray(frames)
        if frames.ndim == 4:
            frames = frames.mean(axis=3)
        # Inversion is the only host-side intensity op; it is EXACT in uint8
        # (255 - v), so the stack keeps its source dtype — uint8 frames stay
        # uint8 (quarter the upload bytes of float32, and eligible for the
        # 4-bit packed upload); the device program casts on chip.
        if self.charuco.inverted:
            grays = 255 - frames if frames.dtype == np.uint8 else 255.0 - frames.astype(np.float32)
        else:
            grays = frames
        B = grays.shape[0]
        orders = [False, True] if not self._mirror_hint.get(cam_id, False) else [True, False]
        best: dict[int, tuple] = {}
        scale = self._scale_for(grays.shape, cam_id)
        self._orientation_passes(grays, list(range(B)), best, orders, scale)
        n_weak = 0
        if scale > 1:
            # Quality-gated full-res retry: a WEAK coarse-scale result (few
            # markers / few corners) on a hard view can pass the geometric
            # gates with misidentified corners — observed on real oblique
            # footage. Strong detections keep the cheap path; weak or
            # missing ones re-run at full resolution and the better score
            # wins.
            weak = [b for b in range(B) if b not in best or not self._is_strong(best[b][0])]
            n_weak = len(weak)
            if weak:
                self._orientation_passes(grays, weak, best, orders, 1)
        packets = []
        for b in range(B):
            if b in best:
                packets.append(self._packet_from(best[b], grays.shape[2]))
            else:
                packets.append(PointPacket.empty())
        if best:
            n_mirrored = sum(1 for v in best.values() if v[1])
            self._mirror_hint[cam_id] = n_mirrored * 2 > len(best)
        self._update_scale_hint(cam_id, scale, B, n_weak, best)
        return packets

    _PROMOTE_SQUARE_PX = 64  # full-res px per square: quarter-res bit cells stay >= ~3 px

    def _update_scale_hint(self, cam_id: int, scale: int, B: int, n_weak: int, best: dict) -> None:
        """Adapt the per-camera coarse-to-fine starting scale from the batch
        that just finished. Promote 2 -> 4 when nearly every frame was
        STRONG at the current scale and the detected squares are large
        enough that quarter-res bit cells stay comfortably sampled; demote
        4 -> 2 when the full-res retry rate says the coarse pass is wasting
        work. Only consulted in detect_scale="auto" on accelerator
        backends (_scale_for)."""
        if self.detect_scale != "auto" or scale == 1 or B == 0:
            return
        if n_weak * 4 > B:  # > 25% needed the full-res retry
            if scale == 4:
                self._scale_hint[cam_id] = 2
            return
        if scale == 2 and n_weak == 0 and len(best) == B:
            sq = [self._median_square_px(v[3]) for v in best.values()]
            sq = [q for q in sq if q is not None]
            if len(sq) == B and min(sq) >= self._PROMOTE_SQUARE_PX:
                self._scale_hint[cam_id] = 4

    @staticmethod
    def _median_square_px(img_xy: np.ndarray) -> float | None:
        """Median nearest-neighbor distance of detected corners — adjacent
        chessboard corners are one square apart, so this estimates the
        square size in full-res pixels."""
        n = len(img_xy)
        if n < 4:
            return None
        d2 = np.sum((img_xy[:, None, :] - img_xy[None, :, :]) ** 2, axis=-1)
        np.fill_diagonal(d2, np.inf)
        return float(np.median(np.sqrt(d2.min(axis=1))))

    # ---- metadata -----------------------------------------------------------
    def get_point_name(self, keypoint_id: int) -> str:
        return f"corner_{int(keypoint_id)}"

    def get_connected_points(self) -> set[tuple[int, int]]:
        return set(self.charuco.connectivity())
