"""Chessboard X-corner detection: ring response, NMS, subpixel refinement.

The TPU-native replacement for cv2.findChessboardCorners + cv2.cornerSubPix
(reference trackers/chessboard_tracker.py:91, charuco_tracker.py:93-121).

- chess_corner_response: a ChESS-style ring detector (Bennett & Lasenby) —
  around an X-corner, intensity on a sampling ring alternates with period pi,
  so diametrically opposite samples agree while quarter-turn samples differ.
  Pure gather/elementwise work, batched over a frame stack.
- nms_corners: max-pool non-maximum suppression + top-K extraction (static K).
- refine_corners_subpix: the cornerSubPix saddle condition — every image
  gradient in a window is orthogonal to the offset from the true corner:
  solve sum(w * grad gradT)(c - p) = 0, iterated with bilinear resampling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np



def _ring_offsets(radius: float, n: int = 16) -> np.ndarray:
    ang = 2 * np.pi * np.arange(n) / n
    return np.stack([radius * np.cos(ang), radius * np.sin(ang)], axis=1)


def chess_corner_response(images, radius: float = 4.0):
    """(B, H, W) float -> (B, H, W) X-corner response (>= 0, higher = cornerier)."""
    B, H, W = images.shape
    offs = _ring_offsets(radius)
    n = len(offs)
    imgs = images.astype(jnp.float32)

    # gather ring samples by shifting whole images (pad + slice; offsets are
    # fractional -> bilinear blend of 4 integer shifts)
    def shifted(img, dx, dy):
        # integer + fractional decomposition
        ix, iy = int(np.floor(dx)), int(np.floor(dy))
        fx, fy = dx - ix, dy - iy
        pad = int(np.ceil(radius)) + 1

        p = jnp.pad(img, ((pad, pad), (pad, pad)), mode="edge")

        def sl(ddx, ddy):
            return jax.lax.dynamic_slice(p, (pad + iy + ddy, pad + ix + ddx), (H, W))

        return (
            (1 - fy) * ((1 - fx) * sl(0, 0) + fx * sl(1, 0))
            + fy * ((1 - fx) * sl(0, 1) + fx * sl(1, 1))
        )

    def per_frame(img):
        rs = jnp.stack([shifted(img, float(o[0]), float(o[1])) for o in offs])  # (n, H, W)
        # sum response: agreement across the diameter
        sr = sum(jnp.abs(rs[i] - rs[(i + n // 2) % n]) for i in range(n // 2))
        # diff response: disagreement at quarter turn
        dr = sum(jnp.abs(rs[i] - rs[(i + n // 4) % n]) for i in range(n // 2))
        # local mean term suppresses edges/lines
        mean_ring = jnp.mean(rs, axis=0)
        mr = jnp.abs(mean_ring - img) * (n // 2) * 0.5
        return jnp.maximum(dr - sr - mr, 0.0)

    return jax.vmap(per_frame)(imgs)


def nms_corners(response, k_max: int, rel_threshold: float = 0.2, window: int = 5, border: int = 6):
    """Top-K local maxima per frame. Returns (xy (B, K, 2) float, score (B, K),
    valid (B, K)).

    TPU note: the exact top_k over the ~1M-pixel suppressed map was the
    NMS stage's dominant cost (~11 ms/16-frame stack); lax.approx_max_k
    (the TPU-native binned max reduction — deterministic, not sampled)
    runs in well under 1 ms on the sparse suppressed map. A true corner is
    lost only when two top-K peaks collide in one reduction bin; at
    recall_target=0.999 the bench frames lose ZERO corners vs exact top_k
    (the tpu-marked test in tests/test_pallas_kernels.py pins the full
    set equality; at 0.99 one rank-161 noise peak of ~900 was dropped).
    Other platforms keep exact top_k (approx_max_k is TPU-specific)."""
    B, H, W = response.shape
    r = window // 2
    pooled = jax.lax.reduce_window(
        response, -jnp.inf, jax.lax.max, (1, window, window), (1, 1, 1), "SAME"
    )
    is_peak = (response >= pooled) & (response > 0)
    # suppress image border peaks
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    score = jnp.where(is_peak & inb, response, 0.0)
    flat = score.reshape(B, -1)
    if jax.default_backend() == "tpu":
        top, idx = jax.lax.approx_max_k(flat, k_max, recall_target=0.999)
    else:
        top, idx = jax.lax.top_k(flat, k_max)
    thr = rel_threshold * jnp.max(top, axis=1, keepdims=True)
    valid = top > jnp.maximum(thr, 1e-6)
    xy = jnp.stack([(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)], axis=-1)
    return xy, top, valid


@partial(jax.jit, static_argnames=("win", "iters"))
def refine_corners_subpix(images, xy, win: int = 5, iters: int = 4):
    """cornerSubPix-equivalent saddle refinement.

    images: (B, H, W); xy: (B, K, 2) integer-ish seeds. Returns (B, K, 2)
    subpixel corners. Gaussian-weighted window, gradients resampled
    bilinearly around the moving estimate each iteration.

    TPU design note: sampling the moving window straight from the frame is
    a random-access gather over a 1 MB+ table per tap — measured 15 ms/frame
    at 720p/K=256. Instead each corner reads ONE small contiguous window
    around its seed, computes gradients locally, and iterates entirely
    inside that window; the estimate can move at most iters * 1.5 px (the
    clipped step), so the window covers every reachable sample position.
    On TPU the window gather itself is a hand-written pipelined-DMA Pallas
    kernel (extract_corner_windows_pallas, 2.2 ms/stack vs 8 ms for XLA's
    serialized per-corner dynamic_slices); other backends keep the
    dynamic_slice vmap. Both paths read identical windows.
    """
    B, H, W = images.shape
    imgs = images.astype(jnp.float32)
    # reach = window half-width + max total drift + bilinear support
    reach = win + int(np.ceil(iters * 1.5)) + 2
    WIN = 2 * reach + 2
    pad = reach + 1
    padded = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    Hp, Wp = H + 2 * pad, W + 2 * pad

    # window top-left corners, identical for both gather paths
    xi_all = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32) - WIN // 2 + pad, 0, Wp - WIN)
    yi_all = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32) - WIN // 2 + pad, 0, Hp - WIN)

    sigma2 = 2.0 * (win / 1.5) ** 2
    pxw = (jnp.arange(WIN, dtype=jnp.float32)[None, :] + jnp.zeros((WIN, 1), jnp.float32)).reshape(-1)
    pyw = (jnp.arange(WIN, dtype=jnp.float32)[:, None] + jnp.zeros((1, WIN), jnp.float32)).reshape(-1)

    def one(sub, c0, xi, yi):
        gx = jnp.zeros_like(sub).at[:, 1:-1].set((sub[:, 2:] - sub[:, :-2]) * 0.5)
        gy = jnp.zeros_like(sub).at[1:-1, :].set((sub[2:, :] - sub[:-2, :]) * 0.5)
        off = jnp.stack([xi, yi]).astype(jnp.float32) - pad  # window -> image coords
        # FLAT window pixels for the iteration: a (WIN*WIN,) last axis
        # tiles the vector lanes at ~90% occupancy where (WIN, WIN) 2-D
        # windows sat at ~20% (WIN=28 vs the (8, 128) tile). The stage is
        # DMA-bound on the 4k windowed gathers (~13 ms/stack measured for
        # the slices alone), so this trims the math tail, not the bulk
        gx = gx.reshape(-1)
        gy = gy.reshape(-1)
        gxx = gx * gx
        gxy = gx * gy
        gyy = gy * gy
        bx_w = gxx * pxw + gxy * pyw
        by_w = gxy * pxw + gyy * pyw

        def body(_, c):
            # saddle condition over FIXED window pixels with a gaussian
            # recentered on the moving estimate: no resampling, no gathers
            dx = pxw - c[0]
            dy = pyw - c[1]
            w = jnp.exp(-(dx * dx + dy * dy) / sigma2)
            w = w * (jnp.abs(dx) <= win + 0.5) * (jnp.abs(dy) <= win + 0.5)
            a = jnp.sum(w * gxx)
            b = jnp.sum(w * gxy)
            cc = jnp.sum(w * gyy)
            bx = jnp.sum(w * bx_w)
            by = jnp.sum(w * by_w)
            det = a * cc - b * b
            safe = jnp.abs(det) > 1e-9
            inv_det = 1.0 / jnp.where(safe, det, 1.0)
            nx = (cc * bx - b * by) * inv_det
            ny = (a * by - b * bx) * inv_det
            new = jnp.where(safe, jnp.stack([nx, ny]), c).astype(c.dtype)
            # bound the update to the window to avoid divergence on bad seeds
            return c + jnp.clip(new - c, -1.5, 1.5)

        c_local = jax.lax.fori_loop(0, iters, body, c0 - off)
        return c_local + off

    if jax.default_backend() == "tpu":
        # pipelined aligned-slab DMA gather (detect/pallas_kernels.py):
        # the per-corner dynamic_slice path below costs ~8 ms/16-frame
        # stack in serialized small HBM reads; the kernel does 2.2 ms
        from caliscope_tpu.detect.pallas_kernels import extract_corner_windows_pallas

        subs = extract_corner_windows_pallas(padded, yi_all, xi_all, WIN)
    else:
        def slice_frame(img_p, ys, xs):
            return jax.vmap(lambda y, x: jax.lax.dynamic_slice(img_p, (y, x), (WIN, WIN)))(ys, xs)

        subs = jax.vmap(slice_frame)(padded, yi_all, xi_all)

    return jax.vmap(jax.vmap(one))(subs, xy, xi_all, yi_all)


def refine_corners_subpix_host(
    frames: "np.ndarray",
    xy: "np.ndarray",
    frame_ids: "np.ndarray",
    win: int = 5,
    iters: int = 4,
    relocalize: bool = False,
    relocal_range: int = 3,
):
    """Numpy mirror of refine_corners_subpix for HOST-side refinement.

    Used by the two-pass detection scheme (trackers/charuco_tracker.py):
    the device pipeline runs on downscaled frames to cut host->device
    bytes ~4x (the e2e bottleneck through a remote link), and the few
    hundred surviving corner candidates are polished at full resolution
    here — windows sliced from the frames the host already holds, no
    second upload. Same saddle iteration as the device path (fixed window,
    Gaussian recentered on the moving estimate).

    frames: (B, H, W) uint8/float; xy: (V, 2) full-res seeds; frame_ids:
    (V,) frame index per seed. Returns (V, 2) refined corners.
    """
    if len(xy) == 0:
        return xy.astype(np.float64)
    B, H, W = frames.shape
    reach = win + int(np.ceil(iters * 1.5)) + 2
    WIN = 2 * reach + 2
    pad = 0  # windows are clipped INSIDE the frame instead of edge-padding:
    # padding + float-converting the full stack cost ~100 ms per 16-frame
    # 720p batch, dwarfing the per-window math; candidates live >= 6 px from
    # the border (NMS border suppression), so a near-border window merely
    # shifts off-center, which the off-center-seed math handles anyway
    Hp, Wp = H, W
    xi = np.clip(np.round(xy[:, 0]).astype(np.int64) - WIN // 2, 0, Wp - WIN)
    yi = np.clip(np.round(xy[:, 1]).astype(np.int64) - WIN // 2, 0, Hp - WIN)
    ar = np.arange(WIN)
    sub = frames[frame_ids[:, None, None], yi[:, None, None] + ar[None, :, None], xi[:, None, None] + ar[None, None, :]].astype(np.float32)
    if relocalize:
        # Integer re-seed at the strongest full-res X-corner response
        # within +-3 px of the seed (a fast 8-point integer-ring port of
        # chess_corner_response): an approximate seed (e.g. scaled up from
        # a half-res detection, 2-3 px off) can sit in the wrong saddle
        # basin, and the saddle iteration then converges to a competing
        # structure. The search is confined to +-3 px — wider can land on
        # a NEIGHBORING grid corner in small-square footage, an error the
        # downstream gates (already passed) cannot catch.
        V = len(xy)
        rad = 4  # integer ring radius
        hr = int(relocal_range)  # relocal half-range (coarse-scale callers widen it)
        assert 2 * (rad + hr) + 1 <= WIN, "relocal_range exceeds the window reach"
        m = rad + hr  # patch margin around the search grid
        P15 = 2 * m + 1
        h = 2 * hr + 1
        # (V, P15, P15) patch centered on the integer seed, from `sub`
        sy = np.clip(np.round(xy[:, 1]).astype(np.int64) - yi - m, 0, WIN - P15)
        sx = np.clip(np.round(xy[:, 0]).astype(np.int64) - xi - m, 0, WIN - P15)
        ar15 = np.arange(P15)
        patch = sub[np.arange(V)[:, None, None], sy[:, None, None] + ar15[None, :, None], sx[:, None, None] + ar15[None, None, :]]
        offs8 = [(4, 0), (3, 3), (0, 4), (-3, 3), (-4, 0), (-3, -3), (0, -4), (3, -3)]
        rs = [patch[:, rad + oy : rad + oy + h, rad + ox : rad + ox + h] for ox, oy in offs8]
        ctr = patch[:, rad : rad + h, rad : rad + h]
        sr = sum(np.abs(rs[i] - rs[i + 4]) for i in range(4))
        dr = sum(np.abs(rs[i] - rs[(i + 2) % 8]) for i in range(4))
        mr = np.abs(sum(rs) / 8.0 - ctr) * 2.0
        resp = np.maximum(dr - sr - mr, 0.0)  # (V, h, h)
        flat = resp.reshape(V, -1)
        best = np.argmax(flat, axis=1)
        has_peak = flat[np.arange(V), best] > 0
        # patch-grid position -> window coords
        bx = (best % h) + sx + rad
        by = (best // h) + sy + rad
        # re-center each window on the relocated integer seed
        xi = np.where(has_peak, np.clip(xi + bx - WIN // 2, 0, Wp - WIN), xi)
        yi = np.where(has_peak, np.clip(yi + by - WIN // 2, 0, Hp - WIN), yi)
        xy = np.where(
            has_peak[:, None],
            np.stack([xi + WIN // 2 - pad, yi + WIN // 2 - pad], axis=1).astype(np.float64),
            xy,
        )
        sub = frames[frame_ids[:, None, None], yi[:, None, None] + ar[None, :, None], xi[:, None, None] + ar[None, None, :]].astype(np.float32)
    gx = np.zeros_like(sub)
    gy = np.zeros_like(sub)
    gx[:, :, 1:-1] = (sub[:, :, 2:] - sub[:, :, :-2]) * 0.5
    gy[:, 1:-1, :] = (sub[:, 2:, :] - sub[:, :-2, :]) * 0.5
    V = len(xy)
    # Per-window structure tensors, kept (V, WIN, WIN): the Gaussian-x-box
    # weight is SEPARABLE (w = wy(row) * wx(col)), so each weighted sum
    # collapses to two small contractions — stats @ wx then · wy — instead
    # of materializing the (V, WIN^2) weight plane and paying a dense exp
    # per pixel per iteration (~14x fewer exps, measured ~2x on the polish).
    gxx = gx * gx
    gxy = gx * gy
    gyy = gy * gy
    arf = ar.astype(np.float32)
    bx_w = gxx * arf[None, None, :] + gxy * arf[None, :, None]
    by_w = gxy * arf[None, None, :] + gyy * arf[None, :, None]
    stats = np.stack([gxx, gxy, gyy, bx_w, by_w], axis=1)  # (V, 5, WIN, WIN)
    sigma2 = 2.0 * (win / 1.5) ** 2
    # f32 iteration (the f64 default doubled the numpy traffic and exp
    # cost for no accuracy the 1e-2-px-scale saddle can use)
    off = np.stack([xi, yi], axis=1).astype(np.float32) - pad  # window -> image
    c = xy.astype(np.float32) - off  # (V,2) in window coords
    for _ in range(iters):
        dx = arf[None, :] - c[:, 0:1]  # (V, WIN)
        dy = arf[None, :] - c[:, 1:2]
        wx = np.exp(-dx * dx / sigma2) * (np.abs(dx) <= win + 0.5)
        wy = np.exp(-dy * dy / sigma2) * (np.abs(dy) <= win + 0.5)
        # (V, 5, WIN, WIN) @ (V, 1, WIN, 1) -> (V, 5, WIN); then · wy -> (V, 5)
        col = stats @ wx[:, None, :, None]
        a, b, cc, bx, by = np.einsum("vkr,vr->kv", col[..., 0], wy, optimize=True)
        det = a * cc - b * b
        safe = np.abs(det) > 1e-9
        inv_det = 1.0 / np.where(safe, det, 1.0)
        nx = (cc * bx - b * by) * inv_det
        ny = (a * by - b * bx) * inv_det
        new = np.where(safe[:, None], np.stack([nx, ny], axis=1), c)
        c = c + np.clip(new - c, -1.5, 1.5)
    return (c + off).astype(np.float64)


def detect_x_corners_device(images, k_max: int):
    """Full device program: response -> NMS -> subpixel. (B, H, W) uint8 in,
    (xy (B, K, 2), score (B, K), valid (B, K)) out.

    The response stage dispatches to the hand-written Pallas kernel on TPU
    (16x the fused-XLA path on a v5 chip); NMS + saddle refinement are
    XLA-fused either way."""
    use_pallas = jax.default_backend() == "tpu"
    return _detect_x_corners_jit(jnp.asarray(images), k_max, use_pallas)


def xcorner_graph(imgs, k_max: int, use_pallas: bool):
    """Traceable X-corner graph (response -> NMS -> saddle subpixel) for
    composing into fused device programs; imgs must already be float32."""
    if use_pallas:
        from caliscope_tpu.detect.pallas_kernels import chess_corner_response_pallas

        resp = chess_corner_response_pallas(imgs)
    else:
        resp = chess_corner_response(imgs)
    xy, score, valid = nms_corners(resp, k_max)
    xy = refine_corners_subpix(imgs, xy)
    return xy, score, valid


@partial(jax.jit, static_argnames=("k_max", "use_pallas"))
def _detect_x_corners_jit(images, k_max: int, use_pallas: bool):
    return xcorner_graph(images.astype(jnp.float32), k_max, use_pallas)
