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
