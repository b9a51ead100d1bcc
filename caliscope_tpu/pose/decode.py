"""Pose-model output decoding as batched JAX kernels.

Parity: reference src/caliscope/trackers/model_decode.py (decode_simcc:13,
decode_heatmap:69). TPU-first differences: fully batched over (B, K, ...)
with no per-keypoint Python loops, and both decoders add windowed soft-argmax
subpixel refinement around the hard peak (the reference refines heatmaps only,
via a Taylor step; SimCC gets the same treatment here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _soft_refine_1d(vec, idx, radius: int = 2):
    """Soft-argmax offset within +/-radius of the hard peak. vec (..., N)."""
    n = vec.shape[-1]
    offs = jnp.arange(-radius, radius + 1)
    pos = idx[..., None] + offs
    valid = (pos >= 0) & (pos < n)
    vals = jnp.take_along_axis(vec, jnp.clip(pos, 0, n - 1), axis=-1)
    vals = jnp.where(valid, vals, -jnp.inf)
    w = jax.nn.softmax(vals, axis=-1)
    return jnp.sum(w * offs, axis=-1)


def decode_simcc(simcc_x, simcc_y, simcc_split_ratio: float = 2.0, refine: bool = True):
    """SimCC vectors -> (keypoints (B, K, 2), confidence (B, K)).

    simcc_x: (B, K, Wx); simcc_y: (B, K, Hy). Coordinates are in model input
    space (divided by the split ratio); confidence = clip(min(px, py), 0, 1).
    """
    simcc_x = jnp.asarray(simcc_x)
    simcc_y = jnp.asarray(simcc_y)
    xi = jnp.argmax(simcc_x, axis=-1)
    yi = jnp.argmax(simcc_y, axis=-1)
    xc = jnp.max(simcc_x, axis=-1)
    yc = jnp.max(simcc_y, axis=-1)
    x = xi.astype(jnp.float32)
    y = yi.astype(jnp.float32)
    if refine:
        x = x + _soft_refine_1d(simcc_x, xi)
        y = y + _soft_refine_1d(simcc_y, yi)
    kps = jnp.stack([x, y], axis=-1) / simcc_split_ratio
    conf = jnp.clip(jnp.minimum(xc, yc), 0.0, 1.0)
    return kps, conf


def decode_heatmap(heatmaps, refine: bool = True):
    """Heatmaps (B, K, H, W) -> (keypoints (B, K, 2), confidence (B, K)).

    Hard argmax + quadratic Taylor subpixel step (clamped to +/-0.5), matching
    the reference's refinement but vectorized over batch and keypoints.
    """
    hm = jnp.asarray(heatmaps)
    B, K, H, W = hm.shape
    flat = hm.reshape(B, K, -1)
    idx = jnp.argmax(flat, axis=-1)
    conf = jnp.max(flat, axis=-1)
    y = (idx // W).astype(jnp.int32)
    x = (idx % W).astype(jnp.int32)

    if refine:
        def grad2(h, xx, yy):
            x0 = jnp.clip(xx, 1, W - 2)
            y0 = jnp.clip(yy, 1, H - 2)
            dx = 0.5 * (h[y0, x0 + 1] - h[y0, x0 - 1])
            dy = 0.5 * (h[y0 + 1, x0] - h[y0 - 1, x0])
            dxx = h[y0, x0 + 1] - 2 * h[y0, x0] + h[y0, x0 - 1]
            dyy = h[y0 + 1, x0] - 2 * h[y0, x0] + h[y0 - 1, x0]
            ox = jnp.where(jnp.abs(dxx) > 1e-9, -dx / dxx, 0.0)
            oy = jnp.where(jnp.abs(dyy) > 1e-9, -dy / dyy, 0.0)
            interior = (xx > 0) & (xx < W - 1) & (yy > 0) & (yy < H - 1)
            ox = jnp.where(interior, jnp.clip(ox, -0.5, 0.5), 0.0)
            oy = jnp.where(interior, jnp.clip(oy, -0.5, 0.5), 0.0)
            return ox, oy

        ox, oy = jax.vmap(jax.vmap(grad2))(hm, x, y)
    else:
        ox = oy = jnp.zeros_like(conf)
    kps = jnp.stack([x.astype(jnp.float32) + ox, y.astype(jnp.float32) + oy], axis=-1)
    return kps, jnp.clip(conf, 0.0, 1.0)
