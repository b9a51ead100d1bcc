"""ArUco marker detection: the batched device pipeline + host assembly.

Replaces cv2.aruco.ArucoDetector.detectMarkers (reference
trackers/aruco_tracker.py:76). The device program (one jit over a frame
stack) runs threshold -> connected components -> candidate selection ->
patch resampling -> quad fitting -> subpixel edge refinement -> projective
bit sampling; the host then matches bit grids against the dictionary and
canonicalizes corner order. Corner convention matches OpenCV: [TL, TR, BR,
BL] of the canonical (rotation-corrected) marker, pixel coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from caliscope_tpu.detect.dictionaries import ArucoDictionary, get_dictionary, match_bits
from caliscope_tpu.detect.kernels import (
    adaptive_threshold,
    component_candidates_sorted,
    extract_patches,
    integral_image,
    quad_corners_from_mask,
    refine_quad_edges,
    sample_marker_bits,
)
from caliscope_tpu.detect.pallas_ccl import connected_components_dispatch


@dataclass
class MarkerDetections:
    """Per-frame detection results (host side)."""

    ids: np.ndarray  # (M,) marker ids
    corners: np.ndarray  # (M, 4, 2) pixel coords, canonical [TL, TR, BR, BL]
    hamming: np.ndarray  # (M,)

    def __len__(self) -> int:
        return len(self.ids)


def marker_graph(imgs, n_bits: int, k_max: int, patch: int, min_area: int, ccl_iters: int):
    """Traceable marker-candidate graph: (B, H, W) float32 -> candidate quads
    + sampled bit grids. Composable into larger fused programs (the charuco
    tracker runs this and the X-corner graph in ONE dispatch).

    Connectivity runs at FULL resolution — pooling the mask before labeling
    was measured to bridge the 1-px diagonal contacts of chessboard squares
    and swallow the quiet zones of ~24 px markers on real footage. The
    expensive parts are made TPU-cheap elsewhere: labeling runs in a single
    VMEM-resident Pallas kernel on TPU (pallas_ccl.py), per-component
    statistics come from a sort + segmented scans over a pooled grid with no
    scatters (component_candidates_sorted), and patches are contiguous
    dynamic-slice windows from a pyramid (extract_patches)."""
    # multi-scale threshold union: small radius outlines small markers
    # sharply; the large radius keeps the interiors of big blobs foreground
    # (the reference's detector sweeps adaptive-threshold window sizes too)
    integral = integral_image(imgs)
    binary = adaptive_threshold(imgs, radius=10, c=7.0, integral=integral) | adaptive_threshold(
        imgs, radius=26, c=7.0, integral=integral
    )
    labels = connected_components_dispatch(binary, n_iters=ccl_iters)
    sel, areas, bbox, valid = component_candidates_sorted(binary, labels, k_max, float(min_area))
    gray, mask, origin, scale = extract_patches(imgs, binary, labels, sel, bbox, patch)
    quads0 = quad_corners_from_mask(mask)
    quads = refine_quad_edges(gray, quads0)
    cells = sample_marker_bits(gray, quads, n_bits)
    # map to image coordinates
    quads_img = origin[..., None, :] + quads * scale[..., None, :]
    # quad geometric sanity: signed area (shoelace) well above zero
    x = quads[..., 0]
    y = quads[..., 1]
    area2 = jnp.abs(
        jnp.sum(x * jnp.roll(y, -1, axis=-1) - jnp.roll(x, -1, axis=-1) * y, axis=-1)
    ) * 0.5
    valid = valid & (area2 > float(min_area) * 0.3)
    return quads_img, cells, valid, areas


@partial(jax.jit, static_argnames=("n_bits", "k_max", "patch", "min_area", "ccl_iters"))
def _device_pipeline(images, n_bits: int, k_max: int, patch: int, min_area: int, ccl_iters: int):
    return marker_graph(images.astype(jnp.float32), n_bits, k_max, patch, min_area, ccl_iters)


def _canonical_roll(corners: np.ndarray, rotation: int) -> np.ndarray:
    """Reorder sampled-grid corners so index 0 is the canonical marker's TL.

    match_bits compares the sampled grid against rot90(dict, k=rotation), so
    dict == rot90(sampled, k=-rotation); the canonical TL sits at sampled
    corner index (4 - rotation) % 4 — a BACKWARD roll of the corner list.
    (The sign only matters for rotation 1/3; synthetic near-axis renders all
    hit rotation 0, which is why real 90/270-degree views exposed this.)
    """
    return np.roll(corners, rotation, axis=0)


def detect_markers(
    images: np.ndarray,
    dictionary: str | ArucoDictionary,
    *,
    k_max: int = 64,
    # patch 96: edge refinement runs in patch coordinates, so large markers
    # (200+ px) need the resolution to hold sub-0.5 px corners; 64 matches
    # 96 on real-session marker sizes but degrades the large-marker bound
    patch: int = 96,
    min_area: int = 49,
    # 4 row/col propagation rounds: marker blobs are convex, which converges
    # in 2-3 rounds; 12 was tuned for snake-like components that only
    # under-merged background clutter (rejected downstream by border +
    # dictionary gates anyway). CCL is the detection pipeline's dominant
    # cost on TPU (~286 ms/frame at 12 iters, measured batch-16 @ 720p).
    ccl_iters: int = 4,
    border_frac: float = 0.80,
) -> list[MarkerDetections]:
    """Detect ArUco markers in a (B, H, W) gray frame stack.

    Returns one MarkerDetections per frame. All heavy work is one jitted
    device program over the full stack.
    """
    d = get_dictionary(dictionary) if isinstance(dictionary, str) else dictionary
    images = np.asarray(images)
    if images.ndim == 2:
        images = images[None]
    # Intensity contract: the device graph (threshold offsets, the packed
    # patch atlas's 8-bit gray field) assumes a 0..255 scale. Normalized
    # float frames (0..1) would silently lose all contrast in the atlas, so
    # rescale them here at the host boundary.
    if np.issubdtype(images.dtype, np.floating) and images.size and float(np.nanmax(images)) <= 1.5:
        images = images * 255.0
    quads, cells, valid, _areas = jax.device_get(
        _device_pipeline(jnp.asarray(images), d.marker_size, k_max, patch, min_area, ccl_iters)
    )
    return assemble_marker_detections(quads, cells, valid, d, border_frac)


def assemble_marker_detections(
    quads: np.ndarray, cells: np.ndarray, valid: np.ndarray, d: ArucoDictionary, border_frac: float = 0.80
) -> list[MarkerDetections]:
    """Host-side decode of the device program's candidate outputs: per-
    candidate bit threshold, border blackness + contrast gates, dictionary
    match, canonical corner roll, duplicate-id dedupe by hamming."""
    B = quads.shape[0]
    n = d.marker_size
    out: list[MarkerDetections] = []
    for b in range(B):
        ids_f, corners_f, ham_f = [], [], []
        v = valid[b]
        if v.any():
            # per-candidate bit threshold: midpoint of cell-mean extremes
            c = cells[b]  # (K, n+2, n+2)
            lo = c.reshape(len(c), -1).min(axis=1)
            hi = c.reshape(len(c), -1).max(axis=1)
            thr = (lo + hi) * 0.5
            bits = c > thr[:, None, None]
            border = np.concatenate(
                [
                    bits[:, 0, :], bits[:, -1, :],
                    bits[:, 1:-1, 0], bits[:, 1:-1, -1],
                ],
                axis=1,
            )
            border_ok = (1.0 - border.mean(axis=1)) >= border_frac  # border mostly black
            contrast_ok = (hi - lo) > 20.0
            inner = bits[:, 1:-1, 1:-1].astype(np.float32)
            ids, rots, ham = match_bits(inner, d)
            keep = v & border_ok & contrast_ok & (ids >= 0)
            for k in np.where(keep)[0]:
                ids_f.append(int(ids[k]))
                corners_f.append(_canonical_roll(quads[b, k], int(rots[k])))
                ham_f.append(int(ham[k]))
        if ids_f:
            ids_a = np.asarray(ids_f)
            ham_a = np.asarray(ham_f)
            corners_a = np.asarray(corners_f)
            # dedupe repeated ids: keep lowest hamming
            keep_rows = []
            for mid in np.unique(ids_a):
                rows = np.where(ids_a == mid)[0]
                keep_rows.append(rows[np.argmin(ham_a[rows])])
            keep_rows = np.asarray(sorted(keep_rows))
            out.append(MarkerDetections(ids_a[keep_rows], corners_a[keep_rows], ham_a[keep_rows]))
        else:
            out.append(MarkerDetections(np.zeros(0, np.int64), np.zeros((0, 4, 2)), np.zeros(0, np.int64)))
    return out
