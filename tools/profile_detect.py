"""Stage-level profile of the fused detection device program on the real chip.

Chained-timing methodology (PROFILE.md): each stage is timed by running M
dependent reps inside one jit (data dependency between reps defeats hoisting)
and fetching ONE reduced scalar — block_until_ready does not synchronize on
the axon platform, and every device_get costs a flat ~27 ms round trip.

Stages are CUMULATIVE prefixes of the marker graph so marginal cost per stage
is the difference of adjacent rows (matching bench.py::profile_iteration's
methodology for the BA solver).

Usage: python tools/profile_detect.py [reps]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

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
from caliscope_tpu.detect.corners import xcorner_graph

N_BITS, K_MAX, PATCH, MIN_AREA, CCL_ITERS = 4, 64, 96, 49, 4


def stage_graph(imgs, upto: str, ccl_iters: int = CCL_ITERS):
    """Prefix of the marker graph up to (and including) `upto`; returns one
    f32 scalar-reducible array so every stage's outputs stay live."""
    integral = integral_image(imgs)
    binary = adaptive_threshold(imgs, radius=10, c=7.0, integral=integral) | adaptive_threshold(
        imgs, radius=26, c=7.0, integral=integral
    )
    if upto == "threshold":
        return binary.sum(dtype=jnp.float32)
    labels = connected_components_dispatch(binary, n_iters=ccl_iters)
    if upto == "ccl":
        return labels.sum(dtype=jnp.float32)
    sel, areas, bbox, valid = component_candidates_sorted(binary, labels, K_MAX, float(MIN_AREA))
    if upto == "candidates":
        return areas.sum() + bbox.sum() + sel.sum(dtype=jnp.float32)
    gray, mask, origin, scale = extract_patches(imgs, binary, labels, sel, bbox, PATCH)
    if upto == "patches":
        return gray.sum() + mask.sum(dtype=jnp.float32) + origin.sum()
    quads0 = quad_corners_from_mask(mask)
    if upto == "quads0":
        return quads0.sum()
    quads = refine_quad_edges(gray, quads0)
    if upto == "refine":
        return quads.sum()
    cells = sample_marker_bits(gray, quads, N_BITS)
    return quads.sum() + cells.sum()


@partial(jax.jit, static_argnames=("upto", "reps", "ccl_iters"))
def chained(imgs, upto: str, reps: int, ccl_iters: int = CCL_ITERS):
    def body(i, carry):
        acc, im = carry
        # data dependency: perturb input by the running scalar (epsilon-scale)
        s = stage_graph(im + acc * 1e-20, upto, ccl_iters)
        return acc + s, im

    acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), imgs))
    return acc


@partial(jax.jit, static_argnames=("reps", "use_pallas", "x_kmax"))
def chained_xcorners(imgs, reps: int, use_pallas: bool, x_kmax: int = 256):
    def body(i, carry):
        acc, im = carry
        xy, score, valid = xcorner_graph(im + acc * 1e-20, x_kmax, use_pallas)
        return acc + xy.sum() + score.sum(), im

    acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), imgs))
    return acc


def time_call(fn, *args):
    fn(*args)  # compile + settle
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from bench import _detect_frames  # shared synthetic frames

    _ch, frames = _detect_frames()
    B = 16
    imgs = jnp.asarray(frames[:B].astype(np.float32))
    use_pallas = jax.default_backend() == "tpu"
    print(f"platform={jax.default_backend()} B={B} reps={reps}")

    base = time_call(chained, imgs, "threshold", 0)  # round-trip + const
    rows = []
    for upto in ["threshold", "ccl", "candidates", "patches", "quads0", "refine", "full"]:
        t = time_call(chained, imgs, upto, reps)
        ms = (t - base) / reps * 1000.0
        rows.append((upto, ms))
        prev = rows[-2][1] if len(rows) > 1 else 0.0
        print(f"marker:{upto:12s} cum {ms:8.2f} ms/stack  marginal {ms - prev:8.2f}")
    tx = time_call(chained_xcorners, imgs, reps, use_pallas)
    msx = (tx - base) / reps * 1000.0
    print(f"xcorners:full     cum {msx:8.2f} ms/stack")
    total = rows[-1][1] + msx
    print(f"TOTAL device ~ {total:.1f} ms / {B} frames -> {B / total * 1000:.1f} fps compute-bound (marker+xcorner)")

    # CCL iteration sensitivity
    for it in [2, 4, 8]:
        t = time_call(chained, imgs, "ccl", reps, it)
        print(f"ccl_iters={it}: cum {(t - base) / reps * 1000.0:8.2f} ms/stack")


if __name__ == "__main__":
    main()
