"""Stage-level profile of the batched ChArUco detection pipeline on the TPU.

Chained-timing methodology (see bench.py / MEMORY): CHAIN reps inside one
jit with a data dependency between reps, so XLA cannot hoist the body or
dead-code it. Prints a cumulative-stage table like PROFILE.md's LM table.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo python tools/profile_detect.py
"""

from __future__ import annotations

import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = int(os.environ.get("CHAIN", 8))
TIMEOUT = int(os.environ.get("TIMEOUT", 600))


def _alarm(sig, frm):
    raise TimeoutError("profile section timed out")


signal.signal(signal.SIGALRM, _alarm)


def health_probe():
    signal.alarm(90)
    try:
        x = jnp.ones((128, 128))
        v = float((x @ x).sum())
        assert v == 128.0 * 128 * 128
    finally:
        signal.alarm(0)
    print(f"device ok: {jax.devices()[0].platform}", flush=True)


def make_frames():
    from bench import _detect_frames

    ch, frames = _detect_frames()
    return ch, frames


def chained(fn, images_f32, label, reps=CHAIN):
    """Time fn(images) with a data-dependent chain inside one jit."""

    @jax.jit
    def prog(imgs):
        seed = jnp.float32(0.0)
        out = jnp.float32(0.0)
        for _ in range(reps):
            r = fn(imgs * (1.0 + seed * 1e-30))
            red = sum(jnp.sum(jnp.asarray(t, jnp.float32) * 1e-30) for t in jax.tree_util.tree_leaves(r))
            out = out + red
            seed = red
        return out

    signal.alarm(TIMEOUT)
    try:
        v = float(prog(images_f32))  # compile + run
        t0 = time.perf_counter()
        v = float(prog(images_f32))
        dt = (time.perf_counter() - t0) / reps
    finally:
        signal.alarm(0)
    print(f"{label:55s} {dt * 1e3:8.1f} ms/stack  ({dt / images_f32.shape[0] * 1e3:6.2f} ms/frame)", flush=True)
    return dt


def main():
    health_probe()
    ch, frames = make_frames()
    B = frames.shape[0]
    print(f"stack: {frames.shape} uint8, backend={jax.default_backend()}", flush=True)

    from caliscope_tpu.detect.aruco import marker_graph
    from caliscope_tpu.detect.corners import xcorner_graph
    from caliscope_tpu.detect.kernels import (
        adaptive_threshold,
        component_candidates,
        connected_components,
        extract_patches,
        integral_image,
        quad_corners_from_mask,
        refine_quad_edges,
        sample_marker_bits,
    )

    imgs = jnp.asarray(frames.astype(np.float32))
    use_pallas = jax.default_backend() == "tpu"

    n_bits, k_max, patch, min_area, ccl_iters, x_kmax = 4, 64, 96, 49, 12, 256
    # match the tracker's actual call (ccl_iters=4 per charuco_tracker)
    ccl_iters = 4

    def s_integral(im):
        return integral_image(im)

    def s_thresh(im):
        integral = integral_image(im)
        return adaptive_threshold(im, 10, 7.0, integral) | adaptive_threshold(im, 26, 7.0, integral)

    def s_ccl(im):
        b = s_thresh(im)
        return connected_components(b, n_iters=ccl_iters).astype(jnp.float32)

    def s_cand(im):
        b = s_thresh(im)
        lab = connected_components(b, n_iters=ccl_iters)
        sel, areas, bbox, valid = component_candidates(b, lab, k_max, float(min_area))
        return areas.astype(jnp.float32), bbox.astype(jnp.float32)

    def s_patches(im):
        b = s_thresh(im)
        lab = connected_components(b, n_iters=ccl_iters)
        sel, areas, bbox, valid = component_candidates(b, lab, k_max, float(min_area))
        gray, mask, origin, scale = extract_patches(im, b, lab, sel, bbox, patch)
        return gray, mask.astype(jnp.float32)

    def s_quads(im):
        b = s_thresh(im)
        lab = connected_components(b, n_iters=ccl_iters)
        sel, areas, bbox, valid = component_candidates(b, lab, k_max, float(min_area))
        gray, mask, origin, scale = extract_patches(im, b, lab, sel, bbox, patch)
        q0 = quad_corners_from_mask(mask)
        return q0

    def s_refine(im):
        b = s_thresh(im)
        lab = connected_components(b, n_iters=ccl_iters)
        sel, areas, bbox, valid = component_candidates(b, lab, k_max, float(min_area))
        gray, mask, origin, scale = extract_patches(im, b, lab, sel, bbox, patch)
        q0 = quad_corners_from_mask(mask)
        q = refine_quad_edges(gray, q0)
        return q

    def s_marker_full(im):
        return marker_graph(im, n_bits, k_max, patch, min_area, ccl_iters)

    def s_xcorner(im):
        return xcorner_graph(im, x_kmax, use_pallas)

    def s_full(im):
        a = marker_graph(im, n_bits, k_max, patch, min_area, ccl_iters)
        b = xcorner_graph(im, x_kmax, use_pallas)
        return (*a, *b)

    chained(s_integral, imgs, "integral image")
    chained(s_thresh, imgs, "+ threshold (2 radii)")
    chained(s_ccl, imgs, "+ connected components (4 iters)")
    chained(s_cand, imgs, "+ component candidates (k=64)")
    chained(s_patches, imgs, "+ extract patches (96px, 64)")
    chained(s_quads, imgs, "+ quad corners")
    chained(s_refine, imgs, "+ refine quad edges")
    chained(s_marker_full, imgs, "marker_graph full (+bits)")
    chained(s_xcorner, imgs, "xcorner_graph alone")
    chained(s_full, imgs, "FULL fused program")

    # end-to-end tracker numbers for comparison
    from caliscope_tpu.trackers.charuco_tracker import CharucoTracker

    tr = CharucoTracker(ch)
    signal.alarm(TIMEOUT)
    try:
        pk = tr.get_points_batch(frames)
        t0 = time.perf_counter()
        pk = tr.get_points_batch(frames)
        dt = time.perf_counter() - t0
    finally:
        signal.alarm(0)
    n = sum(len(p) for p in pk)
    print(f"{'get_points_batch end-to-end':55s} {dt * 1e3:8.1f} ms/stack  ({dt / B * 1e3:6.2f} ms/frame)  [{n} pts, {B / dt:.1f} fps]", flush=True)

    # host assembly cost alone
    dets_list, cand_list = tr._run_stack(frames.astype(np.float32))
    t0 = time.perf_counter()
    for j in range(B):
        tr._detect_face(frames[j].astype(np.float32), dets=dets_list[j], cand=cand_list[j])
    dt_h = time.perf_counter() - t0
    print(f"{'host assembly (detect_face x B)':55s} {dt_h * 1e3:8.1f} ms/stack  ({dt_h / B * 1e3:6.2f} ms/frame)", flush=True)

    # _run_stack (device program + device_get + marker assembly)
    t0 = time.perf_counter()
    tr._run_stack(frames.astype(np.float32))
    dt_r = time.perf_counter() - t0
    print(f"{'_run_stack (program + readback + marker asm)':55s} {dt_r * 1e3:8.1f} ms/stack  ({dt_r / B * 1e3:6.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
