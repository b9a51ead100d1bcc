"""Analytic roofline model for the two hot device programs.

Counts the arithmetic work and the *lower-bound* HBM traffic of (a) one LM
bundle-adjustment iteration at a given problem size and (b) the fused ChArUco
detection program per frame, then converts a measured wall time into achieved
FLOP/s and GB/s and a percent-of-peak figure against the TPU v5e.

The byte model is a LOWER BOUND: each named intermediate is counted as one
write plus one read, assuming perfect fusion of everything unnamed. Real
traffic is higher (scatter/segment-sum lowering re-reads index vectors,
XLA materializes some fusion boundaries twice), so the percent-of-peak
numbers are optimistic for the kernel and honest about the ceiling: a low
number means the program is latency/lowering-bound, not that the chip is
out of bandwidth.

v5e peaks (public spec): 197 bf16 TFLOP/s; f32 matmul runs through the MXU
in multiple bf16 passes, conventionally ~1/4 rate => 49 TFLOP/s assumed
here; HBM 819 GB/s.
"""

from __future__ import annotations

V5E_PEAK_F32_GFLOPS = 49_000.0
V5E_PEAK_HBM_GBS = 819.0

F32 = 4  # bytes


def lm_iteration_flops_bytes(
    n_obs: int, n_points: int, n_cameras: int, dense_grid_points: int | None = None
) -> tuple[float, float]:
    """(flops, lower-bound HBM bytes) for one LM iteration, Schur solver,
    no constraints — the canonical-scale production shape.

    dense_grid_points: the bucketed point count of the DENSE (P, C) layout
    (solvers/bundle.py BADenseProblem — the production layout at this
    scale). Per-slot work then runs over the FULL P x C grid (masked slots
    cost flops too), but the index vectors, one-hot expansion and segment
    scatters all vanish. Pass None to model from volume.optimize's own
    quarter-octave bucketing of n_points.

    Derivation (stage names match solvers/bundle.py):
      blocks    — jacfwd of the 12-parameter projection per slot:
                  ~12 tangent passes x ~110 flops + the primal ~= 1.4k/slot;
                  writes r (2), Jc (18), Jp (6) floats per slot.
      grad/diag — dense einsums over the grid: slot x (18 + 162 + 6 + 18)
                  MACs for g_c/d_c/g_p/d_p.
      schur     — G = per-slot product (27 MACs/slot, no segment sum);
                  Y = G Hpp^-1 (C*P*162 flops, reads G writes Y);
                  S = -Y G^T (C^2 * 81 * P * 3 MACs, reads G and Y).
      cost-only — one more projection pass per slot (~200 flops).
    """
    P, C = float(n_points), float(n_cameras)
    if dense_grid_points is None:
        from caliscope_tpu.ops.bucket import bucket_size

        dense_grid_points = bucket_size(n_points + 1, fine=True)
    Pg = float(dense_grid_points)
    slots = Pg * C
    flops = (
        slots * 1_400.0  # jacobian blocks (jacfwd)
        + slots * (18 + 162 + 6 + 18) * 2  # gradient/diag einsums (MAC = 2)
        + slots * 27 * 2  # G per-slot products
        + C * Pg * 162  # Y
        + C * C * 81 * Pg * 3 * 2  # S contraction
        + slots * 200.0  # cost-only step-accept pass
    )
    bytes_lb = (
        slots * (2 + 18 + 6) * F32 * 2  # r/Jc/Jp written then read
        + slots * 2 * F32  # uv reads
        + C * Pg * 27 * F32 * 2 * 2  # G and Y, each written + read
        + Pg * 12 * F32  # g_p/d_p out
    )
    return flops, bytes_lb


def lm_iteration_roofline(
    n_obs: int, n_points: int, n_cameras: int, sec_per_iter: float, dense_grid_points: int | None = None
) -> dict:
    """Roofline fields for the bench JSON line (rates in G-units)."""
    flops, bytes_lb = lm_iteration_flops_bytes(n_obs, n_points, n_cameras, dense_grid_points)
    gflops = flops / sec_per_iter / 1e9
    gbs = bytes_lb / sec_per_iter / 1e9
    return {
        "gflop_per_iter": round(flops / 1e9, 3),
        "gbyte_per_iter_lower_bound": round(bytes_lb / 1e9, 3),
        "achieved_gflops": round(gflops, 2),
        "achieved_gbs_lower_bound": round(gbs, 2),
        "pct_of_v5e_f32_peak": round(100.0 * gflops / V5E_PEAK_F32_GFLOPS, 3),
        "pct_of_v5e_hbm_peak": round(100.0 * gbs / V5E_PEAK_HBM_GBS, 3),
    }


def detect_program_flops_bytes(h: int, w: int, ccl_iters: int = 4, k_max: int = 64, patch: int = 96, x_kmax: int = 256) -> tuple[float, float]:
    """(flops, lower-bound HBM bytes) for the fused ChArUco device program,
    PER FRAME (marker graph + X-corner graph, detect/kernels.py +
    detect/corners.py).

    Dominated by full-frame passes: integral image (2 cumsums), two
    threshold evaluations, CCL (ccl_iters x 4 segmented scans, each a
    cumsum + cummin + elementwise over the full frame), candidate pooling,
    and the X-corner ring response. Patch-space work (k_max patches of
    patch^2 plus bit sampling) is second order.
    """
    px = float(h * w)
    full_frame_passes_flops = (
        px * 2 * 2  # integral: two cumsum passes
        + px * 2 * 10  # two adaptive thresholds (4 slices + compare each)
        + ccl_iters * 4 * px * 8  # segmented scans: cumsum+cummin+offset math
        + px * 6  # pooling + rank cumsum
        + px * 40  # X-corner ring response + NMS window max
    )
    patch_flops = k_max * patch * patch * 60.0 + x_kmax * 200.0
    flops = full_frame_passes_flops + patch_flops
    bytes_lb = (
        px * F32 * 2  # frame read + float cast write
        + px * F32 * 2  # integral write + read
        + px * 1 * 2  # binary mask (bool) write + read
        + ccl_iters * 4 * px * 4 * 2  # labels i32 read+write per scan pass
        + px * F32 * 2  # ring response write + NMS read
        + k_max * patch * patch * 4 * 2  # atlas slices
    )
    return flops, bytes_lb


def detect_roofline(h: int, w: int, sec_per_frame: float) -> dict:
    flops, bytes_lb = detect_program_flops_bytes(h, w)
    gflops = flops / sec_per_frame / 1e9
    gbs = bytes_lb / sec_per_frame / 1e9
    return {
        "gflop_per_frame": round(flops / 1e9, 3),
        "gbyte_per_frame_lower_bound": round(bytes_lb / 1e9, 3),
        "achieved_gflops": round(gflops, 2),
        "achieved_gbs_lower_bound": round(gbs, 2),
        "pct_of_v5e_f32_peak": round(100.0 * gflops / V5E_PEAK_F32_GFLOPS, 3),
        "pct_of_v5e_hbm_peak": round(100.0 * gbs / V5E_PEAK_HBM_GBS, 3),
    }


if __name__ == "__main__":
    import json
    import sys

    sec = float(sys.argv[1]) if len(sys.argv) > 1 else 0.030
    print(json.dumps(lm_iteration_roofline(141_422, 35_000, 8, sec), indent=2))
    print(json.dumps(detect_roofline(720, 1280, 0.007), indent=2))
