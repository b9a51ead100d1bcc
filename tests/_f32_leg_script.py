"""Standalone f32 numerics leg (run by tests/test_f32_leg.py in a clean
subprocess with x64 DISABLED).

The CPU suite runs entirely in x64 (tests/conftest.py), but the production
TPU dtype is float32 — the round-4 accuracy fixes (DLT Gauss-Newton
polish, the "highest" matmul-precision default) only ever executed on the
rarely-run on-device tier. This leg pins the f32 behaviors on CPU:

1. importing the package sets the matmul-precision default (the TPU MXU's
   bf16 default costs ~0.5 px on real metric reprojection);
2. f32 triangulation stays at micrometer accuracy on a narrow-baseline
   scene — WITHOUT the GN polish the squared-normal DLT degrades ~20x
   here (0.039 mm vs 0.002 mm max, measured at calibration time);
3. the full f32 LM solve (both the dense point-minor layout and the
   sparse obs-minor layout) recovers a noisy ring scene to the same
   sub-px reprojection quality the x64 suite demands.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = ""
import jax

jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64, "f32 leg must run with x64 OFF"

import numpy as np

import caliscope_tpu  # noqa: F401  (import side effect under test)

assert jax.config.jax_default_matmul_precision == "highest", (
    "package import no longer sets the accuracy-critical matmul-precision "
    "default (TPU bf16 matmuls cost ~0.5 px of metric reprojection error)"
)

# --- 2. f32 triangulation accuracy (GN-polish guard) -----------------------
from caliscope_tpu.synthetic.factories import default_ring_scene, narrow_baseline_scene

scene = narrow_baseline_scene(noise_sigma_px=0.0)
ip = scene.image_points_perfect()
gt = scene.world_points()
gt_map = {tuple(k): x for k, x in zip(gt.keys(), gt.xyz)}
wp = ip.triangulate(scene.cameras)
errs = np.array([np.linalg.norm(x - gt_map[tuple(k)]) for k, x in zip(wp.keys(), wp.xyz)])
assert errs.max() < 1e-5, (
    f"f32 noiseless narrow-baseline triangulation max err {errs.max() * 1e3:.4f} mm "
    "(> 0.01 mm: did the DLT lose its Gauss-Newton polish?)"
)

# --- 3. f32 LM solve in both layouts ---------------------------------------
from caliscope_tpu.ops.bucket import bucket_size
from caliscope_tpu.solvers.bundle import BAConfig, initial_cam9, lm_solve, make_dense_problem, make_problem

scene = default_ring_scene(noise_sigma_px=0.5)
ip = scene.image_points_noisy()
views = scene.cameras.device_views(posed_only=True)
id_to_idx = {int(c): i for i, c in enumerate(views.cam_ids)}
cam_idx = np.array([id_to_idx[int(c)] for c in ip.cam_id])
pt_idx, keys = ip.point_index()
wp = ip.triangulate(scene.cameras)
key_map = {tuple(k): i for i, k in enumerate(wp.keys())}
X0 = wp.xyz[np.array([key_map[tuple(k)] for k in keys])]
cam9 = initial_cam9(scene.cameras)
cfg = BAConfig(max_iter=60, shard="never")

results = {}
Pb = bucket_size(X0.shape[0] + 1, fine=True)
Xb = np.concatenate([X0, np.tile(X0.mean(axis=0), (Pb - X0.shape[0], 1))])
dense = make_dense_problem(cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye, n_points=Pb)
results["dense"] = lm_solve(dense, cam9, Xb, cfg)
sparse = make_problem(cam_idx, pt_idx, ip.img_xy, views.K, views.dist, views.fisheye)
# force the obs-minor layout (the accelerator production path) so its f32
# numerics are what this leg pins — "auto" resolves to row-major on CPU
results["sparse"] = lm_solve(
    sparse, cam9, X0, BAConfig(max_iter=60, shard="never", obs_minor="always")
)

for name, res in results.items():
    assert res.cost_final < res.cost_initial, name
    # normalized-residual cost -> px RMSE: cost = 0.5 * sum((r_px / fx)^2)
    n_obs = len(cam_idx)
    fx = views.K[0, 0, 0]
    rmse_px = float(np.sqrt(res.cost_final / n_obs)) * fx
    assert rmse_px < 0.7, f"{name}: f32 solve RMSE {rmse_px:.3f} px (x64 suite achieves ~0.5)"
    print(f"F32LEG {name}: cost {res.cost_initial:.4f} -> {res.cost_final:.4f}, ~{rmse_px:.3f} px", flush=True)

# both layouts must agree on the optimum (same problem, different engines)
rel = abs(results["dense"].cost_final - results["sparse"].cost_final) / results["sparse"].cost_final
assert rel < 5e-3, f"dense/sparse f32 optima diverge: {rel:.2e}"

print("F32LEG_OK")
