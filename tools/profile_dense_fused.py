"""Fused-marginal profile of the dense LM iteration (point-minor layout).

Chained stage cuts force materialization and overstate the fused cost
(PROFILE.md); this instead times VARIANTS of the full fused step with
pieces replaced by trivial stand-ins, so every variant keeps XLA's real
fusion and the DIFFERENCES are honest marginals:

  full        = blocks + grad/diag + Schur solve + cost eval
  nosolve     = blocks + grad/diag + gradient-step + cost eval
  blocksonly  = blocks + scalar reduce + cost eval
  costonly    = cost eval alone

Usage: python tools/profile_dense_fused.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import N_CAMERAS, N_POINTS, _synth_problem
from caliscope_tpu.ops.bucket import bucket_size
from caliscope_tpu.solvers import bundle as B

REPS = 10  # chain calls are timed at two lengths; the slope removes the
# per-call dispatch + scalar-fetch overhead (~27 ms through the tunnel)


def main():
    K, dist, rvecs, tvecs, X, cam_idx, pt_idx, uv = _synth_problem()
    Pb = bucket_size(N_POINTS + 1, fine=True)
    Xb = np.concatenate([X, np.tile(X.mean(axis=0), (Pb - N_POINTS, 1))])
    problem = B.make_dense_problem(cam_idx, pt_idx, uv, K, dist, np.zeros(N_CAMERAS, bool), n_points=Pb)
    cam9 = jnp.asarray(
        np.concatenate([rvecs, tvecs, np.ones((N_CAMERAS, 1)), dist[:, :2]], axis=1),
        np.asarray(problem.uv).dtype,
    )
    Xd = jnp.asarray(Xb, cam9.dtype)
    lam = jnp.asarray(1e-4, cam9.dtype)

    def step(cam9_i, X_i, kind):
        if kind == "costonly":
            c = B._cost_only(problem, cam9_i, X_i, "linear", 1.0)
            # the cost must feed the loop carry or XLA hoists the whole
            # eval out of the fori_loop as loop-invariant
            return jnp.full_like(cam9_i, 1e-30) * c, X_i * 0, c
        r, w, Jc, Jp, rq, qidx, Jq, cost = B._masked_blocks(problem, cam9_i, X_i, "linear", 1.0)
        if kind == "blocksonly":
            dxc = jnp.sum(Jc, axis=(1, 3)) * 1e-30 + jnp.sum(r) * 1e-30
            dxp = jnp.sum(Jp, axis=(0, 1)).T * 1e-30  # (P,3)
        else:
            g_c, g_p, d_c, d_p = B._gradient_and_diag(problem, w, r, Jc, Jp, rq, qidx, Jq, X_i.shape[0])
            if kind == "nosolve":
                dxc, dxp = -g_c * 1e-6, -g_p * 1e-6
            else:
                dxc, dxp = B._solve_schur(problem, w, Jc, Jp, qidx, Jq, g_c, g_p, d_c, d_p, lam, 1e-6, 30)
        cost_new = B._cost_only(problem, cam9_i + dxc, X_i + dxp, "linear", 1.0)
        return dxc, dxp, cost_new

    @partial(jax.jit, static_argnames=("kind", "reps"))
    def chain(cam9_0, X_0, kind, reps):
        def body(i, carry):
            c9, Xc, acc = carry
            dxc, dxp, cn = step(c9, Xc, kind)
            return c9 + dxc * 1e-20, Xc + dxp * 1e-20, acc + cn

        return jax.lax.fori_loop(0, reps, body, (cam9_0, X_0, jnp.asarray(0.0, cam9_0.dtype)))[2]

    def timed(kind, reps):
        float(chain(cam9, Xd, kind, reps))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(cam9, Xd, kind, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    for kind in ("costonly", "blocksonly", "nosolve", "full"):
        lo, hi = timed(kind, REPS), timed(kind, 4 * REPS)
        results[kind] = (hi - lo) / (3 * REPS) * 1000
        print(f"{kind:10s} {results[kind]:7.2f} ms/step (dispatch-free slope)")
    print(f"\nfused marginals: cost={results['costonly']:.2f}  "
          f"blocks={results['blocksonly'] - results['costonly']:.2f}  "
          f"grad/diag={results['nosolve'] - results['blocksonly']:.2f}  "
          f"schur={results['full'] - results['nosolve']:.2f}")


if __name__ == "__main__":
    main()
