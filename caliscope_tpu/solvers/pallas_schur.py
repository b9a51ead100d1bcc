"""Pallas TPU kernel: fused Schur-complement assembly for the dense BA layout.

The dense LM iteration's dominant remaining cost (tools/profile_dense_fused.py,
round 4) is producing the Schur system: the XLA path materializes the
coupling tensor G (C,9,3,P) and its Hpp-scaled copy Y (~31 MB each) on the
way to S = sum_p Y_p G_p^T. This kernel computes S (9C x 9C) and the
reduced right-hand side directly from the masked Jacobian blocks, one
point-tile at a time, entirely in VMEM:

    per tile of T points:
        U  = Jc * w                      (VPU, (C,2,9,T))
        Gk = sum_r U[:,r,i,:] Jp[:,r,k,:]   -> (9C, T) per k  (VPU)
        Yk = sum_j Gj * Hpp_inv[j,k]        -> (9C, T)        (VPU)
        S   += Yk @ Gk^T                    (MXU, (9C,T)x(T,9C))
        rhs += Yk @ bp[k]                   (MXU matvec)

HBM traffic is one read of the blocks (~30 MB) instead of writing+re-reading
two 31 MB coupling tensors; the (9C, 9C) accumulator lives in VMEM scratch
across the sequential grid.

Used for reprojection-only dense problems on the TPU backend (constrained
problems keep the XLA path — their Schur factors double as a CG
preconditioner that needs the explicit tensors). Set
CALISCOPE_TPU_NO_PALLAS_SCHUR=1 to force the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _s_rhs_kernel(jc_ref, jp_ref, w_ref, hinv_ref, bp_ref, s_ref, rhs_ref, s_acc, rhs_acc):
    t = pl.program_id(0)
    C = jc_ref.shape[0]
    n_cp = C * 9
    T = jc_ref.shape[3]

    @pl.when(t == 0)
    def _():
        s_acc[:] = jnp.zeros_like(s_acc)
        rhs_acc[:] = jnp.zeros_like(rhs_acc)

    jc = jc_ref[:]  # (C,2,9,T)
    jp = jp_ref[:]  # (C,2,3,T)
    w = w_ref[:]  # (C,2,T)
    hinv = hinv_ref[:]  # (3,3,T)
    bp = bp_ref[:]  # (3,T)

    # NOTE: inline-None indexing mixed with ints (x[:, 0, k, None, :])
    # lowers through a >2D gather Mosaic rejects; slice first, then expand
    w0 = w[:, 0, :][:, None, :]  # (C,1,T)
    w1 = w[:, 1, :][:, None, :]
    u0 = jc[:, 0, :, :] * w0  # (C,9,T)
    u1 = jc[:, 1, :, :] * w1
    # G_k = sum_r U[:, r, :, :] * Jp[:, r, k, :]  -> reshaped (9C, T)
    g = [
        (u0 * jp[:, 0, k, :][:, None, :] + u1 * jp[:, 1, k, :][:, None, :]).reshape(n_cp, T)
        for k in range(3)
    ]
    y = [sum(g[j] * hinv[j, k][None, :] for j in range(3)) for k in range(3)]
    s = s_acc[:]
    rhs = rhs_acc[:]
    for k in range(3):
        s = s + jax.lax.dot_general(
            y[k], g[k], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        rhs = rhs + jnp.sum(y[k] * bp[k][None, :], axis=1, keepdims=True)
    s_acc[:] = s
    rhs_acc[:] = rhs

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        s_ref[:] = s_acc[:]
        rhs_ref[:] = rhs_acc[:]


def _schur_s_rhs_impl(Jc, Jp, w, Hpp_inv_t, bp_t):
    """(S_raw, rhs_raw) with S_raw = sum_p Y_p G_p^T (9C x 9C) and
    rhs_raw = sum_p Y_p bp_p (9C,), from point-minor blocks.

    Jc (C,2,9,P), Jp (C,2,3,P), w (C,2,P), Hpp_inv_t (3,3,P), bp_t (3,P).
    P must be a multiple of TILE (the dense bucketing guarantees it at
    production scales; callers fall back to XLA otherwise).
    """
    C = Jc.shape[0]
    P = Jc.shape[3]
    n_cp = C * 9
    grid = P // TILE
    s, rhs = pl.pallas_call(
        _s_rhs_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_cp, n_cp), jnp.float32),
            jax.ShapeDtypeStruct((n_cp, 1), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((C, 2, 9, TILE), lambda t: (0, 0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2, 3, TILE), lambda t: (0, 0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2, TILE), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, TILE), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_cp, n_cp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_cp, n_cp), jnp.float32),
            pltpu.VMEM((n_cp, 1), jnp.float32),
        ],
    )(Jc.astype(jnp.float32), Jp.astype(jnp.float32), w.astype(jnp.float32),
      Hpp_inv_t.astype(jnp.float32), bp_t.astype(jnp.float32))
    return s, rhs[:, 0]


schur_s_rhs = jax.jit(_schur_s_rhs_impl)


def schur_s_rhs_reference(Jc, Jp, w, Hpp_inv_t, bp_t):
    """jnp reference of the kernel's math (used by tests and as the shape
    contract documentation)."""
    U = Jc * w[:, :, None, :]
    G = jnp.einsum("crip,crkp->cikp", U, Jp)
    Y = jnp.stack(
        [sum(G[:, :, j, :] * Hpp_inv_t[j, k][None, None, :] for j in range(3)) for k in range(3)],
        axis=2,
    )
    C = Jc.shape[0]
    n_cp = C * 9
    S = sum(
        jax.lax.dot_general(
            Y[:, :, k, :].reshape(n_cp, -1), G[:, :, k, :].reshape(n_cp, -1),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        for k in range(3)
    )
    rhs = sum(Y[:, :, k, :].reshape(n_cp, -1) @ bp_t[k] for k in range(3))
    return S, rhs


def pallas_schur_available(problem, mesh, P: int, dtype=jnp.float32) -> bool:
    """Host-side eligibility for the fused kernel. Callers should compute
    this OUTSIDE jit and thread it as a static argument (lm_solve does) so
    the env kill switch participates in the jit cache key.

    Gates: TPU backend; single placement (the kernel has no collective
    story — the XLA per-k staging shards cleanly); reprojection-only (the
    constrained path's Schur factors double as a CG preconditioner that
    needs the explicit tensors); point count tiled by TILE; f32 (the
    kernel accumulates in f32 — x64 parity runs must keep the XLA path);
    camera count bounded so the per-tile VMEM footprint (blocks + 6 (9C,
    TILE) g/y planes + the (9C)^2 accumulator) stays inside the 16 MB
    budget instead of failing Mosaic compilation where XLA would have
    worked."""
    import os

    if os.environ.get("CALISCOPE_TPU_NO_PALLAS_SCHUR"):
        return False
    return (
        jax.default_backend() == "tpu"
        and mesh is None
        and problem.n_constraints == 0
        and P % TILE == 0
        and P >= TILE
        and problem.n_cameras <= 16
        and np.dtype(dtype) == np.float32
    )
