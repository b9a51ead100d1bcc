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


def _s_rhs_kernel(lam_ref, jc_ref, jp_ref, w_ref, bp_ref, s_ref, rhs_ref, hinv_ref, s_acc, rhs_acc):
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
    bp = bp_ref[:]  # (3,T)
    lam = lam_ref[0]

    # NOTE: inline-None indexing mixed with ints (x[:, 0, k, None, :])
    # lowers through a >2D gather Mosaic rejects; slice first, then expand
    w0 = w[:, 0, :][:, None, :]  # (C,1,T)
    w1 = w[:, 1, :][:, None, :]

    # Damped inverse point blocks IN-KERNEL (round 5): the XLA-side
    # _pminor_hpp_inv pass cost ~0.9 ms of the 1.7 ms Schur marginal (an
    # einsum relayout XLA stages poorly); the kernel already holds Jp and w
    # in VMEM, so Hpp, damping, pinning, and the closed-form symmetric
    # inverse are a few extra lane-wise ops per tile. Math must mirror
    # bundle._pminor_hpp_inv exactly (pin zero-trace blocks with I, floor
    # diagonals at 1e-12, Hpp = d + lam*diag*I + 1e-12*I).
    jp0 = jp[:, 0, :, :]  # (C,3,T)
    jp1 = jp[:, 1, :, :]
    up0 = jp0 * w0  # (C,3,T)
    up1 = jp1 * w1

    def dsum(i, j):
        # reduce over the camera axis with unrolled adds: Mosaic rejects
        # vector.multi_reduction over the offset layouts these slices carry
        t = up0[:, i, :] * jp0[:, j, :] + up1[:, i, :] * jp1[:, j, :]  # (C,T)
        acc = t[0]
        for c in range(1, C):
            acc = acc + t[c]
        return acc  # (T,)

    d00, d01, d02 = dsum(0, 0), dsum(0, 1), dsum(0, 2)
    d11, d12, d22 = dsum(1, 1), dsum(1, 2), dsum(2, 2)
    pin = jnp.where(d00 + d11 + d22 == 0.0, 1.0, 0.0)
    d00 = d00 + pin
    d11 = d11 + pin
    d22 = d22 + pin
    h00 = d00 + lam * jnp.maximum(d00, 1e-12) + 1e-12
    h11 = d11 + lam * jnp.maximum(d11, 1e-12) + 1e-12
    h22 = d22 + lam * jnp.maximum(d22, 1e-12) + 1e-12
    c00 = h11 * h22 - d12 * d12
    c01 = d02 * d12 - d01 * h22
    c02 = d01 * d12 - d02 * h11
    c11 = h00 * h22 - d02 * d02
    c12 = d01 * d02 - h00 * d12
    c22 = h00 * h11 - d01 * d01
    inv_det = 1.0 / (h00 * c00 + d01 * c01 + d02 * c02)
    hinv = [
        [c00 * inv_det, c01 * inv_det, c02 * inv_det],
        [c01 * inv_det, c11 * inv_det, c12 * inv_det],
        [c02 * inv_det, c12 * inv_det, c22 * inv_det],
    ]
    for i in range(3):
        for j in range(3):
            hinv_ref[i, j, :] = hinv[i][j]

    u0 = jc[:, 0, :, :] * w0  # (C,9,T)
    u1 = jc[:, 1, :, :] * w1
    # G_k = sum_r U[:, r, :, :] * Jp[:, r, k, :]  -> reshaped (9C, T)
    g = [
        (u0 * jp[:, 0, k, :][:, None, :] + u1 * jp[:, 1, k, :][:, None, :]).reshape(n_cp, T)
        for k in range(3)
    ]
    y = [sum(g[j] * hinv[j][k][None, :] for j in range(3)) for k in range(3)]
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


def _schur_s_rhs_impl(Jc, Jp, w, bp_t, lam):
    """(S_raw, rhs_raw, Hpp_inv_t) with S_raw = sum_p Y_p G_p^T (9C x 9C),
    rhs_raw = sum_p Y_p bp_p (9C,), and Hpp_inv_t (3,3,P) the damped inverse
    point blocks (computed in-kernel; callers reuse it for the
    back-substitution), from point-minor blocks.

    Jc (C,2,9,P), Jp (C,2,3,P), w (C,2,P), bp_t (3,P), lam scalar damping.
    P must be a multiple of TILE (the dense bucketing guarantees it at
    production scales; callers fall back to XLA otherwise).
    """
    C = Jc.shape[0]
    P = Jc.shape[3]
    n_cp = C * 9
    grid = P // TILE
    s, rhs, hinv = pl.pallas_call(
        _s_rhs_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_cp, n_cp), jnp.float32),
            jax.ShapeDtypeStruct((n_cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, P), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((C, 2, 9, TILE), lambda t: (0, 0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2, 3, TILE), lambda t: (0, 0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2, TILE), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_cp, n_cp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, TILE), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_cp, n_cp), jnp.float32),
            pltpu.VMEM((n_cp, 1), jnp.float32),
        ],
    )(jnp.asarray(lam, jnp.float32).reshape(1), Jc.astype(jnp.float32),
      Jp.astype(jnp.float32), w.astype(jnp.float32), bp_t.astype(jnp.float32))
    return s, rhs[:, 0], hinv


schur_s_rhs = jax.jit(_schur_s_rhs_impl)


def reference_hpp_inv(Jp, w, lam):
    """jnp reference of the kernel's in-tile damped point-block inverse
    (identical math to bundle._pminor_hpp_inv's reprojection-only branch)."""
    Up = Jp * w[:, :, None, :]
    d_p_t = jnp.einsum("crip,crjp->ijp", Up, Jp)  # (3,3,P)
    pinned = (d_p_t[0, 0] + d_p_t[1, 1] + d_p_t[2, 2]) == 0
    d_p_t = d_p_t + pinned[None, None, :] * jnp.eye(3, dtype=d_p_t.dtype)[:, :, None]
    diag_t = jnp.maximum(jnp.stack([d_p_t[0, 0], d_p_t[1, 1], d_p_t[2, 2]]), 1e-12)
    eye_t = jnp.eye(3, dtype=d_p_t.dtype)[:, :, None]
    Hpp_t = d_p_t + lam * diag_t[:, None, :] * eye_t + 1e-12 * eye_t
    a, b, c = Hpp_t[0, 0], Hpp_t[0, 1], Hpp_t[0, 2]
    d, e = Hpp_t[1, 1], Hpp_t[1, 2]
    f = Hpp_t[2, 2]
    c00 = d * f - e * e
    c01 = c * e - b * f
    c02 = b * e - c * d
    c11 = a * f - c * c
    c12 = b * c - a * e
    c22 = a * d - b * b
    inv_det = 1.0 / (a * c00 + b * c01 + c * c02)
    rows = jnp.stack(
        [jnp.stack([c00, c01, c02]), jnp.stack([c01, c11, c12]), jnp.stack([c02, c12, c22])]
    )
    return rows * inv_det


def schur_s_rhs_reference(Jc, Jp, w, bp_t, lam):
    """jnp reference of the kernel's math (used by tests and as the shape
    contract documentation)."""
    Hpp_inv_t = reference_hpp_inv(Jp, w, lam)
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
    return S, rhs, Hpp_inv_t


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
