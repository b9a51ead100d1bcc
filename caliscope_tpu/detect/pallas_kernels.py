"""Hand-written Pallas TPU kernels for the detection hot path.

The X-corner ring response reads 16 fractionally-shifted copies of every
frame. Under plain XLA each shifted read is its own HBM-resident
pad+slice+blend; this kernel instead keeps ONE frame resident in VMEM and
produces all 16 shifted views from on-chip memory — a single HBM read per
frame, all arithmetic on the VPU (see pallas_guide: HBM -> VMEM -> compute).

Used automatically on TPU backends; other platforms run the identical kernel
through the Pallas interpreter only in tests (production falls back to the
jnp implementation in detect/corners.py, which XLA fuses adequately on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caliscope_tpu.detect.corners import _ring_offsets


def _response_tile_kernel(img_hbm, out_ref, scratch, sem, *, offsets, pad: int, halo: int, tile: int, H: int, W: int, true_H: int):
    """Row-tiled kernel: DMA a halo'd (tile + 2*pad, W) slab HBM -> VMEM,
    compute the ring response for the tile's rows, write the (1, tile, W)
    output block. Double the work stays on-chip; HBM is read once per pixel
    (plus the halo overlap)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    rows = tile + 2 * halo  # halo >= pad, rounded so `rows` is sublane-tiled
    row0 = t * tile  # first output row of this tile (padded-image coords)
    # the input is pre-padded by `halo` rows top and bottom, so every tile's
    # halo'd slab [row0, row0 + rows) is in bounds and `local` is constant
    local = halo

    copy = pltpu.make_async_copy(img_hbm.at[b, pl.ds(row0, rows), :], scratch, sem)
    copy.start()
    copy.wait()

    def shifted(iy, ix, fy, fx):
        # rows: static slab offsets via sublane slicing (|iy| <= pad - 1);
        # cols: lane-dimension circular rolls (Mosaic-native) — the wrapped
        # columns land only in the masked side borders
        def row_slab(ddy):
            return scratch[pl.ds(local + iy + ddy, tile), :]

        blend_rows = (1 - fy) * row_slab(0) + fy * row_slab(1)  # (tile, W)
        # pltpu.roll requires a non-negative shift; rolling left by k is
        # rolling right by W - k
        a = pltpu.roll(blend_rows, (W - ix) % W, axis=1)
        c = pltpu.roll(blend_rows, (W - ix - 1) % W, axis=1)
        return (1 - fx) * a + fx * c

    center = scratch[pl.ds(local, tile), :]

    n = len(offsets)
    shifts = []
    for dy, dx in offsets:
        iy, ix = int(np.floor(dy)), int(np.floor(dx))
        fy, fx = float(dy - iy), float(dx - ix)
        shifts.append(shifted(iy, ix, fy, fx))

    sr = sum(jnp.abs(shifts[i] - shifts[(i + n // 2) % n]) for i in range(n // 2))
    dr = sum(jnp.abs(shifts[i] - shifts[(i + n // 4) % n]) for i in range(n // 2))
    mean_ring = sum(shifts) / n
    mr = jnp.abs(mean_ring - center) * (n // 2) * 0.5
    resp = jnp.maximum(dr - sr - mr, 0.0)

    # mask image borders (top/bottom via absolute row, sides via column)
    abs_rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (tile, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, W), 1)
    ok = (abs_rows >= pad) & (abs_rows < true_H - pad) & (cols >= pad) & (cols < W - pad)
    out_ref[0] = jnp.where(ok, resp, 0.0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret", "tile"))
def chess_corner_response_pallas(images, radius: float = 4.0, interpret: bool = False, tile: int = 80):
    """(B, H, W) float32 -> (B, H, W) X-corner response via row-tiled DMA."""
    images = images.astype(jnp.float32)
    B, H, W = images.shape
    offsets = [(float(o[1]), float(o[0])) for o in _ring_offsets(radius)]  # (dy, dx)
    pad = int(np.ceil(radius)) + 2
    halo = ((pad + 7) // 8) * 8  # sublane-tiled DMA slab height
    tile = min(tile, max(8, (H // 8) * 8))
    n_tiles = (H + tile - 1) // tile
    H_tiles = n_tiles * tile
    # edge-pad the top halo, zero-align the bottom (masked rows anyway)
    images = jnp.pad(images, ((0, 0), (halo, halo + H_tiles - H), (0, 0)), mode="edge")

    out = pl.pallas_call(
        functools.partial(
            _response_tile_kernel, offsets=offsets, pad=pad, halo=halo, tile=tile, H=H_tiles, W=W, true_H=H
        ),
        out_shape=jax.ShapeDtypeStruct((B, H_tiles, W), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tile, W), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(images)
    return out[:, :H, :]


def corner_response(images, radius: float = 4.0):
    """Backend dispatch: Pallas kernel on TPU, fused-jnp elsewhere."""
    from caliscope_tpu.detect.corners import chess_corner_response

    if jax.default_backend() == "tpu":
        return chess_corner_response_pallas(jnp.asarray(images), radius=radius)
    return chess_corner_response(jnp.asarray(images), radius)


# ---------------------------------------------------------------------------
# Batched window extraction (subpixel corner windows, marker atlas patches)
# ---------------------------------------------------------------------------

_WIN_LANES = 256  # DMA slab lanes: 128-aligned, >= 128 + window width


def _extract_windows_kernel(yi_ref, xi_ref, img_hbm, out_ref, scratch, sem, *, win: int, slab: int, n_slots: int):
    """Per frame (one grid step): DMA an aligned (slab, 256) slab around
    each seed HBM -> VMEM, rotate the 0-7 row / 0-127 lane residuals away with
    dynamic rolls, store the (win, win) window at its corner slot.

    Mosaic constraints that shaped this (found by bisection on a v5 chip):
    dynamic SUBLANE offsets — whether VMEM-ref slices or DMA source slices —
    crash the compiler unless 8-aligned, and dynamic lane slices always do;
    dynamic ROLLS on both axes and 128-aligned dynamic DMA lane offsets are
    fine. So the kernel DMAs from the aligned cell below each seed and
    rolls the residual into place. n_slots-deep DMA pipelining hides the
    per-window copy latency (2.2 ms/16-frame stack at K=256 vs 8.0 ms for
    XLA's per-corner dynamic_slice gathers)."""
    b = pl.program_id(0)
    K = out_ref.shape[1]

    def start(k, slot):
        y = yi_ref[0, 0, k]
        x = xi_ref[0, 0, k]
        ya = (y // 8) * 8
        xa = (x // 128) * 128
        pltpu.make_async_copy(
            img_hbm.at[b, pl.ds(ya, slab), pl.ds(xa, _WIN_LANES)],
            scratch.at[slot],
            sem.at[slot],
        ).start()

    # K is static (out_ref shape), so the warm-up depth can be clamped at
    # trace time: with fewer seeds than pipeline slots the extra prefetches
    # would read yi/xi out of bounds and start DMAs nobody waits on
    for i in range(min(n_slots - 1, K)):
        start(i, i)

    def body(k, c):
        slot = jax.lax.rem(k, n_slots)
        nxt = jax.lax.rem(k + n_slots - 1, n_slots)

        @pl.when(k + n_slots - 1 < K)
        def _():
            start(k + n_slots - 1, nxt)

        pltpu.make_async_copy(
            img_hbm.at[b, pl.ds(0, slab), pl.ds(0, _WIN_LANES)], scratch.at[slot], sem.at[slot]
        ).wait()
        y = yi_ref[0, 0, k]
        x = xi_ref[0, 0, k]
        dy = y - (y // 8) * 8
        dx = x - (x // 128) * 128
        rolled = pltpu.roll(scratch[slot], slab - dy, axis=0)
        rolled = pltpu.roll(rolled, _WIN_LANES - dx, axis=1)
        out_ref[0, pl.ds(k, 1)] = rolled[:win, :win][None]
        return c

    jax.lax.fori_loop(0, K, body, 0)


def extract_windows_pallas(frames, yi, xi, win: int, interpret: bool = False):
    """Gather one (win, win) window per seed from frames (any 4-byte
    element type). frames (B, Hp, Wp); yi/xi (B, K) int32 top-left corners
    already clipped to [0, Hp - win] x [0, Wp - win]. Returns (B, K, win, win)
    in the input dtype.

    Replaces per-candidate dynamic_slice gathers — small latency-bound HBM
    reads XLA issues serially (the subpixel corner windows and the marker
    atlas patches both hit this) — with pipelined aligned-slab DMAs (see
    _extract_windows_kernel)."""
    B, Hp, Wp = frames.shape
    K = yi.shape[1]
    slab = ((win + 7) // 8) * 8 + 8  # window rows + max 8-align skew
    assert win <= _WIN_LANES - 128, "lane slab must cover 128-align skew + window"
    # zero-pad so every aligned slab is in bounds; the extra area is rolled
    # out of the window before use, so its contents never matter
    Hp_al = ((Hp + 7 + (slab - win)) // 8) * 8
    Wp_al = ((Wp + 127 + (_WIN_LANES - win)) // 128) * 128
    img = jnp.pad(frames, ((0, 0), (0, Hp_al - Hp), (0, Wp_al - Wp)))
    n_slots = 4
    return pl.pallas_call(
        functools.partial(_extract_windows_kernel, win=win, slab=slab, n_slots=n_slots),
        out_shape=jax.ShapeDtypeStruct((B, K, win, win), frames.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, K, win, win), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, slab, _WIN_LANES), frames.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yi[:, None, :].astype(jnp.int32), xi[:, None, :].astype(jnp.int32), img)


def extract_corner_windows_pallas(padded, yi, xi, win: int, interpret: bool = False):
    """float32 alias kept for the subpixel stage (detect/corners.py)."""
    return extract_windows_pallas(padded.astype(jnp.float32), yi, xi, win, interpret=interpret)
