"""Leading-axis shape bucketing for device calls fed data-dependent sizes.

Every eager jax call (and every jit entry) specializes on concrete shapes, so
a host loop that hands the device (N, ...) arrays with a different N each
dataset pays a fresh XLA trace+compile per call site per N. Padding N up to a
power-of-two bucket bounds the number of distinct programs per call site at
log2(N_max) while the masked/sliced filler rows cost only flops — orders of
magnitude cheaper than compiles on both the test CPU and the tunneled TPU.
"""

from __future__ import annotations

import numpy as np


def bucket_size(n: int, floor: int = 64, fine: bool = False) -> int:
    """Smallest bucket >= n, clamped below by `floor`.

    fine=False: powers of two (<=100% padding waste, 1 program per octave).
    fine=True: quarter-octave grid {2^k, 1.25*2^k, 1.5*2^k, 1.75*2^k} —
    64, 80, 96, 112, 128, 160, ... — capping padding waste at 25% for at
    most 4 programs per octave. Use it where the downstream cost is
    superlinear in the padded extent (the BA dense solver is cubic in
    3P+9C) or the extent is large enough that waste dominates compiles
    (the canonical 141k-observation problem)."""
    if n <= floor:
        return floor
    p = 1 << (int(n) - 1).bit_length()
    if fine:
        half = p >> 1  # 2^(k-1); n > half by construction
        for quarters in (5, 6, 7):  # 1.25x, 1.5x, 1.75x of 2^(k-1)
            step = (half * quarters) >> 2
            if n <= step:
                return step
    return p


def pad_rows(a: np.ndarray, nb: int, fill=0.0) -> np.ndarray:
    """Pad axis 0 of `a` out to `nb` rows with `fill` (host-side copy)."""
    a = np.asarray(a)
    if a.shape[0] == nb:
        return a
    out = np.full((nb,) + a.shape[1:], fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return out
