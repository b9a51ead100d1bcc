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


def bucket_size(n: int, floor: int = 64) -> int:
    """Smallest power of two >= n, clamped below by `floor`."""
    if n <= floor:
        return floor
    return 1 << (int(n) - 1).bit_length()


def pad_rows(a: np.ndarray, nb: int, fill=0.0) -> np.ndarray:
    """Pad axis 0 of `a` out to `nb` rows with `fill` (host-side copy)."""
    a = np.asarray(a)
    if a.shape[0] == nb:
        return a
    out = np.full((nb,) + a.shape[1:], fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return out
