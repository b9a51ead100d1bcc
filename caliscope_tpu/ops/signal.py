"""Butterworth low-pass design + zero-phase IIR filtering in JAX.

Replaces the reference's scipy.signal.butter/filtfilt usage
(reference src/caliscope/core/point_data.py:636-676). Coefficient design is
host-side closed-form math (tiny); the filter itself runs as a `lax.scan`
recurrence so trajectory smoothing can stay on device and batch over tracks.
Matches scipy.filtfilt's default odd-extension padding semantics.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def butter_lowpass(cutoff_hz: float, fs: float, order: int = 2):
    """Digital Butterworth low-pass (b, a) via bilinear transform.

    Equivalent to scipy.signal.butter(order, cutoff/(fs/2), 'low').
    """
    wn = cutoff_hz / (fs / 2.0)
    if not 0 < wn < 1:
        raise ValueError(f"Normalized cutoff {wn} must be in (0, 1)")
    # Analog prototype poles (Butterworth, unit cutoff), pre-warped
    k = np.arange(1, order + 1)
    poles = np.exp(1j * np.pi * (2 * k + order - 1) / (2 * order))
    warped = 4.0 * np.tan(np.pi * wn / 2.0)
    poles = poles * warped
    # Bilinear transform with fs = 2 (scipy convention): z = (4 + s)/(4 - s).
    z_poles = (4.0 + poles) / (4.0 - poles)
    a = np.real(np.poly(z_poles))
    # All-pole analog lowpass maps to `order` zeros at z = -1; the gain is
    # fixed by unity DC response (H(1) = 1), exact for a lowpass.
    b = np.real(np.poly(-np.ones(order)))
    b = b * (np.sum(a) / np.sum(b))
    return b.astype(np.float64), a.astype(np.float64)


def lfilter(b, a, x, zi=None):
    """Direct-form II transposed IIR filter along axis 0. x: (T,) or (T,D)."""
    b = jnp.asarray(b)
    a = jnp.asarray(a)
    x = jnp.asarray(x)
    b = b / a[0]
    a = a / a[0]
    n = max(b.shape[0], a.shape[0])
    b = jnp.pad(b, (0, n - b.shape[0]))
    a = jnp.pad(a, (0, n - a.shape[0]))
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    D = x.shape[1]
    if zi is None:
        zi = jnp.zeros((n - 1, D), x.dtype)

    def step(z, xt):
        yt = b[0] * xt + z[0]
        z_new = jnp.stack([b[i + 1] * xt + (z[i + 1] if i + 1 < n - 1 else 0.0) - a[i + 1] * yt for i in range(n - 1)])
        return z_new, yt

    _, y = jax.lax.scan(step, zi, x)
    return y[:, 0] if squeeze else y


def _lfilter_zi(b, a):
    """Steady-state initial conditions (scipy.signal.lfilter_zi equivalent)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64) / a[0]
    a = a / a[0]
    n = max(len(a), len(b))
    a = np.pad(a, (0, n - len(a)))
    b = np.pad(b, (0, n - len(b)))
    # companion(a).T: first column -a[1:], ones on the superdiagonal
    comp_t = np.zeros((n - 1, n - 1))
    comp_t[:, 0] = -a[1:]
    comp_t[: n - 2, 1:] = np.eye(n - 2)
    B = b[1:] - a[1:] * b[0]
    return np.linalg.solve(np.eye(n - 1) - comp_t, B)


def filtfilt(b, a, x, axis: int = 0):
    """Zero-phase filtering with odd-extension padding (scipy-compatible).

    x: (T,) or (T, D) filtered along axis 0 (axis arg present for API parity).
    """
    if axis != 0:
        x = jnp.moveaxis(jnp.asarray(x), axis, 0)
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    ntaps = max(len(np.atleast_1d(a)), len(np.atleast_1d(b)))
    padlen = 3 * ntaps
    if x.shape[0] <= padlen:
        raise ValueError(f"Input length {x.shape[0]} must exceed padlen {padlen}")
    # Odd extension at both ends
    front = 2 * x[0] - x[1 : padlen + 1][::-1]
    back = 2 * x[-1] - x[-padlen - 1 : -1][::-1]
    ext = jnp.concatenate([front, x, back], axis=0)
    zi = jnp.asarray(_lfilter_zi(b, a))[:, None]
    y = lfilter(b, a, ext, zi * ext[0])
    y = lfilter(b, a, y[::-1], zi * y[-1])[::-1]
    y = y[padlen:-padlen]
    if squeeze:
        y = y[:, 0]
    if axis != 0:
        y = jnp.moveaxis(y, 0, axis)
    return y
