"""Oracle tests: Butterworth design + filtfilt vs scipy.signal."""

import numpy as np
from scipy import signal as sps

from caliscope_tpu.ops import signal as our


def test_butter_coefficients_match_scipy():
    for order in [1, 2, 3, 4]:
        for cutoff, fs in [(6.0, 30.0), (2.0, 60.0), (10.0, 120.0)]:
            b_sp, a_sp = sps.butter(order, cutoff / (fs / 2), btype="low")
            b, a = our.butter_lowpass(cutoff, fs, order)
            np.testing.assert_allclose(b, b_sp, atol=1e-10)
            np.testing.assert_allclose(a, a_sp, atol=1e-10)


def test_lfilter_matches_scipy(rng):
    b, a = our.butter_lowpass(6.0, 30.0, 2)
    x = rng.normal(size=200)
    y_sp = sps.lfilter(b, a, x)
    y = np.asarray(our.lfilter(b, a, x))
    np.testing.assert_allclose(y, y_sp, atol=1e-10)


def test_filtfilt_matches_scipy(rng):
    b, a = our.butter_lowpass(6.0, 30.0, 2)
    x = np.cumsum(rng.normal(size=(150, 3)), axis=0)
    y_sp = sps.filtfilt(b, a, x, axis=0)
    y = np.asarray(our.filtfilt(b, a, x, axis=0))
    np.testing.assert_allclose(y, y_sp, atol=1e-8)
