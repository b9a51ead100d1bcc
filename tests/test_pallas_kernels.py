"""Pallas kernel equivalence tests (interpreter mode on CPU; the same kernel
compiles for TPU backends — see detect/pallas_kernels.py dispatch)."""

import numpy as np
import pytest

from caliscope_tpu.detect.corners import chess_corner_response
from caliscope_tpu.detect.pallas_kernels import chess_corner_response_pallas


class TestCornerResponseKernel:
    def test_matches_reference_implementation(self, rng):
        imgs = rng.uniform(0, 255, size=(2, 96, 128)).astype(np.float32)
        ref = np.asarray(chess_corner_response(imgs))
        ker = np.asarray(chess_corner_response_pallas(imgs, interpret=True))
        pad = 6
        np.testing.assert_allclose(
            ker[:, pad:-pad, pad:-pad], ref[:, pad:-pad, pad:-pad], rtol=1e-4, atol=1e-3
        )

    def test_detects_rendered_corner(self):
        cv2 = pytest.importorskip("cv2")
        img = np.zeros((64, 64), np.float32)
        img[:32, :32] = 255
        img[32:, 32:] = 255
        img = cv2.GaussianBlur(img, (5, 5), 1.0)
        resp = np.asarray(chess_corner_response_pallas(img[None], interpret=True))[0]
        peak = np.unravel_index(np.argmax(resp), resp.shape)
        assert abs(peak[0] - 32) <= 1 and abs(peak[1] - 32) <= 1
