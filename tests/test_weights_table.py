"""Contribution-table parity with `FRawScaleWeightsTable` (`frawscale.cpp:8-112`)."""

import numpy as np
import pytest

from libsrcnn_tpu.config import FilterType
from libsrcnn_tpu.ops.weights_table import contribution_table, dense_matrix


@pytest.mark.parametrize("ft", list(FilterType))
@pytest.mark.parametrize("src,dst", [(64, 128), (64, 96), (64, 32), (33, 66), (5, 10), (1, 2)])
def test_rows_normalized(ft, src, dst):
    m = dense_matrix(ft, dst, src)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-12)


def test_upscale_window_size():
    left, w = contribution_table(FilterType.BICUBIC, 128, 64)
    assert w.shape[1] == 2 * 2 + 1  # 2*ceil(2)+1


def test_downscale_widens_support():
    # `frawscale.cpp:25-29`: scale < 1 widens width by 1/scale
    left, w = contribution_table(FilterType.BICUBIC, 32, 64)
    assert w.shape[1] == 2 * 4 + 1


def test_center_offset_formula():
    # x2 upscale with bilinear: output 2u maps to center u - 0.25
    left, w = contribution_table(FilterType.BILINEAR, 8, 4)
    # u=2 -> center = 2/2 + (0.5/2 - 0.5) = 0.75; taps floor(-0.25)..ceil(1.75)
    c = 0.75
    lo = int(left[2])
    taps = np.arange(lo, lo + w.shape[1])
    expect = np.maximum(0.0, 1.0 - np.abs(c - taps))
    expect = np.where(taps <= 3, expect, 0.0)
    expect = expect / expect.sum()
    np.testing.assert_allclose(w[2][: len(expect)], expect, atol=1e-12)


def test_boundary_clamp():
    left, w = contribution_table(FilterType.LANCZOS3, 16, 8)
    assert left.min() >= 0
    # weights past src-1 are zero
    for u in range(16):
        for k in range(w.shape[1]):
            if left[u] + k > 7:
                assert w[u, k] == 0.0


def test_identity_scale_bilinear_is_identity():
    # For an interpolating filter (bilinear), the scale-1 table is exactly
    # the identity.  (Mitchell bicubic b=c=1/3 is a smoothing filter and is
    # NOT interpolating, so no such claim holds there.)
    m = dense_matrix(FilterType.BILINEAR, 16, 16)
    np.testing.assert_allclose(m, np.eye(16), atol=1e-12)
