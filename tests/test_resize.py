"""Device resampler parity vs the double-precision oracle resize."""

import numpy as np
import pytest

import jax.numpy as jnp

from libsrcnn_tpu.config import FilterType
from libsrcnn_tpu.ops.resize import resize_plane, resize_plane_padded, scaled_size
import oracle


@pytest.fixture(scope="module")
def plane():
    return np.random.default_rng(3).uniform(0, 255, (37, 29)).astype(np.float32)


@pytest.mark.parametrize("ft", list(FilterType))
@pytest.mark.parametrize("mult", [2.0, 1.5, 3.0, 0.5])
def test_matches_oracle(plane, ft, mult):
    dst_w, dst_h = scaled_size(plane.shape[1], plane.shape[0], mult)
    got = np.asarray(resize_plane(jnp.asarray(plane), dst_h, dst_w, ft))
    want = oracle.resize_plane(plane, dst_h, dst_w, ft)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_same_size_is_exact_copy(plane):
    got = np.asarray(resize_plane(jnp.asarray(plane), *plane.shape, FilterType.BICUBIC))
    np.testing.assert_array_equal(got, plane)


def test_asymmetric_resize(plane):
    # width up, height up, non-square: exercises the pass-ordering branch
    got = np.asarray(resize_plane(jnp.asarray(plane), 74, 59, FilterType.BICUBIC))
    want = oracle.resize_plane(plane, 74, 59, FilterType.BICUBIC)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_scaled_size_truncates_like_f32():
    # 30 * 1.37 = 41.1 in f32 -> 41 ; reference `libsrcnn.cpp:662-663`
    assert scaled_size(30, 40, 1.37) == (41, 54)
    assert scaled_size(256, 256, 1.5) == (384, 384)
    # f32-vs-f64 divergence case: 1000 * 1.3 is 1300.0000305 in f32
    assert scaled_size(1000, 1000, 1.3) == (1300, 1300)


def test_constant_plane_preserved():
    p = jnp.full((16, 16), 127.0, jnp.float32)
    out = np.asarray(resize_plane(p, 32, 32, FilterType.LANCZOS3))
    np.testing.assert_allclose(out, 127.0, atol=1e-4)


@pytest.mark.parametrize("ft", [FilterType.BICUBIC, FilterType.NEAREST,
                                FilterType.LANCZOS3])
@pytest.mark.parametrize("mult", [2.0, 0.5, 1.0])
def test_padded_resize_is_edge_pad_of_plain(plane, ft, mult):
    """resize_plane_padded must be bit-identical to jnp.pad(resize_plane,
    mode="edge") -- it feeds the fused kernel's zero-padding-pass path, so
    any deviation breaks the golden gate."""
    dst_w, dst_h = scaled_size(plane.shape[1], plane.shape[0], mult)
    pad = 6
    out_h, out_w = dst_h + 17, dst_w + 23  # asymmetric alignment junk
    got = np.asarray(resize_plane_padded(
        jnp.asarray(plane), dst_h, dst_w, ft, pad, out_h, out_w))
    base = np.asarray(resize_plane(jnp.asarray(plane), dst_h, dst_w, ft))
    want = np.pad(base, ((pad, out_h - pad - dst_h),
                         (pad, out_w - pad - dst_w)), mode="edge")
    np.testing.assert_array_equal(got, want)
