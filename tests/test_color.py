"""Color conversion parity vs the loop-level oracle (`libsrcnn.cpp:233-346`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from libsrcnn_tpu.ops import color
import oracle


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(0).integers(0, 256, (17, 23, 3), dtype=np.uint8)


def test_rgb_to_ycbcr_matches_oracle(img):
    got = np.asarray(color.rgb_to_ycbcr(jnp.asarray(img)))
    want = oracle.rgb_to_ycbcr(img)
    np.testing.assert_array_equal(got, want)


def test_rgba_alpha_passthrough():
    rgba = np.random.default_rng(1).integers(0, 256, (8, 9, 4), dtype=np.uint8)
    got = np.asarray(color.rgb_to_ycbcr(jnp.asarray(rgba)))
    assert got.shape == (4, 8, 9)
    np.testing.assert_array_equal(got[3], rgba[..., 3].astype(np.float32))


def test_ycbcr_roundtrip_matches_oracle(img):
    planes = oracle.rgb_to_ycbcr(img)
    got = np.asarray(color.ycbcr_to_rgb(jnp.asarray(planes)))
    want = oracle.ycbcr_to_rgb(planes)
    np.testing.assert_array_equal(got, want)


def test_trunc_u8_is_truncating_not_rounding():
    x = jnp.asarray([0.0, 0.49, 0.51, 1.99, 254.99, 255.0, 300.0, -5.0])
    got = np.asarray(color.trunc_u8(x))
    np.testing.assert_array_equal(got, [0, 0, 0, 1, 254, 255, 255, 0])


def test_roundtrip_quality():
    """RGB -> YCbCr -> RGB with the rational-approx inverse loses at most a
    few LSB (it is not exact by design, `libsrcnn.cpp:293-295`)."""
    img = np.random.default_rng(2).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    planes = color.rgb_to_ycbcr(jnp.asarray(img))
    back = np.asarray(color.ycbcr_to_rgb(planes))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 3


def test_exact_inverse_variant():
    """`ycbcr_to_rgb_exact` mirrors the reference's unused exact-coefficient
    converter (`libsrcnn.cpp:310-346`)."""
    planes = np.asarray([[[128.0]], [[100.0]], [[200.0]]], dtype=np.float32)
    got = np.asarray(color.ycbcr_to_rgb_exact(jnp.asarray(planes)))[0, 0]
    y, cb, cr = 128.0, 100.0, 200.0
    want = [np.floor(min(255.0, max(0.0, v))) for v in (
        y + 1.402 * cr, y - 0.34414 * cb - 0.71414 * cr, y + 1.772 * cb)]
    np.testing.assert_array_equal(got, np.asarray(want, np.uint8))
