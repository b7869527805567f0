"""Public API surface: error codes, compat shims, step-scale semantics."""

import numpy as np
import pytest

import libsrcnn_tpu as lt
from libsrcnn_tpu.ops.resize import scaled_size


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(6).integers(0, 256, (20, 24, 3), dtype=np.uint8)


def test_upscale_shapes(img):
    out = lt.upscale(img, 2.0)
    assert out.shape == (40, 48, 3) and out.dtype == np.uint8


def test_conv_map_output(img):
    out, conv = lt.upscale(img, 2.0, return_conv_map=True)
    assert conv.shape == (40, 48) and conv.dtype == np.uint8


def test_process_srcnn_error_codes(img):
    # `libsrcnn.cpp:951-966`
    assert lt.process_srcnn(None, 24, 20, 3, 2.0)[0] == -1
    assert lt.process_srcnn(img.tobytes(), 0, 20, 3, 2.0)[0] == -1
    assert lt.process_srcnn(img.tobytes(), 24, 20, 0, 2.0)[0] == -1
    assert lt.process_srcnn(img.tobytes(), 24, 20, 3, -2.0)[0] == -2


def test_process_srcnn_negative_geometry(img):
    # negative sizes are unrepresentable in the reference's `unsigned`
    # signature (`libsrcnn.h:48-50`); the shim reports bad args (-1)
    # instead of raising out of reshape -- even when w*h*d happens to
    # match the buffer length (e.g. two negatives cancelling).
    assert lt.process_srcnn(img.tobytes(), -24, 20, 3, 2.0)[0] == -1
    assert lt.process_srcnn(img.tobytes(), 24, -20, 3, 2.0)[0] == -1
    assert lt.process_srcnn(img.tobytes(), 24, 20, -3, 2.0)[0] == -1
    assert lt.process_srcnn(img.tobytes(), -24, -20, 3, -2.0)[0] == -1


def test_process_srcnn_success(img):
    rc, out, conv = lt.process_srcnn(img.tobytes(), 24, 20, 3, 2.0)
    assert rc == 0
    assert out.size == 48 * 40 * 3
    assert conv.size == 48 * 40
    # matches the functional API
    ref, refconv = lt.upscale(img, 2.0, return_conv_map=True)
    np.testing.assert_array_equal(out, ref.ravel())
    np.testing.assert_array_equal(conv, refconv.ravel())


def test_configure_shim_state(img):
    lt.configure_filter_srcnn(lt.FilterType.NEAREST)
    rc, out_nearest, _ = lt.process_srcnn(img.tobytes(), 24, 20, 3, 2.0)
    lt.configure_filter_srcnn(lt.FilterType.BICUBIC)
    rc, out_bicubic, _ = lt.process_srcnn(img.tobytes(), 24, 20, 3, 2.0)
    assert not np.array_equal(out_nearest, out_bicubic)


def test_step_scale_differs_from_direct(img):
    direct = lt.upscale(img, 4.0)
    stepped = lt.upscale(img, 4.0, lt.SRCNNConfig(step_scale=True))
    assert direct.shape == stepped.shape == (80, 96, 3)
    # u8 round-trip between passes quantizes: results legitimately differ
    assert not np.array_equal(direct, stepped)


def test_step_scale_2x_single_pass(img):
    # factor 2.0: step-scale runs exactly one x2 pass == direct
    direct = lt.upscale(img, 2.0)
    stepped = lt.upscale(img, 2.0, lt.SRCNNConfig(step_scale=True))
    np.testing.assert_array_equal(direct, stepped)


def test_bf16_mode_both_paths(img):
    """bf16 compute dtype must run on both the XLA and pallas paths and
    stay within a few LSB of the exact output."""
    exact = lt.upscale(img, 2.0)
    for pall in (False, True):
        fast = lt.upscale(img, 2.0, lt.SRCNNConfig(
            compute_dtype="bfloat16", use_pallas=pall))
        assert np.abs(exact.astype(int) - fast.astype(int)).max() <= 4


def test_gray_promotion(img):
    out = lt.upscale(img[..., 0], 2.0)
    assert out.shape == (40, 48, 3)


def test_invalid_inputs(img):
    with pytest.raises(TypeError):
        lt.upscale(img.astype(np.float32), 2.0)
    with pytest.raises(ValueError):
        lt.upscale(np.zeros((4, 4, 2), np.uint8), 2.0)
    with pytest.raises(ValueError):
        lt.upscale(img, 0.0)


def test_scaled_size_f32_semantics():
    assert scaled_size(256, 256, 2.0) == (512, 512)
    assert scaled_size(33, 47, 2.0) == (66, 94)
