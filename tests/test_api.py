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


def test_bf16_fast_mode_both_paths(img):
    """bfloat16_fast (single-pass GEMMs) must run on both paths and stay
    within a few LSB of the exact output (adds the activations' bf16
    rounding on top of the split tier's weight rounding)."""
    exact = lt.upscale(img, 2.0)
    for pall in (False, True):
        fast = lt.upscale(img, 2.0, lt.SRCNNConfig(
            compute_dtype="bfloat16_fast", use_pallas=pall))
        assert np.abs(exact.astype(int) - fast.astype(int)).max() <= 8


def test_unknown_compute_dtype_rejected(img):
    # both compute branches, and BEFORE any weights load: an arbitrary
    # dtype string must not quietly run a nonstandard tier
    for dt in ("int4", "float16", "float64"):
        for pall in (True, False):
            with pytest.raises(ValueError, match="tier"):
                lt.upscale(img, 2.0, lt.SRCNNConfig(compute_dtype=dt,
                                                    use_pallas=pall))


def test_debug_intermediates_all_tiers(img):
    """The dumper mirrors the reference's f32 DEBUG path for every tier
    (regression: bf16 param storage used to crash the XLA convs with a
    mixed-dtype TypeError)."""
    from libsrcnn_tpu.api import debug_intermediates

    for dt in ("float32", "bfloat16", "bfloat16_fast", "int8"):
        planes = debug_intermediates(
            img, 2.0, lt.SRCNNConfig(compute_dtype=dt))
        assert planes["conv3"].shape == (40, 48)
        assert len([k for k in planes if k.startswith("conv1_")]) == 64


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


def test_process_srcnn_empty_output_is_bad_scale(img):
    """0 < w*multiply < 1 must return -2, not raise out of the retcode
    contract (the reference fails inside doSRCNN's resize alloc)."""
    assert lt.process_srcnn(img.tobytes(), 24, 20, 3, 0.01)[0] == -2


def test_process_srcnn_rejects_non_u8_ndarray(img):
    """An unsafe cast would silently value-wrap 300 -> 44."""
    bad = np.full((20, 24, 3), 300, np.int32)
    assert lt.process_srcnn(bad, 24, 20, 3, 2.0)[0] == -1


def test_process_srcnn_step_scale_identity_is_minus_100(img):
    """Reference parity: a step-scale chain whose single pass breaks at
    curmf == 1 returns -100 with NULL buffers (`libsrcnn.cpp:1004-1008`)."""
    lt.configure_filter_srcnn(2, True)
    try:
        rc, out, conv = lt.process_srcnn(img.tobytes(), 24, 20, 3, 1.0)
        assert (rc, out, conv) == (-100, None, None)
    finally:
        lt.configure_filter_srcnn(2, False)


def test_step_scale_identity_chain_runs_zero_passes(img):
    """m=1.0 with step_scale: the single chain pass breaks at curmf == 1
    (`libsrcnn.cpp:1004-1008`) -- the only REACHABLE break (a mid-chain
    break would need f32(w*m) == w*2^k with fmod(m,2) > 0, impossible
    since sw doubles exactly).  upscale() stays Pythonic: input copy,
    no conv map; the retcode shim maps it to the reference's -100."""
    arr = np.frombuffer(img.tobytes(), np.uint8).reshape(20, 24, 3)
    out, conv = lt.upscale(arr, 1.0, lt.SRCNNConfig(step_scale=True),
                           return_conv_map=True)
    np.testing.assert_array_equal(out, arr)
    assert conv is None


def test_process_srcnn_alloc_failure_is_minus_11(img, monkeypatch):
    """Reference parity: output-buffer allocation failure returns -11
    (`libsrcnn.cpp:883`).  Device OOM (RESOURCE_EXHAUSTED) maps the same
    way -- it is the XLA arena's analog of the failed `new[]`."""
    import jax

    from libsrcnn_tpu import api

    def oom(*a, **k):
        raise MemoryError("host allocation failed")

    monkeypatch.setattr(api, "upscale", oom)
    assert lt.process_srcnn(img.tobytes(), 24, 20, 3, 2.0) == (-11, None, None)

    def xla_oom(*a, **k):
        raise jax.errors.JaxRuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory allocating 1099511627776 bytes")

    monkeypatch.setattr(api, "upscale", xla_oom)
    assert lt.process_srcnn(img.tobytes(), 24, 20, 3, 2.0) == (-11, None, None)


def test_process_srcnn_conv_alloc_failure_is_minus_12(img, monkeypatch):
    """Reference parity: conv-map buffer allocation failure returns -12
    while KEEPING the already-copied output buffer (`libsrcnn.cpp:895-912`)."""
    from libsrcnn_tpu import api

    real_out = lt.upscale(
        np.frombuffer(img.tobytes(), np.uint8).reshape(20, 24, 3), 2.0)

    class FailingConv:
        def ravel(self):
            raise MemoryError("conv buffer allocation failed")

    monkeypatch.setattr(api, "upscale", lambda *a, **k: (real_out, FailingConv()))
    rc, out, conv = lt.process_srcnn(img.tobytes(), 24, 20, 3, 2.0)
    assert rc == -12 and conv is None
    np.testing.assert_array_equal(out, real_out.ravel())


def test_process_srcnn_non_oom_runtime_error_propagates(img, monkeypatch):
    """Only allocation failures map to retcodes; other XLA runtime errors
    stay Python exceptions (no reference analog to map them to)."""
    import jax

    from libsrcnn_tpu import api

    def boom(*a, **k):
        raise jax.errors.JaxRuntimeError("INTERNAL: something unrelated")

    monkeypatch.setattr(api, "upscale", boom)
    with pytest.raises(jax.errors.JaxRuntimeError):
        lt.process_srcnn(img.tobytes(), 24, 20, 3, 2.0)
