"""Fused Pallas kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from libsrcnn_tpu.models import srcnn
from libsrcnn_tpu.kernels import fused_conv
from libsrcnn_tpu.pipeline import resolve_pallas


@pytest.fixture(scope="module")
def params():
    return srcnn.load_params()


@pytest.mark.parametrize("shape", [(96, 124), (100, 140), (48, 48), (130, 250)])
def test_fused_matches_xla(params, shape):
    y = np.random.default_rng(13).uniform(0, 255, shape).astype(np.float32)
    ref = np.asarray(srcnn.forward_y(params, jnp.asarray(y)))
    got = np.asarray(fused_conv.forward_y(params, jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_fused_border_semantics(params):
    """The 2-px output border must reproduce the reference's
    conv2-output-replicate padding exactly (not a wider conv ring)."""
    y = np.random.default_rng(14).uniform(0, 255, (64, 64)).astype(np.float32)
    ref = np.asarray(srcnn.forward_y(params, jnp.asarray(y)))
    got = np.asarray(fused_conv.forward_y(params, jnp.asarray(y)))
    for sl in [np.s_[:2, :], np.s_[-2:, :], np.s_[:, :2], np.s_[:, -2:]]:
        np.testing.assert_allclose(got[sl], ref[sl], atol=2e-3)


def test_fused_batched(params):
    ys = np.random.default_rng(15).uniform(0, 255, (2, 48, 62)).astype(np.float32)
    got = np.asarray(fused_conv.forward_y(params, jnp.asarray(ys)))
    assert got.shape == (2, 48, 62)
    one = np.asarray(fused_conv.forward_y(params, jnp.asarray(ys[1])))
    np.testing.assert_allclose(got[1], one, atol=1e-5)


def test_fused_output_range(params):
    y = np.random.default_rng(16).uniform(-50, 400, (48, 62)).astype(np.float32)
    out = np.asarray(fused_conv.forward_y(params, jnp.asarray(y)))
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_bf16_modes_accuracy_ladder(params):
    """The three precision modes form an accuracy ladder vs the XLA-exact
    output: exact < split-bf16x2 < bf16x1, each within its documented
    envelope (PERF.md), and the two bf16 modes share the taller default
    tile height."""
    import jax

    y = np.random.default_rng(18).uniform(0, 255, (100, 150)).astype(np.float32)
    ref = np.asarray(srcnn.forward_y(params, jnp.asarray(y)))
    exact = np.asarray(fused_conv.forward_y(
        params, jnp.asarray(y), precision=jax.lax.Precision.HIGHEST))
    split = np.asarray(fused_conv.forward_y(
        params, jnp.asarray(y), precision=jax.lax.Precision.DEFAULT))
    x1 = np.asarray(fused_conv.forward_y(
        params, jnp.asarray(y), precision=fused_conv.BF16X1))
    d_exact = np.abs(exact - ref).max()
    d_split = np.abs(split - ref).max()
    d_x1 = np.abs(x1 - ref).max()
    assert d_exact <= 2e-3
    assert d_split <= 4.0       # weight bf16 rounding only
    assert d_x1 <= 8.0          # + activation bf16 rounding
    assert d_exact < d_split < d_x1
    assert fused_conv.tile_h_for(jax.lax.Precision.HIGHEST) == 40
    assert fused_conv.tile_h_for(jax.lax.Precision.DEFAULT) == \
        fused_conv.BF16_TH
    # the packed-im2col default frees VMEM for the taller bf16x1 tile
    assert fused_conv.tile_h_for(fused_conv.BF16X1) == fused_conv.BF16X1_TH


def test_resolve_pallas_auto():
    # CPU backend in tests -> auto resolves to XLA
    assert resolve_pallas(None) is False
    assert resolve_pallas(True) is True
    assert resolve_pallas(False) is False


def test_pipeline_pallas_path_matches(params):
    """End-to-end pipeline with use_pallas=True (interpret) vs XLA path."""
    from libsrcnn_tpu import upscale, SRCNNConfig

    img = np.random.default_rng(17).integers(0, 256, (20, 24, 3), np.uint8)
    a = upscale(img, 2.0, SRCNNConfig(use_pallas=False))
    b = upscale(img, 2.0, SRCNNConfig(use_pallas=True))
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 1


def test_packed_im2col_matches_unpacked(params):
    """The i32-packed bf16 tap-pair im2col (the bf16x1 default) feeds the
    GEMM the SAME bf16 operands as the unpacked formulation: the pack
    rounds with the RTNE integer identity (== XLA's f32->bf16 convert,
    verified bit-level in isolation).  The conv1 contraction length grows
    81 -> 82 (one zero row pads the odd tap count), which may regroup the
    f32 accumulation on some backends -- so equality is to f32
    accumulation-order tolerance (~1 ulp of the [0,255]-domain outputs),
    NOT bitwise.  Within one configuration the kernel is deterministic,
    which is what the multi-path bit-identity tests rely on."""
    import jax.numpy as jnp
    import numpy as np

    from libsrcnn_tpu.kernels import fused_conv

    y = np.random.default_rng(9).uniform(0, 255, (70, 150)).astype(np.float32)
    a = fused_conv.forward_y(params, jnp.asarray(y),
                             precision=fused_conv.BF16X1,
                             tile_h=24, pack_im2col=False)
    b = fused_conv.forward_y(params, jnp.asarray(y),
                             precision=fused_conv.BF16X1,
                             tile_h=24, pack_im2col=True)
    assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) <= 0.01


def test_packed_im2col_rejected_off_tier(params):
    import jax.numpy as jnp
    import pytest

    from libsrcnn_tpu.kernels import fused_conv

    y = jnp.zeros((32, 32), jnp.float32)
    # the exact tier needs the f32 scratch (bf16 taps would break the
    # ≤1-LSB gate); bf16x1 and split have packed formulations
    with pytest.raises(ValueError, match="f32 scratch"):
        fused_conv.forward_y(params, y, pack_im2col=True)


def test_split_hilo_pack_matches_two_pass(params):
    """The hi/lo-packed split im2col feeds conv1 the same hi+lo bf16
    decomposition as the two-pass _dot; only the f32 accumulation order
    differs (one interleaved 162-row contraction vs two 81-row passes),
    so equality is to accumulation-order tolerance, not bitwise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from libsrcnn_tpu.kernels import fused_conv

    y = np.random.default_rng(9).uniform(0, 255, (70, 150)).astype(np.float32)
    a = fused_conv.forward_y(params, jnp.asarray(y),
                             precision=jax.lax.Precision.DEFAULT,
                             tile_h=24, pack_im2col=False)
    b = fused_conv.forward_y(params, jnp.asarray(y),
                             precision=jax.lax.Precision.DEFAULT,
                             tile_h=24, pack_im2col=True)
    assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) <= 0.01


def test_row_band_matches_column_tile(params):
    """The row-band bf16x1 kernel (grid over row bands, all column tiles
    computed from one window read) is BIT-identical to the shipped
    column-tile pair-packed kernel: same RNE tap rounding, same GEMM
    passes, same border clamp -- only the launch geometry differs.  Both
    inner-loop strategies (static unroll / fori+roll) must agree."""
    import jax.numpy as jnp
    import numpy as np

    from libsrcnn_tpu.kernels import fused_conv

    y = np.random.default_rng(3).uniform(0, 255, (70, 260)).astype(np.float32)
    ref = fused_conv.forward_y(params, jnp.asarray(y),
                               precision=fused_conv.BF16X1,
                               tile_h=16, pack_im2col=True)
    for impl in ("unroll", "fori"):
        out = fused_conv.forward_y_band(params, jnp.asarray(y), tile_h=16,
                                        band_impl=impl)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_narrow_geometry_bit_identical(params):
    """The NARROW launch geometry (tw=120, 256-lane windows) partitions
    the grid differently but computes every output column with identical
    arithmetic -- bitwise equal to WIDE on the packed bf16x1 tier."""
    import jax.numpy as jnp
    import numpy as np

    from libsrcnn_tpu.kernels import fused_conv

    y = np.random.default_rng(5).uniform(0, 255, (90, 300)).astype(np.float32)
    a = fused_conv.forward_y(params, jnp.asarray(y),
                             precision=fused_conv.BF16X1, pack_im2col=True,
                             tile_h=16, geom=fused_conv.WIDE)
    b = fused_conv.forward_y(params, jnp.asarray(y),
                             precision=fused_conv.BF16X1, pack_im2col=True,
                             tile_h=16, geom=fused_conv.NARROW)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
