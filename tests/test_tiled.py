"""Gigapixel tiled full pipeline (resize + conv + merge under shard_map)."""

import numpy as np
import pytest

import jax

from libsrcnn_tpu import SRCNNConfig, FilterType, upscale
from libsrcnn_tpu.models import srcnn
from libsrcnn_tpu.parallel import upscale_tiled
from libsrcnn_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def params():
    return srcnn.load_params()


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(30).integers(0, 256, (64, 96, 3), np.uint8)


@pytest.mark.parametrize("ft", [FilterType.BICUBIC, FilterType.LANCZOS3,
                                FilterType.NEAREST, FilterType.BSPLINE])
def test_tiled_bitexact(params, img, ft):
    cfg = SRCNNConfig(filter=ft, use_pallas=False)
    ref, refc = upscale(img, 2.0, cfg, return_conv_map=True)
    mesh = make_mesh({"data": 1, "row": 4, "col": 2})
    out, conv = upscale_tiled(img, params, 2.0, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)
    np.testing.assert_array_equal(np.asarray(conv), refc)


def test_tiled_pallas_body(params, img):
    cfg = SRCNNConfig(use_pallas=True)
    ref = upscale(img, 2.0, cfg)
    mesh = make_mesh({"data": 1, "row": 2, "col": 4})
    out, _ = upscale_tiled(img, params, 2.0, cfg, mesh)
    d = np.abs(np.asarray(out).astype(int) - ref.astype(int))
    assert d.max() <= 1


def test_tiled_downscale(params, img):
    cfg = SRCNNConfig(use_pallas=False)
    ref = upscale(img, 0.5, cfg)
    mesh = make_mesh({"data": 1, "row": 4, "col": 2})
    out, _ = upscale_tiled(img, params, 0.5, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_tiled_rgba(params):
    rgba = np.random.default_rng(31).integers(0, 256, (32, 32, 4), np.uint8)
    cfg = SRCNNConfig(use_pallas=False)
    ref = upscale(rgba, 2.0, cfg)
    mesh = make_mesh({"data": 1, "row": 2, "col": 2}, jax.devices()[:4])
    out, _ = upscale_tiled(rgba, params, 2.0, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_tiled_validates_divisibility(params, img):
    mesh = make_mesh({"data": 1, "row": 8, "col": 1})
    with pytest.raises(ValueError):
        upscale_tiled(img[:60], params, 2.0, SRCNNConfig(), mesh)  # 60 % 8 != 0


def test_tiled_rejects_model_families():
    """upscale_tiled's staged halo plan is sized for the 9-1-5 stack;
    family configs must get a clear error pointing at the GSPMD paths,
    never a silent mis-run over mismatched params."""
    import jax
    import pytest

    from libsrcnn_tpu import SRCNNConfig
    from libsrcnn_tpu.parallel import upscale_tiled
    from libsrcnn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": 1, "row": 2, "col": 1}, jax.devices()[:2])
    img = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="upscale_spatial"):
        upscale_tiled(img, {}, 2.0, SRCNNConfig(model="vdsr"), mesh)


def test_tiled_rejects_step_scale_and_non_f32():
    import numpy as np
    import pytest

    from libsrcnn_tpu import SRCNNConfig
    from libsrcnn_tpu.models import srcnn
    from libsrcnn_tpu.parallel import upscale_tiled
    from libsrcnn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": 2, "row": 2, "col": 2})
    img = np.zeros((16, 16, 3), np.uint8)
    params = srcnn.load_params()
    with pytest.raises(ValueError, match="step_scale"):
        upscale_tiled(img, params, 4.0, SRCNNConfig(step_scale=True), mesh)
    # bf16 tiers need the Pallas body; the XLA body is exact-only
    with pytest.raises(ValueError, match="tiers"):
        upscale_tiled(img, params, 2.0,
                      SRCNNConfig(compute_dtype="bfloat16",
                                  use_pallas=False), mesh)
    with pytest.raises(ValueError, match="tiers"):
        upscale_tiled(img, params, 2.0,
                      SRCNNConfig(compute_dtype="int8", use_pallas=True),
                      mesh)


@pytest.mark.parametrize("dtype", ["bfloat16", "bfloat16_fast"])
def test_tiled_bf16_tiers_bitexact_vs_single_chip(params, img, dtype):
    """The throughput tiers partition like the exact tier: the tiled
    multi-device output must be bit-identical to the SAME tier's
    single-chip pipeline (per-pixel reduction order is grid-invariant)."""
    import jax

    from libsrcnn_tpu import SRCNNConfig
    from libsrcnn_tpu import pipeline
    from libsrcnn_tpu.parallel import upscale_tiled
    from libsrcnn_tpu.parallel.mesh import make_mesh

    cfg = SRCNNConfig(compute_dtype=dtype, use_pallas=True)
    single, sconv = pipeline.run_pass(jax.numpy.asarray(img), params,
                                      2.0, cfg)
    mesh = make_mesh({"data": 1, "row": 2, "col": 2}, jax.devices()[:4])
    tout, tconv = upscale_tiled(img, params, 2.0, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(tout), np.asarray(single))
    np.testing.assert_array_equal(np.asarray(tconv), np.asarray(sconv))
