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


def test_tiled_rejects_unknown_model_and_lr_scale_mismatch():
    from libsrcnn_tpu import pipeline as pl

    mesh = make_mesh({"data": 1, "row": 2, "col": 1}, jax.devices()[:2])
    img = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="unknown model"):
        upscale_tiled(img, {}, 2.0, SRCNNConfig(model="nope"), mesh)
    # LR families keep their exact-scale contract on the tiled path
    cfg = SRCNNConfig(model="fsrcnn", lane_pack=False)
    params = pl.load_model_params(cfg, 2.0)
    with pytest.raises(ValueError, match="exactly"):
        upscale_tiled(img, params, 2.5, cfg, mesh)


# --- LR-family tiling: exchanged LR halo + flag-gated padding fix-up ---


@pytest.mark.parametrize("model,scale,mesh_shape", [
    ("fsrcnn", 2.0, (2, 4)),
    ("fsrcnn", 2.0, (4, 2)),
    ("fsrcnn", 2.0, (1, 8)),
    ("espcn", 2.0, (2, 4)),
    ("espcn", 4.0, (2, 2)),   # data axis absorbs the spare devices
])
def test_tiled_lr_family_bitexact(img, model, scale, mesh_shape):
    """fsrcnn/espcn tile bit-identically to the api's direct forward:
    shards exchange lr_halo_width REAL LR pixels, true-edge shards
    re-impose the stack's padding on the out-of-image ring per layer
    (replicate for the conv_same layers, zeros before fsrcnn's deconv --
    its explicit conv padding is zeros), and each shard crops the halo's
    output rows/cols."""
    from libsrcnn_tpu import pipeline as pl

    r, c = mesh_shape
    mesh = make_mesh({"data": 8 // (r * c), "row": r, "col": c})
    cfg = SRCNNConfig(model=model, lane_pack=False)
    params = pl.load_model_params(cfg, scale)
    ref, refc = upscale(img, scale, cfg, return_conv_map=True)
    out, conv = upscale_tiled(img, params, scale, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)
    np.testing.assert_array_equal(np.asarray(conv), refc)


def test_tiled_lr_family_bf16_tier(img):
    from libsrcnn_tpu import pipeline as pl

    mesh = make_mesh({"data": 2, "row": 2, "col": 2})
    cfg = SRCNNConfig(model="espcn", lane_pack=False,
                      compute_dtype="bfloat16")
    params = pl.load_model_params(cfg, 2.0)
    ref = upscale(img, 2.0, cfg)
    out, _ = upscale_tiled(img, params, 2.0, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_tiled_lr_family_rejects_tile_smaller_than_halo():
    from libsrcnn_tpu import pipeline as pl

    mesh = make_mesh({"data": 1, "row": 8, "col": 1})
    img = np.zeros((32, 32, 3), np.uint8)   # 4 LR rows/shard < halo 8
    cfg = SRCNNConfig(model="fsrcnn", lane_pack=False)
    params = pl.load_model_params(cfg, 2.0)
    with pytest.raises(ValueError, match="halo"):
        upscale_tiled(img, params, 2.0, cfg, mesh)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_tiled_vdsr_bitexact(img, dtype):
    """HR-family tiling: the vdsr halo plan is DERIVED from the spec
    (depth SAME convs -> depth-px halo) and the per-layer replicate
    padding is re-imposed on true-edge shards only; the partitioned
    result must be bit-identical to the api (direct convs) per tier."""
    from libsrcnn_tpu import pipeline

    cfg = SRCNNConfig(model="vdsr", lane_pack=False, compute_dtype=dtype)
    params = pipeline.load_model_params(cfg, 2.0)
    ref, refc = upscale(img, 2.0, cfg, params=params, return_conv_map=True)
    mesh = make_mesh({"data": 1, "row": 2, "col": 2}, jax.devices()[:4])
    out, conv = upscale_tiled(img, params, 2.0, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)
    np.testing.assert_array_equal(np.asarray(conv), refc)


def test_tiled_vdsr_fractional_scale_and_row_mesh(img):
    """One checkpoint serves fractional factors on the tiled path too
    (the reference-shaped limitation the generalization removes)."""
    from libsrcnn_tpu import pipeline

    cfg = SRCNNConfig(model="vdsr", lane_pack=False)
    params = pipeline.load_model_params(cfg, 1.5)
    ref = upscale(img, 1.5, cfg, params=params)
    mesh = make_mesh({"data": 1, "row": 4, "col": 1}, jax.devices()[:4])
    out, _ = upscale_tiled(img, params, 1.5, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_tiled_vdsr_rejects_tile_smaller_than_halo():
    from libsrcnn_tpu import pipeline

    cfg = SRCNNConfig(model="vdsr", lane_pack=False)
    params = pipeline.load_model_params(cfg, 2.0)
    img = np.zeros((24, 24, 3), np.uint8)   # dst 48 -> 12-px tiles < 16
    mesh = make_mesh({"data": 1, "row": 4, "col": 2})
    with pytest.raises(ValueError, match="halo"):
        upscale_tiled(img, params, 2.0, cfg, mesh)


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
    with pytest.raises(ValueError, match="lane_pack"):
        # shards run the LR stacks unpacked (bit-identity contract)
        upscale_tiled(img, params, 2.0,
                      SRCNNConfig(model="fsrcnn", lane_pack=True), mesh)
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


@pytest.mark.parametrize("model", ["srcnn", "vdsr"])
def test_tiled_ensemble_matches_api(img, model):
    """self_ensemble over the tiled path: four flip-variant passes,
    unflip + u8 f32-mean exactly as the api-level ensemble -- bitwise
    equal wherever the plain tiled invariant holds."""
    from libsrcnn_tpu import pipeline

    cfg = SRCNNConfig(model=model, lane_pack=False, use_pallas=False,
                      self_ensemble=True)
    params = pipeline.load_model_params(cfg, 2.0)
    ref, refc = upscale(img, 2.0, cfg, params=params, return_conv_map=True)
    mesh = make_mesh({"data": 1, "row": 2, "col": 2}, jax.devices()[:4])
    out, conv = upscale_tiled(img, params, 2.0, cfg, mesh)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(conv, refc)
