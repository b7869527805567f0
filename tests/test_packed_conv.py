"""ops.packed_conv: lane-packed SAME conv vs the direct XLA conv."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from libsrcnn_tpu.ops import packed_conv


def _direct_same(x, w, precision=lax.Precision.HIGHEST):
    kh, kw = w.shape[0], w.shape[1]
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
                     (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xp, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32, precision=precision)


@pytest.mark.parametrize("kh,kw", [(3, 3), (5, 5), (1, 1), (3, 1)])
@pytest.mark.parametrize("wid,p", [(16, 4), (17, 4), (23, 5), (8, 2),
                                   (12, 12), (5, 8)])
def test_matches_direct_conv(kh, kw, wid, p):
    rng = np.random.default_rng(hash((kh, kw, wid, p)) % 2**31)
    x = jnp.asarray(rng.normal(size=(2, 9, wid, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kh, kw, 6, 5)).astype(np.float32))
    got = packed_conv.packed_conv_same(x, w, p, lax.Precision.HIGHEST)
    want = _direct_same(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-5)


def test_matches_on_image_scale_plane():
    """VDSR-shaped case: ch=32, p=4, real-valued plane, jitted."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (1, 40, 52, 32)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 32, 32)) / 17).astype(np.float32))
    f = jax.jit(lambda a: packed_conv.packed_conv_same(
        a, w, 4, lax.Precision.HIGHEST))
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(_direct_same(x, w)),
                               rtol=2e-6, atol=2e-3)


def test_pack_weights_layout():
    """wp[dy, t, c, j*? ...] -- phase j's tap dx lives at t = j + dx."""
    w = jnp.arange(3 * 3 * 2 * 4, dtype=jnp.float32).reshape(3, 3, 2, 4)
    p = 3
    wp = packed_conv.pack_weights(w, p)
    assert wp.shape == (3, p + 2, 2, p * 4)
    wp = np.asarray(wp).reshape(3, p + 2, 2, p, 4)
    for j in range(p):
        for t in range(p + 2):
            dx = t - j
            want = np.asarray(w)[:, dx] if 0 <= dx < 3 else 0.0
            np.testing.assert_array_equal(wp[:, t, :, j], want)


def test_best_phases():
    assert packed_conv.best_phases(3, 32) == 4       # N=128 exactly, 2.0x
    assert packed_conv.best_phases(3, 128) == 1      # already full lanes
    assert packed_conv.best_phases(3, 12) == 10      # N=120, 2.5x
    p64 = packed_conv.best_phases(3, 64)
    assert p64 == 2                                  # N=128, 1.5x
    # gain formula sanity: packing never claims a loss
    for cout in (1, 8, 32, 64, 100, 128, 200):
        p = packed_conv.best_phases(3, cout)
        assert p >= 1


@pytest.mark.parametrize("pads", [((0, 0), (0, 0)), ((2, 2), (2, 2)),
                                  ((1, 3), (3, 1)), ((4, 4), (4, 4))])
@pytest.mark.parametrize("p", [1, 3, 4, 7])
def test_explicit_zero_padding_matches(pads, p):
    """packed_conv with explicit zero pads == direct VALID conv on the
    padded plane (the FSRCNN sub-pixel deconv / ESPCN head shape)."""
    rng = np.random.default_rng(p * 31 + pads[0][0])
    x = jnp.asarray(rng.normal(size=(1, 11, 19, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 8, 4)).astype(np.float32))
    got = packed_conv.packed_conv(x, w, p, pads, lax.Precision.HIGHEST)
    want = lax.conv_general_dilated(
        x, w, (1, 1), list(pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-5)


def test_cfg_plumbing_matches_unpacked():
    """SRCNNConfig(lane_pack=True) reaches the family forwards through
    the pipeline: u8 outputs match the direct path (f32-rounding-level
    differences can move a u8 by 1 at ties)."""
    import libsrcnn_tpu as lt

    img = np.random.default_rng(9).integers(0, 256, (20, 18, 3), np.uint8)
    base = lt.upscale(img, 2.5, lt.SRCNNConfig(model="vdsr",
                                               lane_pack=False))
    packed = lt.upscale(img, 2.5, lt.SRCNNConfig(model="vdsr",
                                                 lane_pack=True))
    assert np.abs(base.astype(int) - packed.astype(int)).max() <= 1


def test_cfg_srcnn_ignores_lane_pack():
    """The srcnn family's golden gate pins its reduction order: lane_pack
    resolves to off regardless of the flag."""
    from libsrcnn_tpu import pipeline

    assert pipeline.resolve_lane_pack(True, "srcnn") is False
    assert pipeline.resolve_lane_pack(None, "srcnn") is False
    assert pipeline.resolve_lane_pack(True, "vdsr") is True
    assert pipeline.resolve_lane_pack(False, "vdsr") is False
    # None = auto: off on the CPU test backend
    assert pipeline.resolve_lane_pack(None, "vdsr") is False


def test_gspmd_spatial_packed_matches_single():
    """Packed convs under GSPMD spatial partitioning on the virtual mesh:
    the stride-p conv + reshape must survive W-axis sharding.  GSPMD's
    partitioned reduction order can flip u8 rounding ties (observed: one
    pixel in 9216), so the family-model contract here is <=1 LSB -- the
    bit-identity invariant belongs to the srcnn golden paths, where
    lane_pack never applies."""
    import jax
    import jax.numpy as jnp

    import libsrcnn_tpu as lt
    from libsrcnn_tpu import pipeline
    from libsrcnn_tpu.parallel import sharding
    from libsrcnn_tpu.parallel.mesh import make_mesh

    cfg = lt.SRCNNConfig(model="espcn", lane_pack=True)
    params = pipeline.load_model_params(cfg, 2.0)
    img = np.random.default_rng(10).integers(0, 256, (24, 32, 3), np.uint8)
    mesh = make_mesh({"data": 1, "row": 2, "col": 4})
    out, _ = sharding.upscale_spatial(jnp.asarray(img), params, 2.0, cfg,
                                      mesh)
    ref = lt.upscale(img, 2.0, cfg)
    assert np.abs(np.asarray(out).astype(int) - ref.astype(int)).max() <= 1


def test_batch_mesh_packed_bit_identical():
    """upscale_batch shards FRAMES (each device runs the whole pipeline
    locally), so packed convs stay bit-identical to single-device --
    unlike the GSPMD spatial case above."""
    import jax.numpy as jnp

    import libsrcnn_tpu as lt
    from libsrcnn_tpu import pipeline
    from libsrcnn_tpu.parallel import sharding
    from libsrcnn_tpu.parallel.mesh import make_mesh

    cfg = lt.SRCNNConfig(model="fsrcnn", lane_pack=True)
    params = pipeline.load_model_params(cfg, 2.0)
    imgs = np.random.default_rng(11).integers(0, 256, (4, 20, 24, 3),
                                              np.uint8)
    mesh = make_mesh({"data": 4, "row": 2, "col": 1})
    out, _ = sharding.upscale_batch(jnp.asarray(imgs), params, 2.0, cfg,
                                    mesh)
    ref = lt.upscale(imgs[2], 2.0, cfg)
    np.testing.assert_array_equal(np.asarray(out)[2], ref)
