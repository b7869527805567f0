"""Out-of-core chunked pipeline: bit-identity to the single-pass API
per compute tier, across band sizes / filters / scales / bodies."""

import numpy as np
import pytest

from libsrcnn_tpu import FilterType, SRCNNConfig, upscale, upscale_chunked
from libsrcnn_tpu import chunked


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(44).integers(0, 256, (45, 38, 3), np.uint8)


@pytest.mark.parametrize("pall", [False, True])
@pytest.mark.parametrize("scale,ft,band", [
    (2.0, FilterType.BICUBIC, 16),
    (3.0, FilterType.LANCZOS3, 7),
    (1.5, FilterType.NEAREST, 45),   # one band covering everything
    (0.5, FilterType.BICUBIC, 5),    # downscale: horizontal-first ordering
    (2.3, FilterType.BSPLINE, 64),   # fractional scale, ragged last band
])
def test_chunked_bitexact(img, pall, scale, ft, band):
    cfg = SRCNNConfig(filter=ft, use_pallas=pall)
    ref, refc = upscale(img, scale, cfg, return_conv_map=True)
    out, conv = upscale_chunked(img, scale, cfg, band_rows=band)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(conv, refc)


def test_chunked_rgba_and_tiny_bands(img):
    img4 = np.random.default_rng(45).integers(0, 256, (33, 29, 4), np.uint8)
    ref = upscale(img4, 2.0)
    out, _ = upscale_chunked(img4, 2.0, band_rows=1)  # one-row bands
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("band", [1, 5, 13])
def test_chunked_ring_never_crosses_unflagged_edges(img, band):
    """Regression: a band cut at row 1 or dst_h-1 puts the conv2-output
    ring past the true image edge with the edge flag off (66 % 5 == 1
    used to produce a 1-row tail band ending exactly there)."""
    img4 = np.random.default_rng(46).integers(0, 256, (33, 29, 4), np.uint8)
    ref, refc = upscale(img4, 2.0, return_conv_map=True)   # dst_h = 66
    out, conv = upscale_chunked(img4, 2.0, band_rows=band)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(conv, refc)


@pytest.mark.parametrize("dtype", ["bfloat16", "bfloat16_fast"])
def test_chunked_bf16_tiers_bitexact(img, dtype):
    """The throughput tiers band exactly like the exact tier (reduction
    order is band-invariant)."""
    cfg = SRCNNConfig(compute_dtype=dtype, use_pallas=True)
    ref, refc = upscale(img, 2.0, cfg, return_conv_map=True)
    out, conv = upscale_chunked(img, 2.0, cfg, band_rows=13)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(conv, refc)


def test_chunked_shares_one_program_across_interior_bands(img):
    """Interior bands must share ONE compiled program (vertical tables are
    runtime arguments): a gigapixel stream cannot afford per-band
    compiles."""
    chunked._compiled_band.cache_clear()
    out, _ = upscale_chunked(img, 4.0, SRCNNConfig(use_pallas=False),
                             band_rows=32)  # 180 rows -> 5 full + 1 ragged
    assert out.shape == (180, 152, 3)
    info = chunked._compiled_band.cache_info()
    assert info.currsize == 2, info  # interior shape + ragged last shape


@pytest.mark.parametrize("depth", [1, 4])
def test_chunked_inflight_window_invariant(img, depth):
    """The async dispatch window is a perf knob only — outputs and
    ordering are invariant across depths."""
    ref, refc = upscale(img, 2.0, return_conv_map=True)
    out, conv = upscale_chunked(img, 2.0, band_rows=11,
                                inflight_bands=depth)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(conv, refc)


def test_chunked_validates():
    img = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="exactly"):
        # LR families keep their exact-scale contract on the chunked path
        upscale_chunked(img, 2.5, SRCNNConfig(model="fsrcnn"))
    with pytest.raises(ValueError, match="unknown model"):
        upscale_chunked(img, 2.0, SRCNNConfig(model="nope"))
    with pytest.raises(ValueError, match="step_scale"):
        upscale_chunked(img, 4.0, SRCNNConfig(step_scale=True))
    with pytest.raises(ValueError, match="lane_pack"):
        # bands run the LR stacks unpacked; an explicit True would
        # silently change the reduction partitioning mid-path
        upscale_chunked(img, 2.0, SRCNNConfig(model="espcn",
                                              lane_pack=True))
    with pytest.raises(ValueError, match="tiers"):
        upscale_chunked(img, 2.0, SRCNNConfig(compute_dtype="bfloat16",
                                              use_pallas=False))
    with pytest.raises(ValueError):   # family tiers are f32/bf16 only
        upscale_chunked(img, 2.0, SRCNNConfig(model="vdsr",
                                              compute_dtype="int8"))
    with pytest.raises(ValueError, match="band_rows"):
        upscale_chunked(img, 2.0, band_rows=0)
    with pytest.raises(ValueError, match="inflight_bands"):
        upscale_chunked(img, 2.0, inflight_bands=0)
    with pytest.raises(ValueError, match="scale"):
        upscale_chunked(img, 0.01)


# --- HR-family (vdsr) banding: halo plan derived from the spec ---------


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("scale,band", [
    (2.0, 20),
    (1.7, 9),     # fractional scale (no LR family serves this)
    (0.5, 33),    # downscale: horizontal-first ordering
])
def test_chunked_vdsr_bitexact(img, dtype, scale, band):
    """vdsr bands bit-identically to the api's direct-conv forward: the
    depth-px halo carries real neighbor rows, true edges re-impose the
    per-layer replicate padding (models/vdsr.forward_hr_halo)."""
    cfg = SRCNNConfig(model="vdsr", lane_pack=False, compute_dtype=dtype)
    ref, refc = upscale(img, scale, cfg, return_conv_map=True)
    out, conv = upscale_chunked(img, scale, cfg, band_rows=band)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(conv, refc)


def test_chunked_vdsr_merges_cuts_inside_halo(img):
    """band_rows smaller than the model halo: every cut closer than
    halo px to a true edge must be dropped (a band whose halo crosses
    the image edge unflagged would see replicated-input rows where the
    model's per-layer padding differs)."""
    cfg = SRCNNConfig(model="vdsr", lane_pack=False)
    ref = upscale(img, 2.0, cfg)
    out, _ = upscale_chunked(img, 2.0, cfg, band_rows=5)  # halo = 16 > 5
    np.testing.assert_array_equal(out, ref)


# --- LR-family banding: crop-after-halo-extend on whole LR rows --------


@pytest.mark.parametrize("model,scale,band", [
    ("fsrcnn", 2.0, 24),
    ("fsrcnn", 2.0, 4),     # bands thinner than the 8-LR-row halo
    ("fsrcnn", 3.0, 27),
    ("espcn", 2.0, 16),
    ("espcn", 2.0, 2),      # 1-LR-row bands
    ("espcn", 4.0, 32),
])
def test_chunked_lr_family_bitexact(img, model, scale, band):
    """fsrcnn/espcn band bit-identically to the api's direct forward:
    bands are cut on whole LR rows, extended by lr_halo_width REAL
    neighbor rows (clamped at true edges, where the slice border IS the
    image border and the stack's own replicate padding applies), and the halo
    output rows are cropped."""
    cfg = SRCNNConfig(model=model, lane_pack=False)
    ref, refc = upscale(img, scale, cfg, return_conv_map=True)
    out, conv = upscale_chunked(img, scale, cfg, band_rows=band)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(conv, refc)


def test_chunked_lr_family_bf16_tier(img):
    cfg = SRCNNConfig(model="espcn", lane_pack=False,
                      compute_dtype="bfloat16")
    ref = upscale(img, 2.0, cfg)
    out, _ = upscale_chunked(img, 2.0, cfg, band_rows=20)
    np.testing.assert_array_equal(out, ref)


def test_chunked_lr_family_rounds_band_to_lr_rows(img):
    """band_rows not divisible by the scale is rounded down to whole LR
    rows (each LR row emits exactly `scale` output rows)."""
    cfg = SRCNNConfig(model="fsrcnn", lane_pack=False)
    ref = upscale(img, 2.0, cfg)
    out, _ = upscale_chunked(img, 2.0, cfg, band_rows=7)
    np.testing.assert_array_equal(out, ref)


def test_chunked_lr_family_shares_interior_program(img):
    """Interior LR-family bands share ONE compiled program; the
    clamped-halo first/last bands add at most one each."""
    chunked._compiled_band_lr.cache_clear()
    cfg = SRCNNConfig(model="espcn", lane_pack=False)
    out, _ = upscale_chunked(img, 2.0, cfg, band_rows=10)
    assert out.shape == (90, 76, 3)
    info = chunked._compiled_band_lr.cache_info()
    assert info.currsize <= 3, info


# --- band-wise flip self-ensemble --------------------------------------


@pytest.mark.parametrize("model", ["srcnn", "vdsr", "fsrcnn"])
def test_chunked_ensemble_matches_api(img, model):
    """self_ensemble=True on the chunked path must equal the api-level
    ensemble bitwise: per output band, the four flip variants' bands
    (mirrored plan for vertical flips) are unflipped and mean-reduced
    exactly as serve._ensemble_body does."""
    cfg = SRCNNConfig(model=model, lane_pack=False, use_pallas=False,
                      self_ensemble=True)
    ref, refc = upscale(img, 2.0, cfg, return_conv_map=True)
    out, conv = upscale_chunked(img, 2.0, cfg, band_rows=13)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(conv, refc)


def test_chunked_ensemble_fractional_and_rgba():
    img4 = np.random.default_rng(47).integers(0, 256, (30, 26, 4), np.uint8)
    cfg = SRCNNConfig(use_pallas=False, self_ensemble=True)
    ref = upscale(img4, 2.4, cfg)
    out, _ = upscale_chunked(img4, 2.4, cfg, band_rows=11)
    np.testing.assert_array_equal(out, ref)
