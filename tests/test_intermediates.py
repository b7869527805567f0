"""debug_intermediates API: plane inventory and consistency with the
oracle's per-layer values (the reference's DEBUG dump equivalents)."""

import numpy as np

from libsrcnn_tpu.api import debug_intermediates
from libsrcnn_tpu.config import FilterType, SRCNNConfig
from libsrcnn_tpu.models import srcnn
import oracle


def test_inventory_and_values():
    img = np.random.default_rng(50).integers(0, 256, (16, 20, 3), np.uint8)
    planes = debug_intermediates(img, 2.0)

    names = set(planes)
    assert {"resized_Y", "resized_Cb", "resized_Cr", "conv3"} <= names
    assert sum(1 for n in names if n.startswith("conv1_")) == 64
    assert sum(1 for n in names if n.startswith("conv2_")) == 32
    assert planes["resized_Y"].shape == (32, 40)

    # per-layer parity vs the loop-level oracle
    np_params = {k: np.asarray(v) for k, v in srcnn.load_params().items()}
    ycc = oracle.rgb_to_ycbcr(img)
    y_r = oracle.resize_plane(ycc[0], 32, 40, FilterType.BICUBIC)
    np.testing.assert_allclose(planes["resized_Y"], y_r, atol=2e-3)
    c1 = oracle.conv99(y_r, np_params["w1"], np_params["b1"])
    np.testing.assert_allclose(planes["conv1_0"], c1[0], atol=5e-3)
    c2 = oracle.conv11(c1, np_params["w2"], np_params["b2"])
    np.testing.assert_allclose(planes["conv2_5"], c2[5], atol=5e-3)
    c3 = oracle.conv55(c2, np_params["w3"], float(np_params["b3"][0]))
    np.testing.assert_allclose(planes["conv3"], c3, atol=5e-3)


def test_rgba_includes_alpha():
    img = np.random.default_rng(51).integers(0, 256, (12, 12, 4), np.uint8)
    planes = debug_intermediates(img, 2.0, SRCNNConfig(filter=FilterType.BILINEAR))
    assert "resized_A" in planes and planes["resized_A"].shape == (24, 24)
