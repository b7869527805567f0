"""Fuzz: random shapes/scales/filters through the full pipeline vs the
loop-level oracle (small sizes keep the numpy oracle fast)."""

import numpy as np
import pytest

from libsrcnn_tpu import FilterType, SRCNNConfig, upscale
import oracle


@pytest.mark.parametrize("seed", range(10))
def test_random_config_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    h = int(rng.integers(3, 40))
    w = int(rng.integers(3, 40))
    d = int(rng.choice([3, 4]))
    ft = FilterType(int(rng.integers(0, 5)))
    scale = float(rng.choice([0.4, 0.75, 1.5, 2.0, 2.3, 3.0]))
    img = rng.integers(0, 256, (h, w, d), np.uint8)
    # oracle needs output >= 1 px
    if int(np.float32(w) * np.float32(scale)) < 1 or \
       int(np.float32(h) * np.float32(scale)) < 1:
        scale = 2.0

    got, gotc = upscale(img, scale, SRCNNConfig(filter=ft), return_conv_map=True)
    want, wantc = oracle.do_srcnn(img, scale, ft)
    d1 = np.abs(got.astype(int) - want.astype(int))
    assert d1.max() <= 1, (seed, h, w, d, ft, scale, d1.max())
    assert np.abs(gotc.astype(int) - wantc.astype(int)).max() <= 1


@pytest.mark.parametrize("shape", [(1, 1, 3), (1, 8, 3), (2, 2, 4)])
def test_degenerate_sizes(shape):
    img = np.random.default_rng(60).integers(0, 256, shape, np.uint8)
    out = upscale(img, 2.0)
    assert out.shape == (shape[0] * 2, shape[1] * 2, shape[2])


def test_extreme_scales():
    img = np.random.default_rng(61).integers(0, 256, (8, 8, 3), np.uint8)
    assert upscale(img, 8.0).shape == (64, 64, 3)
    assert upscale(img, 0.25).shape == (2, 2, 3)
    assert upscale(img, 7.5, SRCNNConfig(step_scale=True)).shape == (60, 60, 3)


@pytest.mark.parametrize("seed", range(5))
def test_random_step_scale(seed):
    rng = np.random.default_rng(2000 + seed)
    h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
    scale = float(rng.choice([2.0, 2.5, 3.0, 4.0]))
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    out = upscale(img, scale, SRCNNConfig(step_scale=True))
    # step-scale output geometry must follow the reference's chained-x2 math
    mult = np.float32(scale)
    lf = np.fmod(mult, np.float32(2.0))
    repeat = int(mult / np.float32(2.0)) + (1 if lf > 0 else 0)
    sw, sh = w, h
    for cnt in range(repeat):
        curmf = np.float32(2.0)
        if cnt + 1 == repeat:
            curmf = (np.float32(w) * mult) / np.float32(sw)
            if curmf == 0.0 or curmf == 1.0:
                break
        sw = int(np.float32(sw) * curmf)
        sh = int(np.float32(sh) * curmf)
    assert out.shape == (sh, sw, 3)
