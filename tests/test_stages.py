"""Pipeline-stage parallelism (`parallel/stages.py`): GPipe-style schedule
over a ``stage`` mesh axis must be bit-identical to per-frame single-device
upscaling (same XLA ops, precision=HIGHEST, only re-scheduled)."""

import numpy as np
import jax.numpy as jnp
import pytest

from libsrcnn_tpu import upscale, pipeline
from libsrcnn_tpu.config import SRCNNConfig, FilterType
from libsrcnn_tpu.parallel import stages
from libsrcnn_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def params():
    return pipeline.load_model_params(SRCNNConfig())


def _frames(n, h=24, w=20, d=3, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (n, h, w, d), np.uint8)


def _ref(frames, multiply, cfg):
    outs, convs = [], []
    for f in frames:
        o, c = upscale(f, multiply, cfg, return_conv_map=True)
        outs.append(np.asarray(o))
        convs.append(np.asarray(c))
    return np.stack(outs), np.stack(convs)


@pytest.mark.parametrize("n_stages", [2, 4])
def test_pipelined_matches_single_device(params, n_stages):
    mesh = make_mesh({"stage": n_stages, "rest": 8 // n_stages})
    frames = _frames(5)
    cfg = SRCNNConfig()
    out, conv = stages.upscale_pipelined(frames, params, 2.0, cfg, mesh)
    ref_out, ref_conv = _ref(frames, 2.0, cfg)
    np.testing.assert_array_equal(np.asarray(out), ref_out)
    np.testing.assert_array_equal(np.asarray(conv), ref_conv)


def test_pipelined_three_stage_lanczos(params):
    """3-stage split + non-integer factor + non-default filter."""
    import jax

    mesh = make_mesh({"stage": 3}, devices=jax.devices()[:3])
    frames = _frames(4, h=18, w=26, seed=3)
    cfg = SRCNNConfig(filter=FilterType.LANCZOS3)
    out, conv = stages.upscale_pipelined(frames, params, 1.5, cfg, mesh)
    ref_out, ref_conv = _ref(frames, 1.5, cfg)
    np.testing.assert_array_equal(np.asarray(out), ref_out)
    np.testing.assert_array_equal(np.asarray(conv), ref_conv)


def test_pipelined_rgba_and_single_frame(params):
    mesh = make_mesh({"stage": 2, "rest": 4})
    frames = _frames(1, d=4, seed=7)
    cfg = SRCNNConfig()
    out, conv = stages.upscale_pipelined(frames, params, 2.0, cfg, mesh)
    ref_out, ref_conv = _ref(frames, 2.0, cfg)
    np.testing.assert_array_equal(np.asarray(out), ref_out)
    np.testing.assert_array_equal(np.asarray(conv), ref_conv)


def test_pipelined_fewer_frames_than_stages(params):
    """N < S: the bubble dominates but results stay exact."""
    import jax

    mesh = make_mesh({"stage": 4}, devices=jax.devices()[:4])
    frames = _frames(2, seed=11)
    cfg = SRCNNConfig()
    out, conv = stages.upscale_pipelined(frames, params, 2.0, cfg, mesh)
    ref_out, ref_conv = _ref(frames, 2.0, cfg)
    np.testing.assert_array_equal(np.asarray(out), ref_out)
    np.testing.assert_array_equal(np.asarray(conv), ref_conv)


def test_pipelined_rejects_step_scale(params):
    mesh = make_mesh({"stage": 2, "rest": 4})
    frames = _frames(2)
    with pytest.raises(ValueError, match="step_scale"):
        stages.upscale_pipelined(frames, params, 4.0,
                                 SRCNNConfig(step_scale=True), mesh)


def test_pipelined_rejects_lr_family_and_bad_depth(params):
    mesh = make_mesh({"stage": 2, "rest": 4})
    frames = _frames(2)
    with pytest.raises(ValueError, match="fused learned-upscale"):
        stages.upscale_pipelined(
            frames, params, 2.0, SRCNNConfig(model="fsrcnn"), mesh)
    import jax

    mesh5 = make_mesh({"stage": 8}, devices=jax.devices())
    with pytest.raises(ValueError, match="pipeline depth"):
        stages.upscale_pipelined(frames, params, 2.0, SRCNNConfig(), mesh5)
