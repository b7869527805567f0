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


def test_pipelined_vdsr_bitexact_multiple_depths():
    """The deep homogeneous vdsr stack pipelines at arbitrary depth
    (depth+1 atoms, residual identity carried in a reserved channel):
    bit-identical to the per-frame api at 2, 4 and 8 stages."""
    import numpy as np

    from libsrcnn_tpu import SRCNNConfig, upscale, pipeline
    from libsrcnn_tpu.parallel.stages import upscale_pipelined
    from libsrcnn_tpu.parallel.mesh import make_mesh

    frames = np.random.default_rng(6).integers(0, 256, (3, 16, 14, 3),
                                               np.uint8)
    cfg = SRCNNConfig(model="vdsr", lane_pack=False, use_pallas=False)
    params = pipeline.load_model_params(cfg, 2.0)
    ref = np.stack([upscale(f, 2.0, cfg, params=params) for f in frames])
    for s in (2, 8):
        mesh = make_mesh({"stage": s, "rest": 8 // s})
        out, _ = upscale_pipelined(frames, params, 2.0, cfg, mesh)
        np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipelined_vdsr_rejects_too_many_stages():
    import numpy as np
    import pytest

    from libsrcnn_tpu import SRCNNConfig, pipeline
    from libsrcnn_tpu.parallel.stages import upscale_pipelined
    from libsrcnn_tpu.parallel.mesh import make_mesh

    cfg = SRCNNConfig(model="vdsr", lane_pack=False)
    params = pipeline.load_model_params(cfg, 2.0)
    # a tiny synthetic spec would need depth+1 < stages; the shipped
    # d16 has 17 atoms, so fake it with a depth-3 spec
    from libsrcnn_tpu.models import vdsr as vdsr_mod
    import jax

    spec = vdsr_mod.VDSRSpec(depth=3, ch=8)
    p3 = dict(vdsr_mod.init_params(jax.random.key(0), spec),
              __spec__=spec)
    mesh = make_mesh({"stage": 8, "rest": 1})
    frames = np.zeros((2, 16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="atoms"):
        upscale_pipelined(frames, p3, 2.0, cfg, mesh)


def test_pipelined_srcnn955_bitexact_all_depths():
    """The generic family's 4-atom split (per-layer replicate-padded
    convs at the 9-5-5 spec) pipelines bit-identically to per-frame
    api.upscale at every supported depth."""
    import numpy as np

    from libsrcnn_tpu import SRCNNConfig, pipeline, upscale
    from libsrcnn_tpu.parallel.stages import upscale_pipelined
    from libsrcnn_tpu.parallel.mesh import make_mesh

    frames = np.random.default_rng(71).integers(
        0, 256, (4, 18, 22, 3), np.uint8)
    cfg = SRCNNConfig(model="srcnn955", lane_pack=False)
    params = pipeline.load_model_params(cfg, 2.0)
    ref = np.stack([upscale(f, 2.0, cfg, params=params) for f in frames])
    for s in (2, 4):
        mesh = make_mesh({"stage": s, "rest": 8 // s})
        out, _ = upscale_pipelined(frames, params, 2.0, cfg, mesh)
        np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipelined_rejects_n2_wider_than_n1():
    """A generic spec with n2 > n1 cannot carry conv2's output in the
    n1 + chroma stage state; must fail with a clear error, not a
    negative-dimension jnp.zeros trace error."""
    import jax

    from libsrcnn_tpu.models import srcnn_generic
    from libsrcnn_tpu.parallel.stages import upscale_pipelined
    from libsrcnn_tpu.parallel.mesh import make_mesh

    spec = srcnn_generic.ModelSpec(f1=9, n1=16, f2=5, n2=32, f3=5)
    params = dict(srcnn_generic.init_params(jax.random.key(0), spec),
                  __spec__=spec)
    mesh = make_mesh({"stage": 2, "rest": 4})
    frames = np.zeros((2, 16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="n2"):
        upscale_pipelined(frames, params, 2.0,
                          SRCNNConfig(model="srcnn955"), mesh)
