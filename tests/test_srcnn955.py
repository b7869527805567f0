"""The srcnn955 HR family (generic 9-5-5 head): routing, halo plan,
gigapixel paths.  Tests use explicit random params so they hold with or
without the shipped checkpoint; checkpoint-dependent quality lives in
EVAL.md."""

import numpy as np
import pytest

import jax

from libsrcnn_tpu import SRCNNConfig, upscale, upscale_chunked
from libsrcnn_tpu.models import srcnn_generic as g


@pytest.fixture(scope="module")
def params955():
    p = g.init_params(jax.random.key(1), g.SRCNN_955)
    # random init reconstructs ~0 (everything clamps); bias the head into
    # mid-range so outputs exercise real values
    return dict(p, b3=p["b3"] + 120.0, __spec__=g.SRCNN_955)


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(55).integers(0, 256, (40, 34, 3), np.uint8)


def test_reachable_from_upscale(params955, img):
    cfg = SRCNNConfig(model="srcnn955")
    out, conv = upscale(img, 2.0, cfg, params=params955,
                        return_conv_map=True)
    assert out.shape == (80, 68, 3) and conv.shape == (80, 68)


def test_any_factor_one_checkpoint(params955, img):
    """HR-domain contract: fractional scales and step-scale chains work
    off the single head (neither LR family serves 1.7x)."""
    cfg = SRCNNConfig(model="srcnn955")
    out = upscale(img, 1.7, cfg, params=params955)
    assert out.shape == (68, 57, 3)
    out = upscale(img, 4.0, SRCNNConfig(model="srcnn955", step_scale=True),
                  params=params955)
    assert out.shape == (160, 136, 3)


def test_halo_width_derived():
    assert g.halo_width(g.SRCNN_915) == 6
    assert g.halo_width(g.SRCNN_955) == 8
    assert g.halo_width(g.SRCNN_935) == 7


def test_forward_hr_matches_forward_y(params955, img):
    """The HR-protocol forward (conv_same, direct) is bitwise the
    original generic forward (edge_pad + VALID convs)."""
    y = np.random.default_rng(5).uniform(0, 255, (30, 26)).astype(np.float32)
    p = {k: v for k, v in params955.items() if k != "__spec__"}
    a = np.asarray(g.forward_y(p, y, g.SRCNN_955))
    b = np.asarray(g.forward_hr(p, y, g.SRCNN_955))
    np.testing.assert_array_equal(a, b)


def test_chunked_bitexact(params955, img):
    cfg = SRCNNConfig(model="srcnn955", lane_pack=False)
    ref, refc = upscale(img, 2.0, cfg, params=params955,
                        return_conv_map=True)
    out, conv = upscale_chunked(img, 2.0, cfg, params=params955,
                                band_rows=13)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(conv, refc)


def test_tiled_bitexact(params955, img):
    from libsrcnn_tpu.parallel import upscale_tiled
    from libsrcnn_tpu.parallel.mesh import make_mesh

    cfg = SRCNNConfig(model="srcnn955", lane_pack=False)
    ref = upscale(img[:32, :32], 2.0, cfg, params=params955)
    mesh = make_mesh({"data": 1, "row": 2, "col": 2}, jax.devices()[:4])
    out, _ = upscale_tiled(img[:32, :32], params955, 2.0, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_missing_checkpoint_error_names_trainer(img, monkeypatch):
    """Without a shipped checkpoint the error must point at the trainer,
    not KeyError somewhere in the pipeline."""
    import os

    if os.path.exists(os.path.join(g.WEIGHTS_DIR, "srcnn955.npz")):
        pytest.skip("checkpoint is shipped")
    with pytest.raises(FileNotFoundError, match="train_srcnn955"):
        upscale(img, 2.0, SRCNNConfig(model="srcnn955"))


def test_cli_accepts_model(tmp_path, params955, img):
    from PIL import Image

    from libsrcnn_tpu import cli

    p = tmp_path / "in.png"
    Image.fromarray(img).save(p)
    # CLI loads shipped weights; skip if the checkpoint isn't trained yet
    import os

    if not os.path.exists(os.path.join(g.WEIGHTS_DIR, "srcnn955.npz")):
        pytest.skip("checkpoint not shipped yet")
    rc = cli.main([str(p), "--scale=2", "--model=srcnn955"])
    assert rc == 0
    assert (tmp_path / "in_resized.png").exists()
