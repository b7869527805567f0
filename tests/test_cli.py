"""CLI parity: flags, auto-naming, outputs (`test.cpp:290-448,513-531`)."""

import os

import numpy as np
import pytest

from libsrcnn_tpu import cli
from libsrcnn_tpu.config import FilterType
from libsrcnn_tpu.io import load_image, save_png


@pytest.fixture()
def png(tmp_path):
    img = np.random.default_rng(8).integers(0, 256, (20, 16, 3), dtype=np.uint8)
    p = str(tmp_path / "img.png")
    save_png(p, img)
    return p, img


def test_parse_defaults():
    src, dst, conv, scale, cfg, repeat, dbg, _ = cli.parse_args(
        ["in.png"])
    assert (src, dst, conv) == ("in.png", "in_resized.png", "in_convolution.png")
    assert scale == 2.0 and cfg.filter == FilterType.BICUBIC and not cfg.step_scale


def test_parse_flags():
    _, _, _, scale, cfg, repeat, dbg, _ = cli.parse_args(
        ["a.jpg", "--scale=3.5", "--filter=3", "--step", "--repeat=2"])
    assert scale == 3.5 and cfg.filter == FilterType.LANCZOS3 and cfg.step_scale
    assert repeat == 2


def test_parse_filter_names():
    for name, ft in [("bspline", FilterType.BSPLINE), ("nearest", FilterType.NEAREST)]:
        _, _, _, _, cfg, _, _, _ = cli.parse_args(["a.png", f"--filter={name}"])
        assert cfg.filter == ft


def test_parse_bad_filter_falls_back_to_bicubic():
    # `test.cpp:353`: unknown numeric filter defaults to bicubic
    _, _, _, _, cfg, _, _, _ = cli.parse_args(["a.png", "--filter=99"])
    assert cfg.filter == FilterType.BICUBIC


def test_no_input_exits():
    with pytest.raises(SystemExit):
        cli.parse_args([])
    with pytest.raises(SystemExit):
        cli.parse_args(["--unknown-flag"])


def test_explicit_output_name():
    _, dst, _, _, _, _, _, _ = cli.parse_args(["a.png", "b.png"])
    assert dst == "b.png"


def test_end_to_end(png, capsys):
    path, img = png
    rc = cli.main([path, "--scale=2", "--filter=2"])
    assert rc == 0
    out_path = path[:-4] + "_resized.png"
    conv_path = path[:-4] + "_convolution.png"
    assert os.path.exists(out_path) and os.path.exists(conv_path)
    out = load_image(out_path)
    assert out.shape == (40, 32, 3)
    captured = capsys.readouterr().out
    assert "Test Ok, took" in captured  # `test.cpp:672`


def test_waitakey_accepted(png):
    path, _ = png
    assert cli.main([path, "--waitakey"]) == 0


def test_parse_pallas_and_bf16_flags():
    _, _, _, _, cfg, _, _, _ = cli.parse_args(["a.png"])
    assert cfg.use_pallas is None and cfg.compute_dtype == "float32"
    _, _, _, _, cfg, _, _, _ = cli.parse_args(["a.png", "--no-pallas", "--bf16"])
    assert cfg.use_pallas is False and cfg.compute_dtype == "bfloat16"
    _, _, _, _, cfg, _, _, _ = cli.parse_args(["a.png", "--pallas"])
    assert cfg.use_pallas is True
    _, _, _, _, cfg, _, _, _ = cli.parse_args(["a.png", "--bf16-fast"])
    assert cfg.compute_dtype == "bfloat16_fast"


def test_parse_ensemble_flag():
    _, _, _, _, cfg, _, _, _ = cli.parse_args(["a.png", "--ensemble"])
    assert cfg.self_ensemble is True
    _, _, _, _, cfg, _, _, _ = cli.parse_args(["a.png"])
    assert cfg.self_ensemble is False


def test_cli_step_scale_identity_skips_conv(tmp_path, monkeypatch):
    """--step with a chain that runs zero passes (scale 1.0): the
    reference leaves convbuff NULL -- the CLI must skip the conv output
    instead of crashing on conv=None."""
    from PIL import Image

    src = str(tmp_path / "a.png")
    Image.fromarray(np.random.default_rng(16).integers(
        0, 256, (12, 14, 3), np.uint8)).save(src)
    rc = cli.main([src, "--step", "--scale=1"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "a_resized.png"))
    assert not os.path.exists(str(tmp_path / "a_convolution.png"))


def test_auto_name_dotted_directory():
    assert cli._auto_name("photos.2024/cat", "resized") == \
        "photos.2024/cat_resized.png"
    assert cli._auto_name("a/b.png", "conv") == "a/b_conv.png"


def test_cli_tolerates_malformed_numeric_flags(tmp_path):
    """atof/atoi parity: garbage numeric values keep the defaults."""
    _, _, _, scale, _cfg, repeat, _, _ = cli.parse_args(
        ["x.png", "--scale=abc", "--repeat=zz"])
    assert scale == 2.0 and repeat == 1


def test_cli_chunked_matches_oneshot(tmp_path, png):
    """--chunked[=N] routes through the out-of-core band streamer and
    writes byte-identical outputs to the one-shot path."""
    src, img = png
    _, _, _, _, _, _, _, rows = cli.parse_args(["a.png", "--chunked"])
    assert rows == 512
    _, _, _, _, _, _, _, rows = cli.parse_args(["a.png", "--chunked=7"])
    assert rows == 7

    dst1 = str(tmp_path / "one.png")
    dst2 = str(tmp_path / "band.png")
    assert cli.main([src, dst1, "--scale=2"]) == 0
    assert cli.main([src, dst2, "--scale=2", "--chunked=8"]) == 0
    np.testing.assert_array_equal(load_image(dst1), load_image(dst2))


def test_chunked_step_conflict_exits():
    """--chunked runs one direct pass; combining it with --step must be a
    friendly SystemExit (like --chunked/--int8), not an uncaught
    ValueError out of upscale_chunked."""
    with pytest.raises(SystemExit, match="step"):
        cli.parse_args(["a.png", "--chunked", "--step"])
