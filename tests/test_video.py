"""Animated-image front-end: GIF round-trip through the serving layer."""

import numpy as np
import pytest

from libsrcnn_tpu import SRCNNConfig, upscale
from libsrcnn_tpu.io import video


@pytest.fixture(scope="module")
def gif(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (20, 24, 3), np.uint8) for _ in range(3)]
    path = str(tmp_path_factory.mktemp("vid") / "clip.gif")
    ims = [Image.fromarray(f) for f in frames]
    ims[0].save(path, save_all=True, append_images=ims[1:], duration=50,
                loop=0)
    return path, frames


def test_read_frames(gif):
    path, frames = gif
    got, duration = video.read_frames(path)
    assert len(got) == 3 and got[0].shape == (20, 24, 3)
    assert duration == 50


def test_upscale_video_batched(gif, tmp_path):
    path, frames = gif
    out_path = str(tmp_path / "clip_up.gif")
    n = video.upscale_video(path, out_path, 2.0, batch=2)
    assert n == 3
    got, duration = video.read_frames(out_path)
    assert len(got) == 3 and got[0].shape == (40, 48, 3)
    assert duration == 50


def test_upscale_video_streamed_matches_still_api(gif, tmp_path):
    """Per-frame streaming (batch=None) produces exactly the still-image
    API's output for each decoded frame, modulo GIF palette quantization
    -- so compare on a PNG still instead, which is lossless."""
    from PIL import Image

    rng = np.random.default_rng(6)
    frame = rng.integers(0, 256, (16, 16, 3), np.uint8)
    src = str(tmp_path / "still.png")
    Image.fromarray(frame).save(src)
    dst = str(tmp_path / "still_up.png")
    n = video.upscale_video(src, dst, 2.0, batch=None)
    assert n == 1
    got = np.asarray(Image.open(dst).convert("RGB"))
    np.testing.assert_array_equal(got, upscale(frame, 2.0))


def test_video_cli(gif, tmp_path, monkeypatch):
    path, _ = gif
    out_path = str(tmp_path / "cli_out.gif")
    rc = video.main([path, out_path, "--scale=2", "--model=espcn",
                     "--batch=2"])
    assert rc == 0
    got, _ = video.read_frames(out_path)
    assert len(got) == 3 and got[0].shape == (40, 48, 3)
