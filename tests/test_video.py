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


@pytest.fixture(scope="module")
def mp4(tmp_path_factory):
    """A 7-frame 32x24 mp4 with smooth content (codec-friendly)."""
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 20.0,
                         (32, 24))
    assert wr.isOpened()
    yy, xx = np.mgrid[0:24, 0:32]
    frames = []
    for t in range(7):
        f = ((yy * 5 + xx * 3 + t * 11) % 256).astype(np.uint8)
        rgb = np.stack([f, 255 - f, np.full_like(f, 40 + 10 * t)], axis=-1)
        frames.append(rgb)
        wr.write(rgb[:, :, ::-1])  # sink takes BGR
    wr.release()
    return path, frames


def test_iter_video_decodes_rgb(mp4):
    path, frames = mp4
    got = list(video.iter_video(path))
    assert len(got) == 7
    assert got[0].shape == (24, 32, 3)
    # mp4v is lossy but the gradient survives closely
    err = np.abs(got[3].astype(int) - frames[3].astype(int)).mean()
    assert err < 8.0, err
    assert abs(video.video_fps(path) - 20.0) < 0.5


def test_upscale_video_mp4_roundtrip(mp4, tmp_path):
    """mp4 in -> batched device path -> mp4 out, streamed (O(batch)
    memory); geometry, frame count and fps survive."""
    path, frames = mp4
    dst = str(tmp_path / "clip_up.mp4")
    n = video.upscale_video(path, dst, 2.0, batch=4)
    assert n == 7
    got = list(video.iter_video(dst))
    assert len(got) == 7 and got[0].shape == (48, 64, 3)
    assert abs(video.video_fps(dst) - 20.0) < 0.5
    # content sanity vs the still API (two lossy encodes in the chain)
    want = upscale(frames[0], 2.0)
    err = np.abs(got[0].astype(int) - want.astype(int)).mean()
    assert err < 12.0, err


def test_upscale_video_gif_to_mp4(gif, tmp_path):
    """Cross-tier transcode: PIL animation source, OpenCV sink; the
    animation's frame duration becomes the video fps."""
    path, _ = gif
    dst = str(tmp_path / "anim.mp4")
    n = video.upscale_video(path, dst, 2.0, batch=2)
    assert n == 3
    got = list(video.iter_video(dst))
    assert len(got) == 3 and got[0].shape == (40, 48, 3)


def test_is_video_and_auto_name():
    assert video.is_video("a/clip.MP4") and video.is_video("x.webm")
    assert not video.is_video("a.gif") and not video.is_video("a.png")


def test_upscale_video_webm_sink(mp4, tmp_path):
    """WebM muxing accepts only VP8/VP9/AV1 -- the fourcc map must emit
    a real webm, and fps must survive float-exactly (no int-ms round
    trip: 20 fps here, 29.97-style rates in the field)."""
    path, _ = mp4
    dst = str(tmp_path / "clip.webm")
    n = video.upscale_video(path, dst, 2.0, batch=4)
    assert n == 7
    got = list(video.iter_video(dst))
    assert len(got) == 7 and got[0].shape == (48, 64, 3)
    assert abs(video.video_fps(dst) - 20.0) < 0.5


def test_variable_duration_gif_preserved(tmp_path):
    """Per-frame GIF delays survive the upscale round trip (collapsing to
    frame 0's duration would retime the whole animation)."""
    from PIL import Image

    rng = np.random.default_rng(14)
    frames = [Image.fromarray(
        rng.integers(0, 256, (10, 12, 3), np.uint8)) for _ in range(3)]
    src = str(tmp_path / "var.gif")
    frames[0].save(src, save_all=True, append_images=frames[1:],
                   duration=[100, 30, 30], loop=0)
    got, dur = video.read_frames(src)
    assert dur == [100, 30, 30]
    dst = str(tmp_path / "var_up.gif")
    video.upscale_video(src, dst, 2.0, batch=2)
    _, dur2 = video.read_frames(dst)
    assert dur2 == [100, 30, 30]


def test_upscale_video_rejects_bad_batch(mp4, tmp_path):
    path, _ = mp4
    with pytest.raises(ValueError, match="batch"):
        video.upscale_video(path, str(tmp_path / "x.mp4"), 2.0, batch=-1)
