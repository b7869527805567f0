"""Animated-image (GIF/APNG/WebP) frame I/O for the serving layer.

The reference is a stills library (one `ProcessSRCNN` per image,
`/root/reference/src/test.cpp:653-672`); this module rounds out the
framework's video story: decode an animation into u8 frames, stream them
through :class:`libsrcnn_tpu.serve.VideoUpscaler`, re-encode.  PIL is the
codec (same dependency the stills CLI already uses); real deployments
would feed :func:`serve.stream_from_ring` from a hardware decoder
instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np


def read_frames(path: str) -> tuple[list[np.ndarray], int]:
    """Decode an (optionally animated) image file.

    Returns ``(frames, duration_ms)``: a list of [H, W, 3] u8 arrays and
    the per-frame display duration (0 for stills).
    """
    from PIL import Image, ImageSequence

    im = Image.open(path)
    duration = int(im.info.get("duration", 0) or 0)
    frames = [np.asarray(f.convert("RGB"))
              for f in ImageSequence.Iterator(im)]
    return frames, duration


def write_frames(path: str, frames: list[np.ndarray],
                 duration_ms: int = 0) -> None:
    """Encode frames to ``path``; animated when more than one frame (the
    format follows the extension: .gif/.webp/.png/...)."""
    from PIL import Image

    ims = [Image.fromarray(np.asarray(f, np.uint8)) for f in frames]
    if len(ims) == 1:
        ims[0].save(path)
    else:
        ims[0].save(path, save_all=True, append_images=ims[1:],
                    duration=duration_ms or 40, loop=0)


def upscale_video(src: str, dst: str, scale: float = 2.0,
                  config=None, batch: int | None = 8) -> int:
    """Upscale every frame of ``src`` into ``dst``; returns frame count.

    ``batch`` groups frames into one vmapped device dispatch each (the
    small-frame throughput path, PERF.md); ``batch=None`` streams frame
    by frame through :class:`VideoUpscaler` (lowest latency).
    """
    from ..config import DEFAULT_CONFIG
    from .. import serve

    config = config or DEFAULT_CONFIG
    frames, duration = read_frames(src)
    if not frames:
        raise ValueError(f"no frames decoded from {src}")
    if batch:
        outs = []
        for i in range(0, len(frames), batch):
            clip = np.stack(frames[i:i + batch])
            outs.extend(serve.upscale_frames(clip, scale, config))
    else:
        up = serve.VideoUpscaler(scale, config)
        outs = list(up.stream(iter(frames)))
    write_frames(dst, outs, duration)
    return len(outs)


def main(argv=None) -> int:
    """``srcnn-tpu-video in.gif [out.gif] --scale=F --model=M`` CLI."""
    import sys

    from ..config import FilterType, SRCNNConfig
    from ..cli import _auto_name
    from ..utils.tick import get_tick_count

    argv = sys.argv[1:] if argv is None else argv
    src = dst = None
    scale, model, filt, batch = 2.0, "srcnn", FilterType.BICUBIC, 8
    dtype = "float32"
    ensemble = False
    for arg in argv:
        if arg.startswith("--scale="):
            scale = float(arg[8:])
        elif arg.startswith("--model="):
            model = arg[8:]
        elif arg.startswith("--filter="):
            filt = FilterType(int(arg[9:]))
        elif arg.startswith("--batch="):
            batch = int(arg[8:]) or None
        elif arg == "--bf16":
            dtype = "bfloat16"
        elif arg == "--ensemble":
            ensemble = True
        elif arg.startswith("--"):
            raise SystemExit(f"unknown option: {arg}")
        elif src is None:
            src = arg
        elif dst is None:
            dst = arg
    if src is None:
        raise SystemExit("usage: srcnn-tpu-video <in.gif> [out.gif] "
                         "--scale=F --model=srcnn|fsrcnn|espcn|vdsr "
                         "--filter=0..4 --batch=N --bf16 --ensemble")
    if dst is None:
        # keep the source container for animations (_auto_name picks .png,
        # which would silently re-wrap a GIF as APNG)
        import os

        root, ext = os.path.splitext(src)
        dst = (f"{root}_resized{ext}" if ext.lower() in
               (".gif", ".webp", ".apng") else _auto_name(src, "resized"))
    cfg = SRCNNConfig(filter=filt, model=model, compute_dtype=dtype,
                      self_ensemble=ensemble)
    t0 = get_tick_count()
    n = upscale_video(src, dst, scale, cfg, batch)
    print(f"{dst}: {n} frames, took {get_tick_count() - t0} ms")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
