"""Streaming upscale: frames flow through the device with one in flight.

Simulates a 24-frame clip; with the native library built (`make -C native`)
a producer thread feeds a lock-free ring like a real decoder would.

For real video files there is a one-liner instead -- the CLI streams
mp4/avi/mkv/webm (OpenCV tier) or GIF/WebP animations (PIL tier):

    python -m libsrcnn_tpu.io.video clip.mp4 --scale=2 --model=espcn
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import threading
import time

import numpy as np

from libsrcnn_tpu.serve import VideoUpscaler, upscale_frames
from libsrcnn_tpu.io import native

H, W, N = 144, 176, 24
rng = np.random.default_rng(0)
frames = rng.integers(0, 256, (N, H, W, 3), np.uint8)

up = VideoUpscaler(scale=2.0)

# 1) plain iterator streaming
t0 = time.perf_counter()
outs = list(up.stream(iter(frames)))
dt = time.perf_counter() - t0
mp = N * (2 * H) * (2 * W) / 1e6
print(f"streamed {len(outs)} frames: {dt*1000:.0f} ms ({mp/dt:.1f} MP/s)")

# 2) one batched dispatch (best throughput for small frames)
t0 = time.perf_counter()
batch_out = upscale_frames(frames, 2.0)
dt = time.perf_counter() - t0
print(f"batched  {len(batch_out)} frames: {dt*1000:.0f} ms ({mp/dt:.1f} MP/s)")

# 3) native ring ingestion (decoder thread -> device loop)
if native.available():
    ring = native.FrameRing(frames[0].nbytes, nslots=8)
    done = threading.Event()

    def producer():
        for f in frames:
            while not ring.push(f):
                time.sleep(0.0005)
        done.set()

    t = threading.Thread(target=producer)
    t.start()
    n = sum(1 for _ in up.stream_from_ring(ring, (H, W, 3), stop=done.is_set))
    t.join()
    ring.close()
    print(f"ring-fed {n} frames ok")
else:
    print("native ring unavailable (run: make -C native)")
