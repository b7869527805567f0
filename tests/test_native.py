"""Native C++ host library vs the numpy oracle / python builders."""

import threading

import numpy as np
import pytest

from libsrcnn_tpu.config import FilterType
from libsrcnn_tpu.io import native
from libsrcnn_tpu.ops.weights_table import contribution_table as py_table
import oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)")


def test_color_pack_exact():
    rng = np.random.default_rng(20)
    for d in (3, 4):
        img = rng.integers(0, 256, (21, 17, d), np.uint8)
        got = native.rgb_to_ycbcr(img)
        np.testing.assert_array_equal(got, oracle.rgb_to_ycbcr(img))
        back = native.ycbcr_to_rgb(got)
        np.testing.assert_array_equal(back, oracle.ycbcr_to_rgb(got))


@pytest.mark.parametrize("ft", list(FilterType))
def test_contribution_tables_exact(ft):
    for dst, src in [(64, 32), (48, 64), (96, 33), (10, 100)]:
        l1, w1 = native.contribution_table(int(ft), dst, src)
        l2, w2 = py_table(ft, dst, src)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_allclose(w1, w2, atol=1e-15)


def test_frame_ring_basic():
    ring = native.FrameRing(256, 4)
    assert len(ring) == 0 and ring.pop() is None
    assert ring.push(np.arange(100, dtype=np.uint8))
    assert len(ring) == 1
    out = ring.pop()
    np.testing.assert_array_equal(out, np.arange(100, dtype=np.uint8))
    ring.close()


def test_frame_ring_full_and_oversize():
    ring = native.FrameRing(64, 2)
    assert not ring.push(np.zeros(100, np.uint8))  # oversize
    assert ring.push(np.zeros(10, np.uint8))
    assert ring.push(np.zeros(10, np.uint8))
    assert not ring.push(np.zeros(10, np.uint8))  # full
    ring.close()


def test_frame_ring_threaded():
    """SPSC contract: one producer thread, one consumer thread."""
    ring = native.FrameRing(128, 8)
    n = 200
    got = []

    def producer():
        i = 0
        while i < n:
            frame = np.full((16,), i % 256, np.uint8)
            if ring.push(frame):
                i += 1

    t = threading.Thread(target=producer)
    t.start()
    while len(got) < n:
        f = ring.pop()
        if f is not None:
            got.append(int(f[0]))
    t.join()
    assert got == [i % 256 for i in range(n)]
    ring.close()
