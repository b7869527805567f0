"""The gigapixel bench's k-vectorized strip oracle must match the plain
loop-level oracle exactly -- it is the verification instrument for the
>=1 GP chunked run (benchmarks/gigapixel_bench.py), so it gets its own
regression gate here."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))


def test_strip_oracle_matches_full_oracle():
    import oracle
    from gigapixel_bench import oracle_strip
    from libsrcnn_tpu.models.srcnn import _load_npz

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (60, 72, 3), np.uint8)
    params = _load_npz()
    full_rgb, full_conv = oracle.do_srcnn(img, 2.0)

    for r0, r1 in [(0, 24), (50, 82), (96, 120)]:
        s_rgb, s_conv = oracle_strip(img, 2.0, r0, r1, params)
        np.testing.assert_array_equal(full_rgb[r0:r1], s_rgb)
        np.testing.assert_array_equal(full_conv[r0:r1], s_conv)
