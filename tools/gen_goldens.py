#!/usr/bin/env python3
"""Generate golden outputs from the ACTUAL reference binary.

Runs the reference library (built by tools/build_reference.sh) on a set of
inputs -- crops of the reference's own sample images plus synthetic
patterns -- across scales/filters/step modes, and packs inputs+outputs into
``tests/goldens/goldens.npz`` for the regression suite (SURVEY.md section 4:
"the reference binary itself becomes the oracle").

Re-run: tools/build_reference.sh && python tools/gen_goldens.py
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
from PIL import Image

DRIVER = "/tmp/libsrcnn_ref/oracle_driver"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", "goldens.npz")


def run_reference(img: np.ndarray, multiply: float, filt: int, step: bool):
    if img.ndim == 2:
        # gray-promoted path: the reference test app normalizes grayscale
        # to RGB before ProcessSRCNN (`convImage`, test.cpp:45-120); the
        # library itself only takes d>=3 buffers
        img = np.ascontiguousarray(np.stack([img] * 3, axis=-1))
    h, w, d = img.shape
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.raw")
        outp = os.path.join(td, "out.raw")
        convp = os.path.join(td, "conv.raw")
        img.tofile(inp)
        r = subprocess.run(
            [DRIVER, inp, str(w), str(h), str(d), repr(multiply), str(filt),
             "1" if step else "0", outp, convp],
            capture_output=True, text=True, timeout=600, check=True,
        )
        toks = r.stdout.split()
        outsz, convsz, ms = int(toks[1]), int(toks[2]), float(toks[3])
        out = np.fromfile(outp, dtype=np.uint8)
        conv = np.fromfile(convp, dtype=np.uint8)
        # recover output geometry: reference truncates via float32
        dw = int(np.float32(w) * np.float32(multiply))
        dh = int(np.float32(h) * np.float32(multiply))
        if step:
            # chained x2 passes change the final size (SURVEY section 3.2)
            sw, sh = w, h
            mult = np.float32(multiply)
            lf = np.fmod(mult, np.float32(2.0))
            repeat = int(mult / np.float32(2.0)) + (1 if lf > 0 else 0)
            for cnt in range(repeat):
                curmf = np.float32(2.0)
                if cnt + 1 == repeat:
                    curmf = (np.float32(w) * mult) / np.float32(sw)
                    if curmf == 0.0 or curmf == 1.0:
                        break
                nw = int(np.float32(sw) * curmf)
                nh = int(np.float32(sh) * curmf)
                sw, sh = nw, nh
            dw, dh = sw, sh
        assert out.size == dh * dw * d, (out.size, dh, dw, d)
        return out.reshape(dh, dw, d), conv.reshape(dh, dw), ms


def main():
    cases = {}
    meta = []

    butterfly = np.asarray(Image.open("/root/reference/Pictures/butterfly.png").convert("RGB"))
    castle = np.asarray(Image.open("/root/reference/Pictures/castle.jpg").convert("RGB"))

    inputs = {
        "butterfly64": butterfly[96:160, 96:160],       # 64x64 detail crop
        "butterfly_full": butterfly,                     # 256x256
        "castle96": castle[200:296, 400:496],            # 96x96 crop
        "noise33": np.random.default_rng(42).integers(0, 256, (33, 47, 3), np.uint8),
        "rgba48": np.dstack([
            butterfly[0:48, 0:48],
            np.random.default_rng(1).integers(0, 256, (48, 48), np.uint8),
        ]),
        # stored 2-D: exercises the framework's gray->RGB promotion
        # (api._as_u8_image, mirroring convImage test.cpp:45-120); the
        # reference driver receives the promoted 3-channel buffer
        "gray64": np.asarray(
            Image.open("/root/reference/Pictures/butterfly.png")
            .convert("L"))[64:128, 64:128],
    }

    configs = [
        # (input, multiply, filter, step)
        ("butterfly64", 2.0, 2, False),
        ("butterfly64", 2.0, 0, False),
        ("butterfly64", 2.0, 1, False),
        ("butterfly64", 2.0, 3, False),
        ("butterfly64", 2.0, 4, False),
        ("butterfly64", 3.0, 2, False),
        ("butterfly64", 4.0, 2, False),
        ("butterfly64", 1.5, 2, False),
        ("butterfly64", 4.0, 2, True),
        ("butterfly64", 3.0, 3, True),
        ("butterfly_full", 2.0, 2, False),
        ("castle96", 2.0, 2, False),
        ("castle96", 0.5, 2, False),
        ("noise33", 2.0, 2, False),
        ("rgba48", 2.0, 2, False),
        # round 2 additions: fractional step-scale, more filter/scale combos
        ("butterfly64", 2.5, 2, True),
        ("butterfly64", 5.0, 2, True),
        ("butterfly64", 3.0, 1, False),
        ("butterfly64", 3.0, 4, False),
        ("butterfly64", 1.25, 3, False),
        ("castle96", 2.0, 3, False),
        ("rgba48", 4.0, 2, True),
        ("noise33", 3.0, 0, False),
        # round 4 additions: gray-promoted input (convImage path),
        # castle at fractional scales, RGBA + fractional step-scale
        ("gray64", 2.0, 2, False),
        ("gray64", 3.0, 1, False),
        ("gray64", 4.0, 2, True),
        ("castle96", 1.5, 2, False),
        ("castle96", 2.5, 3, False),
        ("rgba48", 2.5, 2, True),
    ]

    for name, img in inputs.items():
        cases[f"in_{name}"] = img

    for name, mult, filt, step in configs:
        key = f"{name}_m{mult}_f{filt}_s{int(step)}"
        out, conv, ms = run_reference(inputs[name], mult, filt, step)
        cases[f"out_{key}"] = out
        cases[f"conv_{key}"] = conv
        meta.append(f"{key},{name},{mult},{filt},{int(step)},{ms:.1f}")
        print(f"{key}: out {out.shape} conv {conv.shape} ({ms:.0f} ms)")

    cases["meta"] = np.asarray(meta)
    np.savez_compressed(OUT, **cases)
    print(f"wrote {OUT} ({os.path.getsize(OUT)//1024} KiB)")


if __name__ == "__main__":
    sys.exit(main())
