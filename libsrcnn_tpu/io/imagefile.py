"""Image file loading/saving for the CLI and tools.

Replaces the reference test app's FLTK + libpng stack (`test.cpp:122-274`):
magic-byte format sniffing (`test.cpp:122-181`), normalization of
gray/paletted inputs to RGB (`convImage`, `test.cpp:45-120`), and PNG
output (`savetopng`, `test.cpp:183-274`) -- implemented host-side with
Pillow.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

#: magic bytes -> format, mirroring the reference's sniffing
#: (`test.cpp:129-170`): JPEG FF D8 FF, PNG 89 50 4E 47, BMP 42 4D.
_MAGICS = [(b"\xff\xd8\xff", "JPEG"), (b"\x89PNG", "PNG"), (b"BM", "BMP")]


def sniff_format(path: str) -> str | None:
    with open(path, "rb") as f:
        head = f.read(8)
    for magic, name in _MAGICS:
        if head.startswith(magic):
            return name
    return None


def load_image(path: str) -> np.ndarray:
    """Load JPEG/PNG/BMP as [H, W, 3|4] uint8.

    Gray and paletted images are normalized to RGB like the reference's
    `convImage` (`test.cpp:45-120`); alpha is preserved when present.
    """
    fmt = sniff_format(path)
    if fmt is None:
        raise ValueError(f"{path}: unsupported image format (need JPEG/PNG/BMP)")
    img = Image.open(path)
    if (img.mode in ("RGBA", "LA", "PA")
            or (img.mode == "P" and "transparency" in img.info)):
        # paletted PNGs carry alpha in a tRNS chunk, not the mode
        img = img.convert("RGBA")
    else:
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def save_png(path: str, arr: np.ndarray) -> None:
    """Write [H,W], [H,W,3] or [H,W,4] uint8 as PNG (`test.cpp:183-274`)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        Image.fromarray(arr, mode="L").save(path)
    elif arr.shape[-1] == 3:
        Image.fromarray(arr, mode="RGB").save(path)
    elif arr.shape[-1] == 4:
        Image.fromarray(arr, mode="RGBA").save(path)
    else:
        raise ValueError(f"bad image shape {arr.shape}")
