"""Host-side image file I/O."""

from .imagefile import load_image, save_png  # noqa: F401
