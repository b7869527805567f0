"""Training-pair synthesis using the framework's own resize engine.

SRCNN's training recipe (Dong et al., sec. 4.1): downscale HR images by the
target factor, upscale back with a classical filter, and learn the mapping
from the interpolated Y plane to the original HR Y plane.  Both directions
use this framework's band resampler so train/test interpolation match
exactly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import FilterType
from ..ops import color, resize


def synthesize_pair(
    hr_rgb: np.ndarray, scale: float = 2.0,
    filter_type: FilterType = FilterType.BICUBIC,
):
    """HR u8 RGB image -> (lr_upscaled_y, hr_y) float32 planes of equal size.

    The LR plane is HR downscaled by 1/scale then classically upscaled back
    -- exactly what the inference pipeline feeds the conv stack.
    """
    h, w = hr_rgb.shape[:2]
    planes = color.rgb_to_ycbcr(jnp.asarray(hr_rgb))
    hr_y = planes[0]
    lw, lh = max(1, int(w / scale)), max(1, int(h / scale))
    small = resize.resize_plane(hr_y, lh, lw, filter_type)
    lr_up = resize.resize_plane(small, h, w, filter_type)
    return np.asarray(lr_up, np.float32), np.asarray(hr_y, np.float32)


def make_patch_batch(
    images: list[np.ndarray],
    batch_size: int,
    patch: int = 32,
    scale: float = 2.0,
    seed: int = 0,
    filter_type: FilterType = FilterType.BICUBIC,
):
    """Sample a [B, patch, patch] (lr, hr) Y-patch batch from HR images."""
    rng = np.random.default_rng(seed)
    pairs = [synthesize_pair(img, scale, filter_type) for img in images]
    lr = np.empty((batch_size, patch, patch), np.float32)
    hr = np.empty((batch_size, patch, patch), np.float32)
    for b in range(batch_size):
        lr_y, hr_y = pairs[rng.integers(len(pairs))]
        h, w = hr_y.shape
        if h < patch or w < patch:
            raise ValueError(f"image {h}x{w} smaller than patch {patch}")
        r = rng.integers(h - patch + 1)
        c = rng.integers(w - patch + 1)
        lr[b] = lr_y[r : r + patch, c : c + patch]
        hr[b] = hr_y[r : r + patch, c : c + patch]
    return lr, hr
