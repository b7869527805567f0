"""Compute ops: color conversion, classical resize, padding, quantization."""

from . import color, filters, resize, weights_table  # noqa: F401
