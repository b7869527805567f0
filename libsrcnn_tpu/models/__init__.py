"""Model zoo: the SRCNN family (9-1-5 pre-trained + configurable variants)
and FSRCNN (learned-deconv upscaling, trainable)."""

from . import fsrcnn, srcnn, srcnn_generic  # noqa: F401
from .fsrcnn import FSRCNNSpec  # noqa: F401
from .srcnn_generic import SRCNN_915, SRCNN_935, SRCNN_955, ModelSpec  # noqa: F401
