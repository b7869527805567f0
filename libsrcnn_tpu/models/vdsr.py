"""VDSR (Kim et al., CVPR 2016 -- "Accurate Image Super-Resolution Using
Very Deep Convolutional Networks") as the zoo's deep HR-domain family.

Like the reference's SRCNN (and unlike FSRCNN/ESPCN), VDSR runs AFTER
classical interpolation, at high resolution -- so one checkpoint serves
EVERY factor the pipeline can produce (fractional scales, step-scale
chains), which neither per-scale LR family can.  What it adds over
SRCNN's 3 layers is depth with residual learning: the network predicts
only the interpolation residual, and the identity path carries the
image.  (The reference stops at 9-1-5 with baked-in weights,
`libsrcnn.cpp:350-529`; a deep family is beyond-reference breadth.)

TPU-shaped implementation details:

* The interior layers all share one shape (3x3, ch->ch), so they are
  STACKED into a single [L, 3, 3, ch, ch] array and driven by
  ``lax.scan`` -- the conv is traced and compiled once regardless of
  depth (compile time stays O(1) in L), and XLA pipelines the layer loop
  on-chip.
* The scan body is wrapped in ``jax.checkpoint``: activations for the L
  interior layers are rematerialized in the backward pass instead of
  stored, so training memory is O(1) in depth -- the standard TPU
  recipe for deep stacks (HBM is the bottleneck, FLOPs are cheap).
* Replicate SAME padding (edge semantics match the reference's conv
  border policy), f32 accumulation at HIGHEST precision.

Shipped weights: ``weights/vdsr.npz``, trained by tools/train_vdsr.py
with mixed scales {2, 3, 4} on the same corpus/degradation model as the
other families (butterfly held out); :func:`load_params` restores them.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "weights")


@dataclasses.dataclass(frozen=True)
class VDSRSpec:
    depth: int = 12   # total conv layers (>= 3): in + (depth-2) interior + out
    ch: int = 32      # interior feature channels

    @property
    def name(self) -> str:
        return f"vdsr-d{self.depth}c{self.ch}"


def default_spec() -> VDSRSpec:
    return VDSRSpec()


def init_params(key: jax.Array, spec: VDSRSpec = VDSRSpec(),
                dtype=jnp.float32) -> dict:
    if spec.depth < 3:
        raise ValueError(f"VDSR depth must be >= 3, got {spec.depth}")
    k_in, k_mid, k_out = jax.random.split(key, 3)
    L = spec.depth - 2

    def he(k, shape, fan_in):
        return jax.random.normal(k, shape, dtype) * float(
            np.sqrt(2.0 / fan_in))

    return {
        "in_w": he(k_in, (3, 3, 1, spec.ch), 9),
        "in_b": jnp.zeros((spec.ch,), dtype),
        "mid_w": he(k_mid, (L, 3, 3, spec.ch, spec.ch), 9 * spec.ch),
        "mid_b": jnp.zeros((L, spec.ch), dtype),
        # residual head starts near zero: the net begins as the identity
        "out_w": he(k_out, (3, 3, spec.ch, 1), 9 * spec.ch) * 0.1,
        "out_b": jnp.zeros((1,), dtype),
    }


@functools.lru_cache(maxsize=2)
def _load_cached(path: str):
    z = np.load(path)
    spec = VDSRSpec(depth=int(z["meta_depth"]), ch=int(z["meta_ch"]))
    params = {k: jnp.asarray(z[k]) for k in z.files
              if not k.startswith("meta_")}
    return params, spec


def load_params(scale: int | None = None, path: str | None = None,
                dtype=jnp.float32):
    """Load shipped (or checkpointed) VDSR weights -> (params, spec).

    ``scale`` is accepted for model-zoo protocol uniformity and ignored:
    the checkpoint is scale-agnostic (trained with mixed factors).
    """
    if path is None:
        path = os.path.join(WEIGHTS_DIR, "vdsr.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no shipped VDSR weights ({path}); train them with "
                f"tools/train_vdsr.py")
    params, spec = _load_cached(os.path.abspath(path))
    if dtype != jnp.float32:
        params = {k: v.astype(dtype) for k, v in params.items()}
    return params, spec


def _conv_same(x, w, precision=lax.Precision.HIGHEST, lane_pack=False):
    from libsrcnn_tpu.ops import packed_conv

    return packed_conv.conv_same(x, w, precision, lane_pack)


def forward_hr(params: dict, y_hr: jnp.ndarray,
               spec: VDSRSpec = VDSRSpec(), *, clamp: bool = True,
               precision=lax.Precision.HIGHEST,
               lane_pack: bool | int = False):
    """Interpolated HR Y plane(s) [H, W] or [N, H, W] -> refined, same
    shape.  ``y + residual`` with the residual net under scan+remat.

    ``precision`` sets the MXU algorithm for every conv: HIGHEST (default)
    is multi-pass exact f32; DEFAULT is single-pass bf16 multiplies with
    f32 accumulation -- the throughput tier (quality delta measured in
    EVAL.md; there is no u8 golden gate on this family).

    ``lane_pack`` runs the interior stack through
    :func:`libsrcnn_tpu.ops.packed_conv.conv_same`: True = the
    roofline-optimal phase count (p=4 doubles the useful MXU rate at
    ch=32), an int > 1 = that explicit count.  Same f32 MACs in a
    different reduction order, so it is not used where bit-stability
    across configs matters."""
    squeeze = y_hr.ndim == 2
    if squeeze:
        y_hr = y_hr[None]
    x = y_hr[..., None].astype(params["in_w"].dtype)

    # Measured non-win, kept out (PERF.md "VDSR roofline"): storing the
    # inter-layer activations in bf16 changes nothing on-chip -- the
    # stack is MXU-LANE-bound (ch=32 of 128 output lanes), not
    # HBM-bound, so the f32 carries stay for exact tier parity.
    h = jnp.maximum(_conv_same(x, params["in_w"], precision)
                    + params["in_b"], 0.0)

    @jax.checkpoint
    def layer(carry, wb):
        w, b = wb
        return jnp.maximum(
            _conv_same(carry, w, precision, lane_pack) + b, 0.0), None

    h, _ = lax.scan(layer, h, (params["mid_w"], params["mid_b"]))

    res = (_conv_same(h, params["out_w"], precision) + params["out_b"])[..., 0]
    out = y_hr.astype(jnp.float32) + res.astype(jnp.float32)
    if clamp:
        out = jnp.clip(out, 0.0, 255.0)
    return out[0] if squeeze else out


def make_loss_forward(spec: VDSRSpec, lane_pack: int = 1):
    """Adapter for :func:`libsrcnn_tpu.train.trainer.loss_fn`: VDSR
    consumes the ALREADY-INTERPOLATED plane, so training pairs are
    (interp_y, hr_y) at the SAME size -- build them with
    tools/train_vdsr.py's mixed-scale pool.

    ``lane_pack > 1`` trains through the packed formulation (autodiff
    flows through the weight expansion, so gradients land on the true
    [3,3,ch,ch] parameters); same MACs, ~2x step time on TPU at ch=32."""
    def forward(params, interp_y, clamp=False):
        return forward_hr(params, interp_y, spec, clamp=clamp,
                          lane_pack=lane_pack)

    return forward
