"""Pipeline-stage parallelism: the SRCNN stack split across a ``stage``
mesh axis, frames streaming through over ICI (GPipe-style schedule).

This fills the last row of SURVEY.md §2's parallelism table ("Optional
stage pipelining (resize -> conv1 -> conv2 -> conv3) across chips for
streaming video").  The reference has no analog at all -- its stages are
sequential CPU loops over one image (`libsrcnn.cpp:628-923`); here each
device owns a contiguous group of stages and a clip of N frames flows
through the chain in ``N + S - 1`` systolic steps:

* step ``t``: device ``s`` works on frame ``t - s`` (when in range), then
  hands its activation to device ``s + 1`` via ``lax.ppermute`` -- the
  only inter-device traffic, one [C, H', W'] buffer per step over ICI.
* the whole schedule is a single ``lax.scan`` inside one ``shard_map``;
  per-device stage dispatch is a ``lax.switch`` on ``axis_index`` (SPMD:
  one program, device-varying branch).

Activations are carried in a fixed packed layout so every stage maps
buffer -> buffer (a requirement of both ``ppermute`` and ``switch``):
channels ``[0:k)`` hold the live Y-path activation (k = 1/64/32/d+1),
channels ``[C-(d-1):C)`` carry the resized chroma planes untouched until
the final merge.  C = 64 + d - 1.

The per-stage math reuses the exact single-device ops (same
``precision=HIGHEST`` convs, same resize gather, same color converters),
so the pipelined output is bit-identical to :func:`libsrcnn_tpu.upscale`
-- asserted by tests/test_stages.py.  The fused Pallas kernel is a single
device op by design and cannot be split across stage boundaries; this
path always uses the XLA convs (``use_pallas`` is ignored, like the GSPMD
spatial path -- see PARITY.md).

When to use it: steady-frame streaming where per-chip memory, not
throughput, is the binding constraint (each chip holds only its stage's
weights and one activation buffer).  For throughput, batched data
parallelism (`sharding.upscale_batch`) keeps the MXU busier -- the
pipeline has an ``S - 1`` bubble and ships whole activation planes over
ICI every step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import FilterType, SRCNNConfig, chroma_filter
from ..models import srcnn
from ..ops import color, resize
from .. import pipeline

#: supported pipeline depths: contiguous groupings of the four atomic
#: stages [resize+color, conv1, conv2, conv3+merge]
_GROUPINGS = {
    2: ((0, 1), (2, 3)),   # conv1 dominates FLOPs; pair it with resize
    3: ((0, 1), (2,), (3,)),
    4: ((0,), (1,), (2,), (3,)),
}


def _atoms(params, d, dst_h, dst_w, y_filter, c_filter, n_chroma):
    """The four atomic stage functions, each mapping
    (packed [C,H',W'] f32 state, [H,W,D] u8 frame) -> packed state."""
    C = 64 + n_chroma

    def pack(act, chroma):
        fill = C - act.shape[0] - n_chroma
        parts = [act.astype(jnp.float32)]
        if fill:
            parts.append(jnp.zeros((fill, dst_h, dst_w), jnp.float32))
        if n_chroma:
            parts.append(chroma)
        return jnp.concatenate(parts, axis=0)

    def chroma_of(state):
        return state[C - n_chroma:] if n_chroma else state[:0]

    def a_resize(state, frame):
        planes = color.rgb_to_ycbcr(frame)  # [D,H,W] f32
        y_r = resize.resize_plane(planes[0], dst_h, dst_w, y_filter)
        rest = [resize.resize_plane(planes[c], dst_h, dst_w, c_filter)
                for c in range(1, d)]
        chroma = jnp.stack(rest) if rest else None
        return pack(y_r[None], chroma)

    def a_conv1(state, frame):
        x = state[0][None, :, :, None]  # NHWC
        h1 = srcnn._conv(srcnn.edge_pad(x, 4), params["w1"]) + params["b1"]
        h1 = jnp.maximum(h1, 0.0)
        return pack(h1[0].transpose(2, 0, 1), chroma_of(state))

    def a_conv2(state, frame):
        x = state[:64].transpose(1, 2, 0)[None]  # NHWC
        h2 = srcnn._conv(x, params["w2"]) + params["b2"]
        h2 = jnp.maximum(h2, 0.0)
        return pack(h2[0].transpose(2, 0, 1), chroma_of(state))

    def a_conv3(state, frame):
        x = state[:32].transpose(1, 2, 0)[None]  # NHWC
        h3 = srcnn._conv(srcnn.edge_pad(x, 2), params["w3"]) + params["b3"]
        y_sr = jnp.clip(h3[0, :, :, 0], 0.0, 255.0)
        merged = jnp.concatenate([y_sr[None], chroma_of(state)], axis=0)
        out_u8 = color.ycbcr_to_rgb(merged)  # [H',W',D] u8
        conv_u8 = jnp.floor(y_sr)  # truncating cast (`libsrcnn.cpp:897-901`)
        # final packed state: ch 0..d-1 = RGB planes, ch d = conv map
        # (u8 values are exact in f32, so the round-trip is lossless)
        return pack(
            jnp.concatenate(
                [out_u8.transpose(2, 0, 1).astype(jnp.float32), conv_u8[None]]
            ),
            chroma_of(state),
        )

    return [a_resize, a_conv1, a_conv2, a_conv3]


@functools.lru_cache(maxsize=32)
def _pipelined_fn(n, h, w, d, dst_h, dst_w, filter_type, mesh, axis):
    n_stages = mesh.shape[axis]
    groups = _GROUPINGS[n_stages]
    y_filter = FilterType(filter_type)
    c_filter = chroma_filter(y_filter)
    n_chroma = d - 1
    C = 64 + n_chroma
    steps = n + n_stages - 1

    def run(frames, params):  # frames [N,H,W,D] u8, replicated
        atoms = _atoms(params, d, dst_h, dst_w, y_filter, c_filter, n_chroma)
        branches = [
            (lambda state, frame, g=g: functools.reduce(
                lambda s, a: atoms[a](s, frame), g, state))
            for g in groups
        ]
        stage = lax.axis_index(axis)
        is_last = stage == n_stages - 1
        fwd = [(s, s + 1) for s in range(n_stages - 1)]

        def step(carry, t):
            buf, acc = carry
            frame = lax.dynamic_index_in_dim(
                frames, jnp.minimum(t, n - 1), keepdims=False)
            out = lax.switch(stage, branches, buf, frame)
            # last device banks frame t-(S-1) once it is real
            idx = t - (n_stages - 1)
            valid = jnp.logical_and(is_last, idx >= 0)
            idx = jnp.maximum(idx, 0)
            slot = lax.dynamic_index_in_dim(acc, idx, keepdims=False)
            acc = lax.dynamic_update_index_in_dim(
                acc, jnp.where(valid, out[: d + 1], slot), idx, axis=0)
            # hand the activation down the chain (device 0 gets zeros --
            # it reads fresh frames instead)
            buf = lax.ppermute(out, axis, fwd) if n_stages > 1 else out
            return (buf, acc), None

        buf0 = jnp.zeros((C, dst_h, dst_w), jnp.float32)
        acc0 = jnp.zeros((n, d + 1, dst_h, dst_w), jnp.float32)
        (_, acc), _ = lax.scan(step, (buf0, acc0), jnp.arange(steps))
        return acc[None]  # [1, N, d+1, H', W'] -- stacked over stages

    spec_state = P(axis)
    sharded = shard_map(
        run, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=spec_state,
        check_rep=False,
    )

    @jax.jit
    def fn(frames, params):
        stacked = sharded(frames, params)  # [S, N, d+1, H', W']
        final = stacked[n_stages - 1]
        out_u8 = final[:, :d].transpose(0, 2, 3, 1).astype(jnp.uint8)
        conv_u8 = final[:, d].astype(jnp.uint8)
        return out_u8, conv_u8

    return fn


def upscale_pipelined(frames, params, multiply: float, cfg: SRCNNConfig,
                      mesh: Mesh, axis: str = "stage"):
    """Upscale a clip of frames with the stack pipelined across
    ``mesh.shape[axis]`` devices.

    Args:
      frames: [N, H, W, D] u8 frames (same geometry).
      params: SRCNN params pytree (``pipeline.load_model_params``).
      multiply: scale factor (same semantics as :func:`libsrcnn_tpu.upscale`).
      cfg: model must be ``"srcnn"`` -- the LR families' learned-upscale
        heads are single fused stages with nothing to pipeline; use
        ``sharding.upscale_batch`` for them.
      mesh: mesh whose ``axis`` axis has 2..4 devices.

    Returns:
      ([N, H', W', D] u8 frames, [N, H', W'] u8 conv maps), bit-identical
      to running :func:`libsrcnn_tpu.upscale` per frame.
    """
    if cfg.self_ensemble:
        raise ValueError("self_ensemble is not implemented for the "
                         "stage-pipelined path; ensemble per frame "
                         "via api.upscale")
    if cfg.step_scale:
        raise ValueError(
            "step_scale is not supported by the stage-pipelined path (it "
            "runs one direct pass; silently skipping the chained-x2 u8 "
            "round trips would break bit-identity with api.upscale) -- "
            "chain upscale_pipelined calls per x2 pass instead")
    n_stages = mesh.shape[axis]
    if n_stages not in _GROUPINGS:
        raise ValueError(
            f"pipeline depth {n_stages} unsupported (axis {axis!r}); "
            f"use {sorted(_GROUPINGS)} stages")
    if cfg.model != "srcnn":
        raise ValueError(
            "pipeline-stage parallelism applies to the srcnn stack only; "
            f"model {cfg.model!r} has a fused learned-upscale head "
            "(use sharding.upscale_batch)")
    if cfg.compute_dtype != "float32":
        raise ValueError(
            "the stage-pipelined path runs exact f32 only (its atoms "
            "carry f32 and would silently diverge from upscale() under "
            f"compute_dtype={cfg.compute_dtype!r}); use per-frame "
            "api.upscale or sharding.upscale_batch for the other tiers")
    n, h, w, d = frames.shape
    dst_w, dst_h = resize.scaled_size(w, h, multiply)
    params, _ = pipeline.prepare_model_params(cfg, params, h, w,
                                              dst_h, dst_w, multiply)
    fn = _pipelined_fn(n, h, w, d, dst_h, dst_w, int(cfg.filter), mesh, axis)
    return fn(jnp.asarray(frames), params)
