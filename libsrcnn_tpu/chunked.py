"""Out-of-core gigapixel upscaling on ONE device: stream output-row bands.

The reference is O(W·H) single-node and simply dies on frames whose float
planes exceed RAM (SURVEY.md section 5's "long-context analog").  The
framework's multi-chip answer is :func:`libsrcnn_tpu.parallel.upscale_tiled`
(spatial shards + ICI halo exchange); THIS module is the single-device
leg of the same size-scaling story: the image never exists on the chip
(or in host f32) at once.  The host streams horizontal output bands --
u8 source rows up, u8 result rows back -- and every intermediate lives
only at band height, so peak device memory is O(band) instead of O(image).

Exactness is the design constraint (same bar as the tiled path): each
band is computed from the GLOBAL contribution tables sliced to its rows
(boundary renormalization semantics stay exactly the reference's,
`frawscale.cpp:52-108`), the conv stack reads a 6-px band halo of REAL
neighbor rows (replicated rows only at true image edges, via the same
table-row replication trick as ops.resize.resize_plane_padded), and the
reference's conv2-output border clamp (`libsrcnn.cpp:463-489`) is gated
by per-band edge flags -- the same mechanism as parallel/halo.py, driven
sequentially instead of by ppermute.  Result: bit-identical to
:func:`libsrcnn_tpu.api.upscale` at the same compute tier.

One program compiles per band SHAPE (interior bands share one; a ragged
last band adds one more): the vertical band tables are passed as device
arguments, not baked into the trace.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .config import FilterType, SRCNNConfig, DEFAULT_CONFIG, chroma_filter
from .ops import color, resize
from .ops.weights_table import contribution_table

#: conv stack halo: 4 (conv1 9x9) + 2 (conv3 5x5) -- parallel/halo.py
CONV_HALO = 6


def _global_band_tables(filter_type: FilterType, dst: int, src: int):
    """Full-plane vertical gather tables in band form: clipped source
    indices [dst, K] + f32 weights, with the all-zero tap columns dropped
    exactly as ops.resize._resize_axis drops them (so per-row arithmetic
    -- term order included -- is identical to the single-pass resize).
    ``dst == src`` degenerates to the K=1 identity table (multiply by
    1.0), which is bitwise the no-op the full resize performs."""
    if dst == src:
        idx = np.arange(src, dtype=np.int64)[:, None]
        return idx, np.ones((src, 1), np.float32)
    left, w = contribution_table(filter_type, dst, src)
    k_all = w.shape[1]
    idx = np.clip(left[:, None] + np.arange(k_all)[None, :], 0, src - 1)
    keep = [k for k in range(k_all) if np.any(w[:, k])]
    return idx[:, keep].astype(np.int64), w[:, keep].astype(np.float32)


def _apply_band_axis0(plane, idx, w):
    """Vertical band gather with RUNTIME tables: emit len(idx) rows of
    the globally-resized plane.  Same k-order accumulation as
    ops.resize._resize_axis."""
    acc = None
    for k in range(w.shape[1]):
        g = jnp.take(plane, idx[:, k], axis=0)
        term = g * w[:, k][:, None]
        acc = term if acc is None else acc + term
    return acc


def _xla_halo_forward(params, ext, flags, bh: int, dst_w: int):
    """Exact-tier conv stack on a pre-haloed band ([bh+12, dst_w+12] ->
    [bh, dst_w]): XLA twin of the fused kernel's pad_mode="halo" body.
    The conv2-output ring is replaced by the edge value only where the
    band border is a TRUE image edge (flags [top, bottom]; columns are
    always true edges here -- bands span the full width)."""
    from .models.srcnn import _conv

    x = ext[None, :, :, None]
    h1 = jnp.maximum(_conv(x, params["w1"]) + params["b1"], 0.0)
    h2 = jnp.maximum(_conv(h1, params["w2"]) + params["b2"], 0.0)
    # h2 rows cover band rows -2..bh+1, cols -2..dst_w+1
    ri = jnp.arange(bh + 4)[None, :, None, None]
    ci = jnp.arange(dst_w + 4)[None, None, :, None]
    h2 = jnp.where((flags[0] == 1) & (ri < 2), h2[:, 2:3], h2)
    h2 = jnp.where((flags[1] == 1) & (ri > bh + 1), h2[:, bh + 1:bh + 2], h2)
    h2 = jnp.where(ci < 2, h2[:, :, 2:3], h2)
    h2 = jnp.where(ci > dst_w + 1, h2[:, :, dst_w + 1:dst_w + 2], h2)
    h3 = _conv(h2, params["w3"]) + params["b3"]
    return jnp.clip(h3[0, :, :, 0], 0.0, 255.0)


@functools.lru_cache(maxsize=32)
def _compiled_band(d: int, s_rows: int, src_w: int, bh: int, dst_w: int,
                   filter_type: int, use_pallas: bool, precision,
                   interpret: bool):
    """One jitted band program; interior bands of equal height share it."""
    y_filter = FilterType(filter_type)
    c_filter = chroma_filter(y_filter)
    up_width = dst_w > src_w

    def body(band_u8, params, vy_idx, vy_w, vc_idx, vc_w, flags):
        planes = color.rgb_to_ycbcr(band_u8)      # [D, s_rows, src_w]

        # Y: vertical band (+CONV_HALO rows) and horizontal with the
        # kernel's 6-px column padding, in the reference's pass order
        if up_width:
            yb = _apply_band_axis0(planes[0], vy_idx, vy_w)
            yb = resize._resize_axis_padded(yb, dst_w, y_filter, 1,
                                            CONV_HALO, dst_w + 2 * CONV_HALO)
        else:
            yh = resize._resize_axis_padded(planes[0], dst_w, y_filter, 1,
                                            CONV_HALO, dst_w + 2 * CONV_HALO)
            yb = _apply_band_axis0(yh, vy_idx, vy_w)

        rest = []
        for c in range(1, d):
            if up_width:
                pb = _apply_band_axis0(planes[c], vc_idx, vc_w)
                pb = resize._resize_axis(pb, dst_w, c_filter, 1)
            else:
                ph = resize._resize_axis(planes[c], dst_w, c_filter, 1)
                pb = _apply_band_axis0(ph, vc_idx, vc_w)
            rest.append(pb)

        if use_pallas:
            from .kernels import fused_conv

            w1 = params["w1"].reshape(81, 64).astype(jnp.float32)
            b1 = params["b1"].astype(jnp.float32)
            w2 = params["w2"].reshape(64, 32).astype(jnp.float32)
            b2 = params["b2"].astype(jnp.float32)
            w3 = (params["w3"][:, :, :, 0].transpose(1, 0, 2)
                  .reshape(25, 32).astype(jnp.float32))
            b3 = params["b3"].reshape(1).astype(jnp.float32)
            y_sr = fused_conv._fused(
                yb, w1, b1, w2, b2, w3, b3, flags,
                th=min(fused_conv.tile_h_for(precision), bh),
                interpret=interpret, pad_mode="halo", precision=precision)
        else:
            y_sr = _xla_halo_forward(params, yb, flags, bh, dst_w)

        merged = jnp.stack([y_sr, *rest], axis=0)
        out_u8 = color.ycbcr_to_rgb(merged)
        conv_u8 = jnp.floor(y_sr).astype(jnp.uint8)
        return out_u8, conv_u8

    return jax.jit(body)


def upscale_chunked(image, multiply: float, cfg: SRCNNConfig = DEFAULT_CONFIG,
                    *, band_rows: int = 512, params: dict | None = None,
                    inflight_bands: int = 2):
    """Full upscale of one [H, W, D] u8 frame streamed through the device
    in horizontal output bands of ``band_rows`` rows.

    Returns host numpy ``(out_u8 [H', W', D], conv_u8 [H', W'])``,
    bit-identical to :func:`libsrcnn_tpu.api.upscale` at the same compute
    tier; peak device memory is O(inflight_bands x band_rows x W'),
    independent of H.

    ``inflight_bands`` bounds the dispatch window: JAX dispatch is async,
    so keeping a few bands in flight overlaps band k's device compute
    with band k-1's device->host fetch and band k+1's host-side slice
    (the fetch is the only blocking call in the loop).  1 = fully
    serial; the default 2 double-buffers.

    srcnn-family only (the halo plan is the 9-1-5 stack's); no
    step_scale (chain calls per x2 pass, as with the tiled path) and no
    self_ensemble (ensemble per frame via api.upscale).  Compute tiers:
    float32 everywhere; bfloat16/bfloat16_fast on the Pallas body.
    """
    from . import pipeline as _pipeline

    if cfg.model != "srcnn":
        raise ValueError(f"upscale_chunked implements the srcnn 9-1-5 "
                         f"halo plan; model={cfg.model!r} is served by "
                         f"sharding.upscale_batch / api.upscale")
    if cfg.step_scale:
        raise ValueError("step_scale is not supported by the chunked path "
                         "(one direct pass; chain calls per x2 pass)")
    if cfg.self_ensemble:
        raise ValueError("self_ensemble is not implemented for the chunked "
                         "path; ensemble per frame via api.upscale")
    _pipeline.validate_compute_dtype(cfg)
    use_pallas = _pipeline.resolve_pallas(cfg.use_pallas)
    if cfg.compute_dtype == "float32":
        precision = jax.lax.Precision.HIGHEST
    elif cfg.compute_dtype in ("bfloat16", "bfloat16_fast") and use_pallas:
        from .kernels import fused_conv

        precision = (jax.lax.Precision.DEFAULT
                     if cfg.compute_dtype == "bfloat16"
                     else fused_conv.BF16X1)
    else:
        raise ValueError(
            f"the chunked path's conv tiers are float32 (XLA or Pallas "
            f"body) and bfloat16/bfloat16_fast (Pallas body only) -- got "
            f"compute_dtype={cfg.compute_dtype!r} with "
            f"use_pallas={cfg.use_pallas!r}")

    image = np.asarray(image)
    if image.ndim != 3 or image.shape[-1] not in (3, 4):
        raise ValueError(f"expected [H, W, 3|4] u8 image, got {image.shape}")
    h, w, d = image.shape
    dst_w, dst_h = resize.scaled_size(w, h, multiply)
    if dst_w <= 0 or dst_h <= 0:
        raise ValueError(f"bad scale {multiply} for {w}x{h}")
    if band_rows < 1:
        raise ValueError("band_rows must be >= 1")
    if inflight_bands < 1:
        raise ValueError("inflight_bands must be >= 1")

    if params is None:
        params = _pipeline.load_model_params(cfg, multiply)
    params = jax.device_put(
        {k: v for k, v in params.items() if k != "__spec__"})

    y_filter = FilterType(cfg.filter)
    c_filter = chroma_filter(y_filter)
    gy_idx, gy_w = _global_band_tables(y_filter, dst_h, h)
    gc_idx, gc_w = _global_band_tables(c_filter, dst_h, h)

    # band plan: per band, the Y rows (+halo) and chroma rows pull from a
    # source-row window; all interior bands share one padded window height.
    # No band cut may sit at row 1 or dst_h-1: the conv2-output ring is
    # +-2 rows, so a band starting at row 1 (or ending at dst_h-1) has a
    # ring row beyond the TRUE image edge while its edge flag is off, and
    # a replicated-input ring is not the reference's replicated-conv2-
    # output ring (`libsrcnn.cpp:463-489`).  Dropping those cuts merges
    # the offending 1-row band into its neighbor.
    cuts = [r for r in range(band_rows, dst_h, band_rows)
            if r != 1 and r != dst_h - 1]
    edges = [0] + cuts + [dst_h]
    bands = []
    for r0, r1 in zip(edges[:-1], edges[1:]):
        rows_y = np.clip(np.arange(r0 - CONV_HALO, r1 + CONV_HALO),
                         0, dst_h - 1)
        rows_c = np.arange(r0, r1)
        iy = gy_idx[rows_y]
        ic = gc_idx[rows_c]
        smin = int(min(iy.min(), ic.min()))
        smax = int(max(iy.max(), ic.max())) + 1
        bands.append((r0, r1, rows_y, rows_c, smin, smax))
    s_rows = max(smax - smin for _, _, _, _, smin, smax in bands)

    interpret = jax.default_backend() == "cpu"
    outs, convs = [], []
    inflight: list = []   # bounded dispatch window (device arrays)

    def _drain_one():
        out_b, conv_b = inflight.pop(0)
        outs.append(np.asarray(out_b))
        convs.append(np.asarray(conv_b))

    for r0, r1, rows_y, rows_c, smin, smax in bands:
        bh = r1 - r0
        src = image[smin:smax]
        if src.shape[0] < s_rows:           # equalize the compiled shape
            src = np.pad(src, ((0, s_rows - src.shape[0]), (0, 0), (0, 0)),
                         mode="edge")
        vy_idx = jnp.asarray(gy_idx[rows_y] - smin, jnp.int32)
        vy_w = jnp.asarray(gy_w[rows_y])
        vc_idx = jnp.asarray(gc_idx[rows_c] - smin, jnp.int32)
        vc_w = jnp.asarray(gc_w[rows_c])
        flags = jnp.asarray([r0 == 0, r1 == dst_h, True, True], jnp.int32)
        fn = _compiled_band(d, s_rows, w, bh, dst_w, int(cfg.filter),
                            use_pallas, precision, interpret)
        inflight.append(fn(jnp.asarray(src), params, vy_idx, vy_w,
                           vc_idx, vc_w, flags))
        if len(inflight) > inflight_bands:
            _drain_one()
    while inflight:
        _drain_one()
    return np.concatenate(outs, axis=0), np.concatenate(convs, axis=0)
