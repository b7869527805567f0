"""Dataset evaluation: PSNR/SSIM of SRCNN vs classical interpolation.

The SRCNN literature evaluates on Set5/Set14 by downscaling ground-truth
images and super-resolving them back (the reference library itself ships
only visual goldens, SURVEY.md section 4).  This runner reproduces that
protocol on any directory of images: for each image and scale, synthesize
the LR input with the framework's resampler, upscale with (a) the classical
filter alone and (b) SRCNN, and report metrics against the ground truth.

CLI: ``python -m libsrcnn_tpu.eval.runner <dir-or-image> [--scale=2]
[--filter=bicubic]``
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

from ..config import FilterType, SRCNNConfig
from .metrics import psnr, ssim


@dataclasses.dataclass
class EvalResult:
    name: str
    scale: float
    psnr_interp: float
    ssim_interp: float
    psnr_srcnn: float
    ssim_srcnn: float

    @property
    def psnr_gain(self) -> float:
        return self.psnr_srcnn - self.psnr_interp


def evaluate_image(
    hr: np.ndarray, scale: float = 2.0,
    filter_type: FilterType = FilterType.BICUBIC, name: str = "",
    model: str = "srcnn", step_scale: bool = False,
    self_ensemble: bool = False,
) -> EvalResult:
    """Downscale ``hr`` by 1/scale, upscale back both ways, compare.

    ``step_scale`` evaluates the reference's chained-x2 mode
    (`libsrcnn.cpp:980-1061`) -- its own recipe for factors beyond the
    x2 the SRCNN weights were trained for.  ``self_ensemble`` scores the
    flip-ensemble tier (4 flip variants in one batched dispatch,
    averaged)."""
    import jax.numpy as jnp

    from ..api import upscale
    from ..ops import color, resize

    # Standard SR protocol, generalized to rational scales: for
    # scale = p/q crop the ground truth to multiples of p so the round
    # trip is exact on BOTH dims.  Without the crop a non-multiple side
    # forces a different recovery factor than the other dim, and the
    # uniform-scale pipeline (like the reference) then samples the
    # output on a misaligned grid vs the ground truth -- a penalty that
    # hits sharp model restorations far harder than the blurry interp
    # baseline, inverting comparisons on detail-rich content.
    from fractions import Fraction

    frac = Fraction(scale).limit_denominator(8)
    aligned_scale = float(frac) >= 1.0 and abs(scale - float(frac)) < 1e-9
    if aligned_scale:
        p = frac.numerator
        scale = float(frac)
        hr = hr[:hr.shape[0] // p * p, :hr.shape[1] // p * p]
    h, w = hr.shape[:2]
    if aligned_scale:
        # exact rational LR size (float w/scale truncates: 110/2.2 is
        # 49.999... in double, and int() would drop a full LR pixel,
        # silently misaligning the grid the crop just aligned)
        lw = max(1, w * frac.denominator // frac.numerator)
        lh = max(1, h * frac.denominator // frac.numerator)
    else:
        lw, lh = max(1, int(w / scale)), max(1, int(h / scale))

    # LR synthesis: per-channel classical downscale in YCbCr, like the
    # pipeline itself operates
    planes = color.rgb_to_ycbcr(jnp.asarray(hr))
    small = jnp.stack([
        resize.resize_plane(planes[c], lh, lw, filter_type)
        for c in range(planes.shape[0])
    ])
    lr = np.asarray(color.ycbcr_to_rgb(small))

    exact = float(w) / lw  # recover exactly h x w on the way up
    exact_h = float(h) / lh
    if aligned_scale:
        # the crop made the round trip exact; use the factor itself --
        # an epsilon here is not harmless: it bumps the step-scale
        # repeat count (fmod(4+eps, 2) > 0) and adds a spurious extra
        # near-identity conv pass the reference recipe never runs
        up_scale = scale
    else:
        # +eps: the pipeline truncates sizes through f32 (reference
        # parity, `test.cpp:653-672` math), so an exact ratio can land
        # one pixel short (e.g. 106 * f32(427/106) -> 426); the
        # overshoot is cropped below
        up_scale = max(exact, exact_h) * (1.0 + 1e-6) + 1e-6

    srcnn_up = upscale(lr, up_scale,
                       SRCNNConfig(filter=filter_type, model=model,
                                   step_scale=step_scale,
                                   self_ensemble=self_ensemble))[:h, :w]

    from ..config import chroma_filter

    planes_lr = color.rgb_to_ycbcr(jnp.asarray(lr))
    interp = jnp.stack([
        resize.resize_plane(planes_lr[c], srcnn_up.shape[0], srcnn_up.shape[1],
                            filter_type if c == 0
                            else chroma_filter(filter_type))
        for c in range(planes_lr.shape[0])
    ])
    interp_up = np.asarray(color.ycbcr_to_rgb(interp))[:h, :w]

    # defensive common-size crop (a short side costs one border row/col
    # of the comparison, never a crash)
    ch = min(h, srcnn_up.shape[0], interp_up.shape[0])
    cw = min(w, srcnn_up.shape[1], interp_up.shape[1])
    hr, srcnn_up, interp_up = (a[:ch, :cw] for a in (hr, srcnn_up, interp_up))

    return EvalResult(
        name=name, scale=scale,
        psnr_interp=psnr(interp_up, hr), ssim_interp=ssim(interp_up, hr),
        psnr_srcnn=psnr(srcnn_up, hr), ssim_srcnn=ssim(srcnn_up, hr),
    )


def evaluate_dir(path: str, scale: float = 2.0,
                 filter_type: FilterType = FilterType.BICUBIC,
                 model: str = "srcnn",
                 step_scale: bool = False,
                 self_ensemble: bool = False) -> list[EvalResult]:
    from ..io import load_image

    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
    results = []
    for f in files:
        img = load_image(f)[..., :3]
        results.append(evaluate_image(img, scale, filter_type,
                                      name=os.path.basename(f), model=model,
                                      step_scale=step_scale,
                                      self_ensemble=self_ensemble))
    return results


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    scale = 2.0
    ft = FilterType.BICUBIC
    model = "srcnn"
    step = False
    ensemble = False
    path = None
    for a in argv:
        if a.startswith("--scale="):
            scale = float(a[8:])
        elif a.startswith("--filter="):
            v = a[9:]
            ft = FilterType[v.upper()] if not v.isdigit() else FilterType(int(v))
        elif a.startswith("--model="):
            model = a[8:]
        elif a == "--step":
            step = True
        elif a == "--ensemble":
            ensemble = True
        else:
            path = a
    if path is None:
        raise SystemExit("usage: python -m libsrcnn_tpu.eval.runner <dir|image> "
                         "[--scale=F] [--filter=name|0-4] "
                         "[--model=srcnn|fsrcnn|espcn|vdsr] [--step] "
                         "[--ensemble]")

    results = evaluate_dir(path, scale, ft, model, step, ensemble)
    if not results:
        raise SystemExit(f"no images found under {path!r} "
                         f"(.png/.jpg/.jpeg/.bmp)")
    print(f"{'image':24s} {'interp PSNR/SSIM':>20s} {'SRCNN PSNR/SSIM':>20s} {'gain':>7s}")
    for r in results:
        print(f"{r.name:24s} {r.psnr_interp:9.2f}/{r.ssim_interp:.4f} "
              f"{r.psnr_srcnn:12.2f}/{r.ssim_srcnn:.4f} {r.psnr_gain:+6.2f}dB")
    mean_gain = float(np.mean([r.psnr_gain for r in results]))
    print(f"mean PSNR gain over interpolation: {mean_gain:+.2f} dB "
          f"({len(results)} images, x{scale}, {ft.name.lower()})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
