"""Run the five BASELINE.json acceptance configs and print a JSON report.

    python tools/acceptance.py          # real TPU (or whatever backend)
    JAX_PLATFORMS=cpu python tools/acceptance.py --small   # quick CPU check

Each config reports correctness against the golden model (bit-exact unless
the op carries the documented +-1 budget) and wall time via the on-device
loop harness.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import imageprocessingtools_tpu as ipt
from imageprocessingtools_tpu.codec import ppm
from imageprocessingtools_tpu.golden import model as golden
from imageprocessingtools_tpu.utils.timing import device_loop_rate

SMALL = "--small" in sys.argv


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _maxdiff(a, b):
    return int(np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int)).max())


def main() -> None:
    report = {}
    dims_4k = (270, 480) if SMALL else (2160, 3840)
    dims_1080 = (135, 240) if SMALL else (1080, 1920)

    # 1. grayscale + invert on one 512x512 P6 (exact).
    img = _img(512 if not SMALL else 64, 512 if not SMALL else 64, seed=1)
    data = ppm.encode_ppm(img)
    decoded, _ = ppm.decode_ppm(data)
    out = ipt.invert(ipt.grayscale(decoded))
    exp = golden.invert(golden.grayscale(img))
    report["1_gray_invert_512"] = {"maxdiff": _maxdiff(out, exp), "expect": 0}

    # 2. brightness/contrast + threshold on 1080p, bit-exact uint8 check.
    img = _img(*dims_1080, seed=2)
    out = ipt.threshold(ipt.contrast(ipt.brightness(img, 25), 1.4), 128)
    exp = golden.threshold(golden.contrast(golden.brightness(img, 25), 1.4), 128)
    report["2_bright_contrast_thresh_1080p"] = {"maxdiff": _maxdiff(out, exp), "expect": 0}

    # 3. 3x3 box + sharpen + 5x5 gaussian on 4K (tiled stencil path).
    img = _img(*dims_4k, seed=3)
    gray = golden.grayscale(img)

    def conv_chain(c):
        g = ipt.grayscale(c)
        return ipt.gaussian_blur(ipt.sharpen(ipt.box_blur(g)))

    out = conv_chain(img)
    exp = golden.gaussian_blur(golden.sharpen(golden.box_blur(gray)))
    sec = device_loop_rate(conv_chain, img, iters=5)
    report["3_box_sharpen_gauss_4k"] = {
        "maxdiff": _maxdiff(out, exp),
        "expect": 0,
        "mpix_per_s": round(img.shape[0] * img.shape[1] / sec / 1e6, 1),
    }

    # 4. 256-bin hist-eq + sobel pipeline on 4K grayscale.
    def histeq_sobel(c):
        g = ipt.grayscale(c)
        return ipt.sobel(ipt.equalize_histogram(g))

    out = histeq_sobel(img)
    exp = golden.sobel(golden.equalize_histogram(gray))
    sec = device_loop_rate(histeq_sobel, img, iters=5)
    report["4_histeq_sobel_4k"] = {
        "maxdiff": _maxdiff(out, exp),
        "budget": 9,  # equalize +-1 amplified by sobel's gradient taps
        "mpix_per_s": round(img.shape[0] * img.shape[1] / sec / 1e6, 1),
    }

    # 5. batched vmapped decode->filter->encode, sharded over the mesh.
    import jax

    from imageprocessingtools_tpu.parallel import batched_fused_pipeline, default_mesh

    n = len(jax.devices())
    batch = np.stack([_img(*dims_1080, seed=10 + i) for i in range(2 * n)])
    outs = np.asarray(batched_fused_pipeline(batch, mesh=default_mesh()))
    single = np.asarray(
        __import__(
            "imageprocessingtools_tpu.kernels.fused", fromlist=["fused_pipeline_xla"]
        ).fused_pipeline_xla(batch[0])
    )
    report["5_batched_sharded"] = {
        "devices": n,
        "batch": int(batch.shape[0]),
        "matches_single_device": bool((outs[0] == single).all()),
        "note": (
            "this environment exposes ONE real TPU chip, so on hardware "
            "this config exercises the batched/vmapped path on a 1-device "
            "mesh only; actual multi-device sharding (DP x SP, halo "
            "exchange, row-group split) is validated on the 8-virtual-"
            "device CPU mesh by dryrun_multichip and MULTICHIP_HLO_r03"
            if n == 1 else "sharded over %d devices" % n
        ),
    }

    # 6. REFERENCE op: arbitrary rotation (blocked MXU path). Parity vs the
    # golden f64 oracle at 1080p (zones exact, interior +-1); rate at 4K.
    from imageprocessingtools_tpu.ops import _exact, geometry

    img = _img(*dims_1080, seed=6)
    out = np.asarray(ipt.rotate(img, 30))
    exp = golden.rotate(img, 30)
    rp = _exact.plan_rotation(*dims_1080, 30.0)
    nonint = ~rp.interior
    zones_exact = bool(
        (out[nonint] == exp[nonint]).all()
    )
    img4k = _img(*dims_4k, seed=6)
    sec = device_loop_rate(lambda c: ipt.rotate(c, 30), img4k, iters=3)
    report["6_rotate30"] = {
        "maxdiff": _maxdiff(out, exp),
        "budget": 1,
        "zones_exact": zones_exact,
        "blocked_path": geometry._blocked_plan(*dims_1080, 30.0) is not None,
        "mpix_per_s_4k": round(img4k.shape[0] * img4k.shape[1] / sec / 1e6, 1),
    }

    # 6b. Same op through the Pallas per-tile-DMA kernel (the opt-in
    # IPT_PALLAS_ROTATE=1 dispatch target); parity at 1080p, rate at 4K.
    from imageprocessingtools_tpu.kernels.pallas_rotate import (
        rotate_blocked_pallas,
    )

    pout = rotate_blocked_pallas(img, 30)
    if pout is not None:
        pd = _maxdiff(pout, exp)
        sec = device_loop_rate(
            lambda c: rotate_blocked_pallas(c, 30), img4k, iters=3)
        report["6b_rotate30_pallas"] = {
            "maxdiff": pd,
            "budget": 1,
            "mpix_per_s_4k": round(
                img4k.shape[0] * img4k.shape[1] / sec / 1e6, 1),
        }

    # 7. REFERENCE op: bicubic resize 4K -> 1920 (MXU matmuls), budget +-1.
    new_w = dims_4k[1] // 2
    out = np.asarray(ipt.resize_width(img4k, new_w))
    exp = golden.resize_width(img4k, new_w)
    sec = device_loop_rate(lambda c: ipt.resize_width(c, new_w), img4k, iters=5)
    report["7_resize_4k_to_half"] = {
        "maxdiff": _maxdiff(out, exp),
        "budget": 1,
        "mpix_per_s_input": round(img4k.shape[0] * img4k.shape[1] / sec / 1e6, 1),
    }

    # 8. REFERENCE exact ops at 4K: bit-exact, gray rate as representative.
    checks = {
        "gray": (ipt.grayscale, golden.grayscale),
        "mono": (ipt.mono_dither, golden.mono_dither),
        "flip_v": (ipt.flip_vertical, golden.flip_vertical),
        "flip_h": (ipt.flip_horizontal, golden.flip_horizontal),
        "rot90": (lambda c: ipt.rotate(c, 90), golden.rotate90),
    }
    md = {k: _maxdiff(dev(img4k), gold(img4k)) for k, (dev, gold) in checks.items()}
    sec = device_loop_rate(ipt.grayscale, img4k, iters=10)
    report["8_exact_ops_4k"] = {
        "maxdiff": md,
        "expect": 0,
        "gray_mpix_per_s": round(img4k.shape[0] * img4k.shape[1] / sec / 1e6, 1),
    }

    # 9. PRESET pipelines (models/ surface) at 1080p: the three
    # integer-exact presets vs their golden compositions (thumbnail is the
    # +-1 resize, covered by config 7's budget); rates in PRESETS_r03.json.
    from imageprocessingtools_tpu.models import PRESETS

    img1080 = _img(1080, 1920, seed=6)
    g = golden.grayscale(img1080)
    preset_golden = {
        "edge_detect": golden.sobel(golden.gaussian_blur(g)),
        "enhance": golden.sharpen(golden.equalize_histogram(g)),
        "print_ready": golden.mono_dither(np.broadcast_to(
            golden.equalize_histogram(g)[..., None], g.shape + (3,))),
    }
    report["9_presets_1080p"] = {
        "maxdiff": {
            name: _maxdiff(np.asarray(PRESETS[name](img1080)), exp)
            for name, exp in preset_golden.items()
        },
        "expect": 0,
    }

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
