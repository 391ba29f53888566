"""Per-op device throughput table (run on TPU: `python tools/profile_ops.py`).

Prints one line per op: ms/iter and GPix/s over a 4K input, measured with
the on-device loop harness (see utils/timing.py for methodology).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import imageprocessingtools_tpu as ipt
from imageprocessingtools_tpu.kernels.fused import (
    fused_pipeline_pallas,
    fused_pipeline_xla,
)
from imageprocessingtools_tpu.utils.timing import device_loop_rate

H, W = 2160, 3840


# Measured C reference wall times at 4K, seconds (BASELINE.md; end-to-end
# incl. its fwrite-bound encoder — the reference has no op-only mode).
_C_BASELINE_S = {
    "grayscale": 5.094,
    "mono_dither": 0.159,
    "flip_v": 0.714,
    "flip_h": 0.683,
    "rot90": 2.936,
    "rotate30": 9.360,
    "resize->1920": 0.436,
}


def main() -> None:
    import json

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    mpix = H * W / 1e6

    ops = [
        ("grayscale", lambda c: ipt.grayscale(c)),
        ("mono_dither", lambda c: ipt.mono_dither(c)),
        ("flip_v", lambda c: ipt.flip_vertical(c)),
        ("flip_h", lambda c: ipt.flip_horizontal(c)),
        ("rot90", lambda c: ipt.rotate(c, 90)),
        ("rotate30", lambda c: ipt.rotate(c, 30)),
        ("rotate_fast30", lambda c: ipt.rotate_fast(c, 30)),
        ("resize->1920", lambda c: ipt.resize_width(c, 1920)),
        ("invert", lambda c: ipt.invert(c)),
        ("brightness", lambda c: ipt.brightness(c, 25)),
        ("contrast", lambda c: ipt.contrast(c, 1.4)),
        ("threshold", lambda c: ipt.threshold(c, 128)),
        ("gray+box", lambda c: ipt.box_blur(ipt.grayscale(c))),
        ("gray+sharpen", lambda c: ipt.sharpen(ipt.grayscale(c))),
        ("gray+gauss5", lambda c: ipt.gaussian_blur(ipt.grayscale(c))),
        ("gray+sobel", lambda c: ipt.sobel(ipt.grayscale(c))),
        ("gray+equalize", lambda c: ipt.equalize_histogram(ipt.grayscale(c))),
        ("fused XLA", fused_pipeline_xla),
        ("fused pallas", fused_pipeline_pallas),
    ]
    table = {}
    for name, body in ops:
        try:
            iters = 3 if "rotate" in name else 10
            sec = device_loop_rate(body, img, iters=iters)
            row = {
                "ms": round(sec * 1e3, 3),
                "gpix_per_s": round(mpix / sec / 1e3, 3),
            }
            if name in _C_BASELINE_S:
                row["c_reference_s"] = _C_BASELINE_S[name]
                row["vs_c_same_work"] = round(_C_BASELINE_S[name] / sec, 1)
            table[name] = row
            print(f"{name:16s} {sec * 1e3:9.3f} ms  {mpix / sec / 1e3:8.2f} GPix/s"
                  + (f"  ({row['vs_c_same_work']}x C)" if name in _C_BASELINE_S else ""))
        except Exception as e:  # keep profiling resilient per-op
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}")
            table[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
    if "--json" in sys.argv:
        out = {
            "note": ("per-op device rates at 4K, on-device loop harness; "
                     "C reference numbers are end-to-end CLI wall times "
                     "(BASELINE.md) on the 1-vCPU host — same work per "
                     "image, the C has no op-only mode. The chip is a "
                     "time-shared slice; rates vary between windows."),
            "dims": [H, W],
            "ops": table,
        }
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
