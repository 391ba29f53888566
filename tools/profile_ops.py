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


def main() -> None:
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    mpix = H * W / 1e6

    ops = [
        ("grayscale", lambda c: ipt.grayscale(c)),
        ("mono_dither", lambda c: ipt.mono_dither(c)),
        ("flip_v", lambda c: ipt.flip_vertical(c)),
        ("rot90", lambda c: ipt.rotate(c, 90)),
        ("resize->1920", lambda c: ipt.resize_width(c, 1920)),
        ("invert", lambda c: ipt.invert(c)),
        ("gray+box", lambda c: ipt.box_blur(ipt.grayscale(c))),
        ("gray+gauss5", lambda c: ipt.gaussian_blur(ipt.grayscale(c))),
        ("gray+sobel", lambda c: ipt.sobel(ipt.grayscale(c))),
        ("gray+equalize", lambda c: ipt.equalize_histogram(ipt.grayscale(c))),
        ("fused XLA", fused_pipeline_xla),
        ("fused pallas", fused_pipeline_pallas),
    ]
    for name, body in ops:
        try:
            sec = device_loop_rate(body, img, iters=10)
            print(f"{name:16s} {sec * 1e3:9.3f} ms  {mpix / sec / 1e3:8.2f} GPix/s")
        except Exception as e:  # keep profiling resilient per-op
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
