"""On-chip cost attribution for the Pallas blocked-rotation kernel.

Replaces one stage at a time with same-shape fakes (see
``kernels.pallas_rotate._ABLATE``) and times 4K/30deg same-run. The deltas
attribute wall time to: geometry, flatten+tables, selector gathers, the
second int8 dot, both dots, and the y-stage multiply+reduce.

Run ON the chip: ``python tools/ablate_pallas_rotate.py``. Numbers are only
comparable within one run (the slice is time-shared).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from imageprocessingtools_tpu.kernels import pallas_rotate as pr
from imageprocessingtools_tpu.utils.timing import device_loop_rate

CONFIGS = [
    ("full", frozenset()),
    ("no-ystage", frozenset({"ystage"})),
    ("no-build", frozenset({"build"})),
    ("no-flat+build", frozenset({"flat", "build"})),
    ("no-geom..build", frozenset({"geom", "flat", "build"})),
    ("no-dot2", frozenset({"dot2"})),
    ("skeleton", frozenset({"geom", "flat", "build", "dots", "ystage"})),
]


def main():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2160, 3840, 3), np.uint8)
    for name, members in CONFIGS:
        pr._ABLATE = members
        pr._build_call.cache_clear()
        t0 = time.time()
        s = device_loop_rate(
            lambda x: pr.rotate_blocked_pallas(x, 30), img, iters=10,
            repeats=3)
        print(f"{name:<18} {s * 1e3:6.1f} ms/iter "
              f"(compile+measure {time.time() - t0:.0f}s)", flush=True)
    pr._ABLATE = frozenset()
    pr._build_call.cache_clear()


if __name__ == "__main__":
    main()
