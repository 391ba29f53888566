"""In-loop rotation measurements: Pallas-vs-XLA A/B and per-angle costs.

Reproduces ROTATE_INLOOP_AB_r03.json. Everything runs inside the
fori_loop harness (utils.timing.device_loop_rate, validated in
FEEDBACK_VALIDATION_r03.json) so the ~48 ms/call eager-dispatch tunnel
overhead — which compressed the original dispatch-method A/B's delta to
~1.3 ms — never enters the numbers.

Usage (on the TPU backend):
    python tools/inloop_rotate_ab.py ab          # Pallas vs XLA at 4K/30
    python tools/inloop_rotate_ab.py angles 60 100 135 170

Caveat: only SOME angles compile inside fori_loop quickly (30/60/100/
135/170 all compile in under a minute; e.g. 5 deg exceeds 10 minutes —
bound each angle with an outer `timeout` if sweeping blind). The Pallas
kernel additionally pays its per-geometry Mosaic compile on first use
(minutes in a fresh process without the persistent compilation cache).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_PASSES = 5
PASS_GAP_S = 8.0


def _img():
    return np.random.default_rng(0).integers(
        0, 256, (2160, 3840, 3), dtype=np.uint8
    )


def run_ab() -> None:
    import imageprocessingtools_tpu as ipt
    from imageprocessingtools_tpu.kernels.pallas_rotate import (
        rotate_blocked_pallas,
    )
    from imageprocessingtools_tpu.utils.timing import device_loop_rate

    img = _img()
    rows = {"xla": [], "pallas": []}
    for p in range(N_PASSES):
        rows["xla"].append(
            device_loop_rate(lambda c: ipt.rotate(c, 30), img, iters=3, repeats=2)
            * 1e3
        )
        rows["pallas"].append(
            device_loop_rate(
                lambda c: rotate_blocked_pallas(c, 30), img, iters=3, repeats=2
            )
            * 1e3
        )
        print(
            f"pass {p}: xla {rows['xla'][-1]:.2f} ms, "
            f"pallas {rows['pallas'][-1]:.2f} ms",
            flush=True,
        )
        if p + 1 < N_PASSES:
            time.sleep(PASS_GAP_S)
    print(json.dumps({k: [round(v, 2) for v in vs] for k, vs in rows.items()}))
    print(
        f"min: xla {min(rows['xla']):.2f}, pallas {min(rows['pallas']):.2f}, "
        f"delta {min(rows['xla']) - min(rows['pallas']):.2f} ms"
    )


def run_angles(angles) -> None:
    import imageprocessingtools_tpu as ipt
    from imageprocessingtools_tpu.utils.timing import device_loop_rate

    img = _img()
    out = {}
    for angle in angles:
        vals = []
        for p in range(3):
            vals.append(
                device_loop_rate(
                    lambda c: ipt.rotate(c, angle), img, iters=3, repeats=2
                )
                * 1e3
            )
            if p < 2:
                time.sleep(6.0)
        out[str(angle)] = {
            "ms": round(min(vals), 2),
            "passes_ms": [round(v, 2) for v in vals],
        }
        print(angle, out[str(angle)], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if mode == "angles":
        run_angles([float(a) for a in sys.argv[2:]] or [60.0, 100.0, 135.0, 170.0])
    else:
        run_ab()
