"""Preset-pipeline device throughput (run on TPU:
`python tools/profile_presets.py`).

Same window-robust methodology as tools/profile_ops.py: every preset is
measured in N_PASSES spaced passes with the on-device fori_loop harness
(`utils.timing.device_loop_rate` — the only reliable measure through the
axon tunnel), and each row reports the MIN across passes plus the raw
per-pass values and spread. Writes PRESETS_r03.json.

`thumbnail` resizes 1080p -> 256-wide (shape-changing), so its loop
feedback uses the harness's scalar-reduction path: the original input is
carried forward xor'd with a sum over the output — every output element is
consumed (no dead-code narrowing) at ~one elementwise pass of feedback
cost, instead of the ~7.6 ms ravel/tile reconstruction the first committed
run paid.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from imageprocessingtools_tpu.models import PRESETS
from imageprocessingtools_tpu.utils.timing import device_loop_rate

H, W = 1080, 1920  # serving-typical shape; presets are batched there
N_PASSES = 5
PASS_GAP_S = 8.0


def main() -> None:
    import jax

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    rows: dict[str, dict] = {}
    passes: dict[str, list[float]] = {name: [] for name in PRESETS}
    for p in range(N_PASSES):
        if p:
            time.sleep(PASS_GAP_S)
        for name, fn in PRESETS.items():
            # iters=200: the 0-iter baseline fluctuates by ~ms between
            # contention windows; at 200 iterations that noise contributes
            # <= ~0.01 ms/iter, keeping sub-0.2 ms presets above it.
            sec = device_loop_rate(fn, img, iters=200, repeats=3)
            passes[name].append(round(sec * 1e3, 3))
    for name in PRESETS:
        # The harness's 0-iter baseline can land in a different contention
        # window and underflow a pass to ~0 (CLAUDE.md lore); such passes
        # are not real and are excluded from the min.
        real = [v for v in passes[name] if v >= 0.005] or passes[name]
        ms = min(real)
        rows[name] = {
            "ms": ms,
            "mpix_per_s": round(H * W / (max(ms, 1e-6) * 1e-3) / 1e6, 1),
            "passes_ms": passes[name],
            "spread_max_over_min": round(max(real) / max(ms, 1e-9), 2),
        }
        if len(real) != len(passes[name]):
            rows[name]["underflow_passes_excluded"] = (
                len(passes[name]) - len(real)
            )
    rows["thumbnail"]["note"] = (
        "shape-changing output: measured with the harness's "
        "scalar-reduction feedback (input xor sum(output) — all output "
        "elements consumed, ~one elementwise pass of feedback cost) "
        "instead of the ravel/tile reconstruction the first committed "
        "run paid (2.31 ms then vs this row now)"
    )
    doc = {
        "date": time.strftime("%Y-%m-%d"),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "dims": [H, W],
        "method": (
            f"on-device fori_loop harness (utils.timing.device_loop_rate), "
            f"min over {N_PASSES} passes spaced {PASS_GAP_S}s apart "
            f"(time-shared slice; see CLAUDE.md)"
        ),
        "presets": rows,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PRESETS_r03.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()
