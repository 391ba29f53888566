"""Preset-pipeline device throughput (run on TPU:
`python tools/profile_presets.py`).

Same window-robust methodology as tools/profile_ops.py: every preset is
measured in N_PASSES spaced passes with the on-device fori_loop harness
(`utils.timing.device_loop_rate` — the only reliable measure through the
axon tunnel), and each row reports the MIN across passes plus the raw
per-pass values and spread. Writes PRESETS_r03.json.

`thumbnail` resizes 1080p -> 256-wide, so its loop feedback rebuilds the
input from a smaller output (the harness's generic ravel/tile path); its
row therefore carries the documented feedback tax and is labeled.
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
            sec = device_loop_rate(fn, img, iters=20, repeats=3)
            passes[name].append(round(sec * 1e3, 3))
    for name in PRESETS:
        ms = min(passes[name])
        rows[name] = {
            "ms": ms,
            "mpix_per_s": round(H * W / (ms * 1e-3) / 1e6, 1),
            "passes_ms": passes[name],
            "spread_max_over_min": round(max(passes[name]) / max(ms, 1e-9), 2),
        }
    rows["thumbnail"]["note"] = (
        "output is 256-wide, so the loop feedback rebuilds the 1080p input "
        "via the harness's generic ravel/tile path — the row includes that "
        "feedback tax (the other presets use the cheap stack/roll feedback)"
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
