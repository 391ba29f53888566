"""Rank-based A/B for the mega-kernel contenders.

The slice's contention drifts on second scales, so per-config minima from
a sweep mislead (a lone calm window crowns a random config). Here every
round visits ALL configs back-to-back (so they share a window) and we
aggregate per-round RANKS plus per-round ratios vs the shipped flagship
(mega br=16 + XLA LUT). Many rounds make the rank statistics robust.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax

from imageprocessingtools_tpu.kernels.fused import fused_pipeline_xla
from tools.mega_autotune import mega_pipeline, H, W
from imageprocessingtools_tpu.utils.timing import device_loop_rate


def main() -> None:
    rng = np.random.default_rng(3)
    img = jax.device_put(rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8))
    ref = np.asarray(jax.jit(fused_pipeline_xla)(img))

    configs = {
        "flagship_br16_xla_lut": mega_pipeline(16, False),
        "br32_pallas_lut": mega_pipeline(32, True),
        "br32_pallas_lut_reghist": mega_pipeline(32, True, hist_from_reg=True),
        "br48_pallas_lut": mega_pipeline(48, True),
        "br64_pallas_lut": mega_pipeline(64, True),
        "br64_pallas_lut_reghist": mega_pipeline(64, True, hist_from_reg=True),
        "xla_pipeline": fused_pipeline_xla,
    }
    failed = {}
    for n in list(configs):  # compile + parity gate
        try:
            out = np.asarray(jax.jit(configs[n])(img))
            assert (out == ref).all(), f"{n}: NOT bit-identical"
            device_loop_rate(configs[n], img, iters=4, repeats=1)  # warm
        except Exception as e:
            failed[n] = str(e)[:200]
            del configs[n]
            print(f"{n}: DROPPED ({failed[n][:100]})", flush=True)
    names = list(configs)
    print("surviving configs bit-identical; warmed", flush=True)

    rounds = 14
    times: dict[str, list[float]] = {n: [] for n in names}
    t0 = time.time()
    for r in range(rounds):
        for n in names:
            s = device_loop_rate(configs[n], img, iters=8, repeats=1) * 1e3
            times[n].append(s)
        print(f"round {r}: " + "  ".join(f"{n}={times[n][-1]:.3f}" for n in names),
              flush=True)

    base = "flagship_br16_xla_lut"
    doc = {"shape": [H, W, 3], "rounds": rounds,
           "wall_s": round(time.time() - t0, 1), "failed": failed,
           "report": {}}
    arr = {n: np.array(times[n]) for n in names}
    order = np.zeros((rounds, len(names)))
    for r in range(rounds):
        vals = np.array([arr[n][r] for n in names])
        order[r] = vals.argsort().argsort()  # rank within the round
    for i, n in enumerate(names):
        ratios = arr[n] / arr[base]
        doc["report"][n] = {
            "min_ms": round(float(arr[n].min()), 3),
            "median_ms": round(float(np.median(arr[n])), 3),
            "mean_rank": round(float(order[:, i].mean()), 2),
            "median_ratio_vs_flagship": round(float(np.median(ratios)), 3),
            "wins_vs_flagship": int((ratios < 1.0).sum()),
        }
    json.dump(doc, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
