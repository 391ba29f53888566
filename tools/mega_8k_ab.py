"""8K mega-kernel receipt (round 5): the H*W >= 2^24 cap is lifted.

Round 4's mega kernel silently fell back to the two-step path above 2^24
pixels because the in-kernel f32 bins would lose integer exactness; round
5 accumulates the cross-grid-step histogram in int32 (per-step counts are
f32-exact: <= tile pixels < 2^24 per bin), so an 8K frame (7680x4320 =
33.2 MPix) runs the one-pass flagship.

This tool produces the "done" evidence on hardware:
  1. bit-identity at 7680x4320: one-pass mega == two-step fallback ==
     XLA pipeline (full equalize output AND raw histogram);
  2. interleaved same-window A/B (mega_rank protocol: every round visits
     all contenders back-to-back, aggregate per-round ranks + median
     ratios) of the one-pass form vs the round-4 two-step fallback.

    python tools/mega_8k_ab.py > MEGA_8K_r05.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from imageprocessingtools_tpu.kernels.fused import (
    fused_pipeline_pallas_mega,
    fused_pipeline_xla,
)
from imageprocessingtools_tpu.kernels.pallas_core import (
    gray_gauss_hist_pallas,
    gray_gauss_pallas,
    lut_apply_pallas,
)
from imageprocessingtools_tpu.ops.histogram import _equalize_lut, histogram
from imageprocessingtools_tpu.utils.timing import device_loop_rate

H, W = 4320, 7680  # 8K UHD-2: 33.2 MPix, 2x the old 2^24 cap


def two_step(img):
    """The round-4 >= 2^24 fallback, inlined: separate blur + XLA hist."""
    blurred = gray_gauss_pallas(img)
    lut = _equalize_lut(histogram(blurred), H * W)
    return lut_apply_pallas(blurred, lut)


def main() -> None:
    rng = np.random.default_rng(5)
    host = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    img = jax.device_put(host)

    doc: dict = {"shape": [H, W, 3], "mpix": round(H * W / 1e6, 1),
                 "backend": jax.default_backend()}

    t0 = time.time()
    blurred_mega, hist_mega = gray_gauss_hist_pallas(img)
    hist_mega = np.asarray(hist_mega)
    blurred_mega = np.asarray(blurred_mega)
    doc["mega_compile_plus_first_dispatch_s"] = round(time.time() - t0, 1)
    blurred_ref = np.asarray(gray_gauss_pallas(img))
    hist_ref = np.asarray(histogram(jax.device_put(blurred_ref)))
    doc["bit_identity"] = {
        "blurred": bool((blurred_mega == blurred_ref).all()),
        "histogram": bool((hist_mega == hist_ref).all()),
        "hist_sum_equals_pixels": int(hist_mega.sum()) == H * W,
    }
    out_mega = np.asarray(jax.jit(fused_pipeline_pallas_mega)(img))
    out_two = np.asarray(jax.jit(two_step)(img))
    out_xla = np.asarray(jax.jit(fused_pipeline_xla)(img))
    doc["bit_identity"]["pipeline_mega_vs_two_step"] = bool(
        (out_mega == out_two).all())
    doc["bit_identity"]["pipeline_mega_vs_xla"] = bool(
        (out_mega == out_xla).all())
    if not all(doc["bit_identity"].values()):
        json.dump(doc, sys.stdout, indent=2)
        print()
        sys.exit(1)
    print("bit-identity ok at 8K", file=sys.stderr, flush=True)

    configs = {
        "mega_one_pass": fused_pipeline_pallas_mega,
        "two_step_fallback": two_step,
        "xla_pipeline": fused_pipeline_xla,
    }
    for fn in configs.values():  # warm the loop harness compiles
        device_loop_rate(fn, img, iters=2, repeats=1)
    rounds = 10
    times: dict[str, list[float]] = {n: [] for n in configs}
    t0 = time.time()
    for r in range(rounds):
        for n, fn in configs.items():
            times[n].append(
                device_loop_rate(fn, img, iters=6, repeats=1) * 1e3)
        print(f"round {r}: " + "  ".join(
            f"{n}={times[n][-1]:.2f}" for n in configs),
            file=sys.stderr, flush=True)
    doc["rounds"] = rounds
    doc["ab_wall_s"] = round(time.time() - t0, 1)
    names = list(configs)
    arr = {n: np.array(times[n]) for n in names}
    order = np.zeros((rounds, len(names)))
    for r in range(rounds):
        vals = np.array([arr[n][r] for n in names])
        order[r] = vals.argsort().argsort()
    doc["report"] = {}
    for i, n in enumerate(names):
        ratios = arr[n] / arr["two_step_fallback"]
        doc["report"][n] = {
            "min_ms": round(float(arr[n].min()), 3),
            "median_ms": round(float(np.median(arr[n])), 3),
            "mean_rank": round(float(order[:, i].mean()), 2),
            "median_ratio_vs_two_step": round(float(np.median(ratios)), 3),
            "wins_vs_two_step": int((ratios < 1.0).sum()),
        }
    md = doc["report"]["mega_one_pass"]["median_ms"]
    doc["mega_gpix_s_median"] = round(H * W / (md * 1e-3) / 1e9, 2)
    json.dump(doc, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
