"""Autotune the flagship mega-kernel: block_rows sweep + LUT-stage choice.

Same-run interleaved A/B at 4K on the real chip (the slice is time-shared,
so only same-run comparisons are load-bearing; drift is cancelled by
visiting every config in each round and taking per-config minima).

Variants:
  - mega[br] + XLA nibble LUT apply   (the shipped flagship, br=16 default)
  - mega[best br] + Pallas LUT kernel (PROFILE_r03: LUT pallas 0.13 ms vs
    XLA 0.28 — the mega pipeline never picked the faster one up)
  - fused XLA pipeline                (reference)

Every variant is checked bit-identical to fused_pipeline_xla before it is
timed. Emits one JSON document (commit as MEGA_TUNE_r03.json).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax

from imageprocessingtools_tpu.kernels.fused import fused_pipeline_xla
from imageprocessingtools_tpu.kernels.pallas_core import (
    gray_gauss_hist_pallas,
    lut_apply_pallas,
)
from imageprocessingtools_tpu.ops.histogram import _equalize_lut, apply_lut
from imageprocessingtools_tpu.utils.timing import device_loop_rate

H, W = 2160, 3840


def mega_pipeline(br: int | None, pallas_lut: bool, hist_from_reg: bool = False):
    def f(img):
        blurred, hist = gray_gauss_hist_pallas(
            img, block_rows=br, hist_from_reg=hist_from_reg)
        n_pixels = 1
        for d in blurred.shape:
            n_pixels *= int(d)
        lut = _equalize_lut(hist, n_pixels)
        if pallas_lut:
            return lut_apply_pallas(blurred, lut)
        return apply_lut(blurred, lut)

    return f


def main() -> None:
    rng = np.random.default_rng(3)
    img_np = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    img = jax.device_put(img_np)
    ref = np.asarray(jax.jit(fused_pipeline_xla)(img))

    configs: dict[str, object] = {"xla_pipeline": jax.jit(fused_pipeline_xla)}
    for br in (8, 16, 24, 32, 48, 64):
        configs[f"mega_br{br}"] = mega_pipeline(br, pallas_lut=False)
    # the best-br + Pallas-LUT variant is measured after the sweep below

    report: dict[str, dict] = {}
    rates: dict[str, float] = {}

    def measure(name, fn, rounds=4, iters=8):
        # parity gate first (also compiles everything outside the timed loop)
        try:
            out = np.asarray(jax.jit(fn)(img))
        except Exception as e:  # Mosaic VMEM blowups etc: record, skip
            report[name] = {"error": str(e)[:300]}
            print(f"{name}: COMPILE/RUN FAILED: {str(e)[:120]}", flush=True)
            return None
        bit_identical = bool((out == ref).all())
        secs = []
        for _ in range(rounds):
            secs.append(device_loop_rate(fn, img, iters=iters, repeats=1))
        best_ms = min(secs) * 1e3
        report[name] = {
            "bit_identical": bit_identical,
            "ms_per_image": round(best_ms, 3),
            "rounds_ms": [round(s * 1e3, 3) for s in secs],
        }
        rates[name] = best_ms
        print(f"{name}: {best_ms:.3f} ms  bit_identical={bit_identical}",
              flush=True)
        return best_ms

    # Interleave: one warm measurement pass visits every config per round so
    # a contended window cannot bias a single config.
    t0 = time.time()
    for name in list(configs):
        measure(name, configs[name], rounds=1, iters=4)  # compile + first row
    # refinement rounds, interleaved
    for rnd in range(3):
        for name in list(configs):
            if "error" in report.get(name, {}):
                continue
            fn = configs[name]
            s = device_loop_rate(fn, img, iters=8, repeats=1) * 1e3
            row = report[name]
            row["rounds_ms"].append(round(s, 3))
            if s < row["ms_per_image"]:
                row["ms_per_image"] = round(s, 3)
                rates[name] = s

    mega_rows = {k: v for k, v in rates.items() if k.startswith("mega_br")}
    best = min(mega_rows, key=mega_rows.get) if mega_rows else None
    if best is not None:
        best_br = int(best.removeprefix("mega_br"))
        name = f"mega_br{best_br}_pallas_lut"
        fn = mega_pipeline(best_br, pallas_lut=True)
        measure(name, fn, rounds=4, iters=8)

    doc = {
        "shape": [H, W, 3],
        "harness": "device_loop_rate (on-device fori_loop, stack+roll feedback), interleaved rounds, min per config",
        "wall_s": round(time.time() - t0, 1),
        "best_mega_br": best,
        "report": report,
    }
    json.dump(doc, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
