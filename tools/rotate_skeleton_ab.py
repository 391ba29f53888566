"""Round-5 attack on the Pallas rotation's DMA/grid skeleton (VERDICT #1).

The round-3 ablation attributed ~32 ms of the 4K/30deg dispatch to "DMA +
grid skeleton (unpipelined)" — per-grid-step fixed cost across ~8.3k
[16, 128] output tiles, not math. Contenders (all bit-identical to the
shipped kernel by construction — verified in interpret mode and gated
here on hardware):

  base       T=1 slots=2  (the shipped packgather kernel)
  T2         T=2 slots=2  two g-tiles per grid step: half the steps, the
                          geometry chain + selector gathers run once on
                          the [2G, L] union, per-tile dots keep K=128
  T4         T=4 slots=2  quarter the steps (VMEM-risk config)
  T2_s3      T=2 slots=3  plus one extra step of input-DMA slack
  outdma     T=1 slots=2  manual double-buffered output-write DMA
                          (out_ref in ANY) instead of the emitter's
  T2_outdma  T=2 slots=2  both
  xla        the blocked XLA path (context row)

Protocol: mega_rank's — every round visits all surviving configs
back-to-back inside the fori_loop harness (device_loop_rate; eager
dispatch carries ~48 ms of tunnel overhead which buried earlier deltas),
aggregate per-round ranks + median ratios vs base.

    python tools/rotate_skeleton_ab.py > ROTATE_SKELETON_AB_r05.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

import imageprocessingtools_tpu as ipt
from imageprocessingtools_tpu.kernels import pallas_rotate as pr
from imageprocessingtools_tpu.utils.timing import device_loop_rate

ANGLE = 30.0
PACK = frozenset({"packgather"})
PACK_ODMA = frozenset({"packgather", "outdma"})


def main() -> None:
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2160, 3840, 3), dtype=np.uint8)
    imgd = jax.device_put(img)

    def cfg(T, slots, var):
        return lambda c: pr.rotate_blocked_pallas(
            c, ANGLE, tiles_per_step=T, n_slots=slots, variants=var)

    configs = {
        "base": cfg(1, 2, PACK),
        "T2": cfg(2, 2, PACK),
        "T4": cfg(4, 2, PACK),
        "T2_s3": cfg(2, 3, PACK),
        "outdma": cfg(1, 2, PACK_ODMA),
        "T2_outdma": cfg(2, 2, PACK_ODMA),
        "xla": lambda c: ipt.rotate(c, ANGLE),
    }

    ref = np.asarray(configs["base"](imgd))
    doc: dict = {"angle": ANGLE, "shape": [2160, 3840, 3],
                 "backend": jax.default_backend(), "failed": {}}
    t0 = time.time()
    for n in list(configs):
        if n in ("base", "xla"):
            continue
        try:
            tc = time.time()
            out = np.asarray(configs[n](imgd))
            doc.setdefault("compile_s", {})[n] = round(time.time() - tc, 1)
            assert out.shape == ref.shape
            if not (out == ref).all():
                raise AssertionError(
                    f"not bit-identical to base: {int((out != ref).sum())} px")
        except Exception as e:
            doc["failed"][n] = str(e)[:300]
            del configs[n]
            print(f"{n}: DROPPED ({doc['failed'][n][:120]})",
                  file=sys.stderr, flush=True)
    names = list(configs)
    print(f"surviving: {names} (compile+gate {time.time() - t0:.0f}s)",
          file=sys.stderr, flush=True)

    for n in names:  # warm the loop harness compiles
        device_loop_rate(configs[n], img, iters=2, repeats=1)
    rounds = 9
    times: dict[str, list[float]] = {n: [] for n in names}
    t0 = time.time()
    for r in range(rounds):
        for n in names:
            times[n].append(
                device_loop_rate(configs[n], img, iters=4, repeats=1) * 1e3)
        print(f"round {r}: " + "  ".join(
            f"{n}={times[n][-1]:.2f}" for n in names),
            file=sys.stderr, flush=True)

    doc["rounds"] = rounds
    doc["ab_wall_s"] = round(time.time() - t0, 1)
    arr = {n: np.array(times[n]) for n in names}
    order = np.zeros((rounds, len(names)))
    for r in range(rounds):
        vals = np.array([arr[n][r] for n in names])
        order[r] = vals.argsort().argsort()
    doc["report"] = {}
    for i, n in enumerate(names):
        ratios = arr[n] / arr["base"]
        doc["report"][n] = {
            "min_ms": round(float(arr[n].min()), 2),
            "median_ms": round(float(np.median(arr[n])), 2),
            "mean_rank": round(float(order[:, i].mean()), 2),
            "median_ratio_vs_base": round(float(np.median(ratios)), 3),
            "wins_vs_base": int((ratios < 1.0).sum()),
        }
    json.dump(doc, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
