"""Skeleton A/B round 2: the SHARED-BLOCK DMA variant (VERDICT #1 cont.).

Round 1 (ROTATE_SKELETON_AB_r05.json, phase 1) measured the hypothesis
space: T2/T4 split-block multi-tile steps LOSE (per-step fixed cost ~0)
and outdma is a marginal rank-first winner — so the ~32 ms skeleton floor
is the input DMA itself (8.3k strided [96, 256]-byte block reads at ~24x
read amplification), not grid overhead. "sharedblk" attacks exactly that:
ONE union-block DMA per step covers T adjacent g-tiles (their blocks
overlap by bh - ~cos*G rows), cutting row-transactions to ~0.58x (T=2) /
~0.375x (T=4); the union needs 512 lanes (per-tile lane origins spread
past 256), so BYTE volume is 1.17x (T=2) / 0.75x (T=4) — the A/B decides
whether transactions or bytes bound the engine.

    python tools/rotate_skeleton_ab2.py > /tmp/skel2.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from imageprocessingtools_tpu.kernels import pallas_rotate as pr
from imageprocessingtools_tpu.utils.timing import device_loop_rate

ANGLE = 30.0
PACK = frozenset({"packgather"})
PACK_ODMA = frozenset({"packgather", "outdma"})
SH = frozenset({"packgather", "sharedblk"})
SH_ODMA = frozenset({"packgather", "sharedblk", "outdma"})


def main() -> None:
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2160, 3840, 3), dtype=np.uint8)
    imgd = jax.device_put(img)

    def cfg(T, slots, var):
        return lambda c: pr.rotate_blocked_pallas(
            c, ANGLE, tiles_per_step=T, n_slots=slots, variants=var)

    configs = {
        "base": cfg(1, 2, PACK),
        "outdma": cfg(1, 2, PACK_ODMA),
        "T2_shared": cfg(2, 2, SH),
        "T4_shared": cfg(4, 2, SH),
        "T4_shared_outdma": cfg(4, 2, SH_ODMA),
    }
    ref = np.asarray(configs["base"](imgd))
    doc: dict = {"angle": ANGLE, "shape": [2160, 3840, 3],
                 "backend": jax.default_backend(), "failed": {},
                 "compile_s": {}}
    for n in list(configs):
        if n == "base":
            continue
        try:
            tc = time.time()
            out = configs[n](imgd)
            assert out is not None, "plan unfit"
            out = np.asarray(out)
            doc["compile_s"][n] = round(time.time() - tc, 1)
            if not (out == ref).all():
                raise AssertionError(
                    f"not bit-identical to base: {int((out != ref).sum())} px")
        except Exception as e:
            doc["failed"][n] = str(e)[:300]
            del configs[n]
            print(f"{n}: DROPPED ({doc['failed'][n][:120]})",
                  file=sys.stderr, flush=True)
    names = list(configs)
    print(f"surviving: {names}", file=sys.stderr, flush=True)

    for n in names:
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
