"""Rotation tile re-tune with the RANK protocol (round 5, VERDICT #4).

The round-3 `rotate_tuning.json` winners came from eager jitted dispatch +
min-over-12 — the methodology CLAUDE.md's own lore calls worthless on this
time-shared slice (margins of 3-7 ms under a ~28 ms RTT floor). This tool
re-runs the 9-bucket sweep with mega_rank's method: every round visits ALL
configs back-to-back (shared contention window) inside the fori_loop
harness, aggregated by per-round ranks + median ratios.

Two paths per bucket:
- XLA blocked: (G, L) in (16,128) / (8,128) / (32,128) — the round-3
  256-lane configs lost every bucket by wide margins and are dropped.
- Pallas kernel (where `pallas_profitable` and the plan fits): the
  shipped config vs a (32,128) tile, probed at the rep angle; buckets 3/4
  include the literal 45 and 135 deg worst cases from
  ROTATE_INLOOP_AB_r03.

Caveat (documented in the output): XLA in-loop compiles are angle-
dependent (>10 min at angle 5, CLAUDE.md); each bucket runs in THIS
process guarded by --bucket selection so a driver can bound it, and falls
back to an interleaved EAGER-rank (still rank-protocol: all configs per
round back-to-back; dispatch RTT is common-mode) when IPT_TUNE_EAGER=1.

    python tools/rotate_tune_rank.py [--angles 5 15 ...] \
        > ROTATE_TUNE_RANK_r05.json
Then merge winners:  python tools/rotate_tune_rank.py --merge \
        ROTATE_TUNE_RANK_r05.json  (rewrites kernels/rotate_tuning.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 2160, 3840
XLA_CONFIGS = [(16, 128), (8, 128), (32, 128)]
PALLAS_ANGLES = {30.0, 45.0, 135.0}
PALLAS_CONFIGS = [(16, 128), (32, 128)]
DEFAULT_ANGLES = [5.0, 15.0, 25.0, 30.0, 45.0, 55.0, 60.0, 75.0, 85.0, 135.0]
ROUNDS = 7


UNDERFLOW_FLOOR_MS = 1.0  # a 4K rotation cannot run in <1 ms on this chip;
                          # readings below this are the documented 0-iter
                          # baseline underflow (CLAUDE.md: the baseline and
                          # the timed loop can land in different contention
                          # windows). A 0.0 reading would falsely grab
                          # rank-first, so it is RETRIED, not absorbed.


def _rank_rounds(configs: dict, img, rounds: int, eager: bool) -> dict:
    import jax

    from imageprocessingtools_tpu.utils.timing import (
        device_loop_rate, dispatch_time,
    )

    def measure(fn):
        t = 0.0
        for _ in range(4):  # retry underflow readings (see UNDERFLOW_FLOOR)
            if eager:
                t = dispatch_time(fn, jax.device_put(img), repeats=2) * 1e3
            else:
                t = device_loop_rate(fn, img, iters=3, repeats=1) * 1e3
            if t >= UNDERFLOW_FLOOR_MS:
                return t
        return t

    times = {n: [] for n in configs}
    for n, fn in configs.items():  # warm/compile
        if eager:
            dispatch_time(fn, jax.device_put(img), repeats=1)
        else:
            device_loop_rate(fn, img, iters=2, repeats=1)
    for r in range(rounds):
        for n, fn in configs.items():
            times[n].append(measure(fn))
        print(f"  round {r}: " + "  ".join(
            f"{n}={times[n][-1]:.1f}" for n in configs),
            file=sys.stderr, flush=True)
    names = list(configs)
    arr = {n: np.array(times[n]) for n in names}
    order = np.zeros((rounds, len(names)))
    for r in range(rounds):
        vals = np.array([arr[n][r] for n in names])
        order[r] = vals.argsort().argsort()
    return {
        n: {
            "median_ms": round(float(np.median(arr[n])), 2),
            "min_ms": round(float(arr[n].min()), 2),
            "mean_rank": round(float(order[:, i].mean()), 2),
            "raw_ms": [round(float(t), 2) for t in arr[n]],
        }
        for i, n in enumerate(names)
    }


EAGER_ANGLES = {5.0, 85.0}  # in-loop jit at folded ~5 deg compiles >10 min
                            # (CLAUDE.md); these buckets use the eager rank
                            # fallback (RTT floor is common-mode across the
                            # interleaved configs).


def probe_angle(angle: float, eager: bool) -> dict:
    import imageprocessingtools_tpu  # noqa: F401  (backend init)
    from imageprocessingtools_tpu.ops import geometry as _g
    from imageprocessingtools_tpu.kernels import pallas_rotate as pr

    img = np.random.default_rng(int(angle)).integers(
        0, 256, (H, W, 3), dtype=np.uint8)
    configs = {}
    for (G, L) in XLA_CONFIGS:
        if _g._blocked_plan(H, W, angle, G, L) is not None:
            configs[f"xla_{G}x{L}"] = (
                lambda c, G=G, L=L: _g._rotate_blocked(c, angle, G=G, L=L))
    if angle in PALLAS_ANGLES:
        for (G, L) in PALLAS_CONFIGS:
            plan = pr._pallas_plan(H, W, angle, G, L)
            if plan is not None and plan[3] == 128:
                configs[f"pallas_{G}x{L}"] = (
                    lambda c, G=G, L=L: pr.rotate_blocked_pallas(
                        c, angle, G=G, L=L))
    eager = eager or angle in EAGER_ANGLES
    rep = _rank_rounds(configs, img, ROUNDS, eager)
    bucket = _g._tuning_bucket(angle)
    xla_best = min(
        (v["mean_rank"], n) for n, v in rep.items() if n.startswith("xla"))
    out = {"angle": angle, "bucket": bucket, "report": rep,
           "xla_winner": xla_best[1],
           "method": "eager ranks" if eager else "in-loop ranks"}
    pall = [(v["mean_rank"], v["median_ms"], n)
            for n, v in rep.items() if n.startswith("pallas")]
    if pall:
        pall.sort()
        out["pallas_winner"] = pall[0][2]
        xw = rep[xla_best[1]]["median_ms"]
        out["pallas_vs_xla_median_ratio"] = round(pall[0][1] / xw, 3)
    return out


def merge(path: str) -> None:
    """Fold winners into kernels/rotate_tuning.json (schema v2)."""
    from imageprocessingtools_tpu.ops import geometry as _g

    with open(path) as f:
        doc = json.load(f)
    table = {"probed": doc["probed"], "buckets": {}}
    for row in doc["angles"]:
        b = row["bucket"]
        ent = table["buckets"].setdefault(b, {})
        gx, lx = row["xla_winner"].removeprefix("xla_").split("x")
        # A bucket probed at two angles (45 + 135 both fold to bucket 4):
        # the XLA entry keeps the first probe's winner (all_ms records it).
        if "G" not in ent:
            ent.update(G=int(gx), L=int(lx), rep_angle=row["angle"],
                       ms=row["report"][row["xla_winner"]]["median_ms"],
                       default_ms=row["report"].get(
                           "xla_16x128", {}).get("median_ms"),
                       all_ms={n: v["median_ms"]
                               for n, v in row["report"].items()})
        if "pallas_winner" in row:
            # A bucket probed at two angles (45 + 135 both fold to 4): keep
            # the WORSE ratio — the dispatch gate must respect the worst
            # probed case in the bucket.
            prev = ent.get("pallas", {}).get("vs_xla_median_ratio", -1.0)
            if row["pallas_vs_xla_median_ratio"] >= prev:
                gp, lp = row["pallas_winner"].removeprefix(
                    "pallas_").split("x")
                ent["pallas"] = {
                    "G": int(gp), "L": int(lp),
                    "vs_xla_median_ratio": row["pallas_vs_xla_median_ratio"],
                    "rep_angle": row["angle"],
                }
                ent["pallas_ok"] = row["pallas_vs_xla_median_ratio"] <= 1.02
    with open(_g._TUNING_PATH, "w") as f:
        json.dump(table, f, indent=2)
        f.write("\n")
    print(f"wrote {_g._TUNING_PATH}: {sorted(table['buckets'])}")


def main() -> None:
    if "--merge" in sys.argv:
        merge(sys.argv[sys.argv.index("--merge") + 1])
        return
    angles = DEFAULT_ANGLES
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if "--angles" in sys.argv:
        angles = [float(a) for a in sys.argv[sys.argv.index("--angles") + 1:]]
    eager = os.environ.get("IPT_TUNE_EAGER") == "1"
    doc = {
        "date": time.strftime("%Y-%m-%d"),
        "probed": {
            "dims": [H, W],
            "method": ("interleaved EAGER ranks (common-mode RTT)" if eager
                       else "in-loop ranks (device_loop_rate, fori_loop "
                            "harness), all configs back-to-back per round; "
                            "folded-~5deg angles fall back to eager ranks "
                            "(in-loop compile >10 min there, CLAUDE.md) — "
                            "per-row 'method' field records which; "
                            "sub-1ms baseline-underflow readings retried "
                            "(they would falsely grab rank-first)"),
            "rounds": ROUNDS,
        },
        "angles": [],
    }
    import jax

    doc["probed"]["backend"] = jax.default_backend()
    for a in angles:
        print(f"angle {a}:", file=sys.stderr, flush=True)
        t0 = time.time()
        row = probe_angle(a, eager)
        row["wall_s"] = round(time.time() - t0, 1)
        doc["angles"].append(row)
        if out_path:  # incremental: an interruption keeps finished angles
            with open(out_path, "w") as f:
                json.dump(doc, f, indent=2)
                f.write("\n")
    json.dump(doc, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
