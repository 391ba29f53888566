"""Hardware A/B of the round-4 Pallas-rotation formulation variants.

VERDICT r03 item 2 asked for one more y-stage formulation round. The
literal ask — the y-combine as a second quantized MXU dot — is analyzed
in `kernels/pallas_rotate.py` (_VARIANTS comment): out[p] is a PER-COLUMN
weighted reduction diag(wy^T h); a real dot would compute the full
[GL, GL] product for its diagonal (2048x waste). What IS movable to the
MXU is the reduction itself ("ydot": ones-vector dot + lane-slice unflat
replacing G sliced sublane-reduction chains), and the selector-build
stage can halve its gather slabs ("packgather": one packed 16-bit table
for both x-tap levels). This tool ranks base / ydot / packgather / both
(plus the XLA blocked path as context) with the in-loop fori_loop
harness, interleaved rounds, per-round RANKS + median ratios — per-config
minima are worthless on this time-shared slice (CLAUDE.md lore).

    python tools/rotate_ystage_ab.py [n_rounds] [angle] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rounds = int(args[0]) if args else 7
    angle = float(args[1]) if len(args) > 1 else 30.0
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    from imageprocessingtools_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import imageprocessingtools_tpu as ipt
    from imageprocessingtools_tpu.kernels import pallas_rotate as pr
    from imageprocessingtools_tpu.utils.timing import device_loop_rate

    img = np.random.default_rng(0).integers(
        0, 256, (2160, 3840, 3), dtype=np.uint8)

    variant_sets = {
        "base": frozenset(),
        "ydot": frozenset({"ydot"}),
        "packgather": frozenset({"packgather"}),
        "both": frozenset({"ydot", "packgather"}),
    }

    def pallas_body(vname):
        def body(c):
            return pr.rotate_blocked_pallas(c, angle)
        return body

    # Warm every variant's Mosaic compile up front (first kernel in a
    # fresh process pays the 3-8 min toolchain warmup; later ones are
    # seconds — and the persistent cache above makes reruns ~1 s).
    compile_s = {}
    for vname, vs in variant_sets.items():
        pr._VARIANTS = vs
        t0 = time.perf_counter()
        out = pr.rotate_blocked_pallas(img, angle)
        assert out is not None
        np.asarray(out[:1, :1])
        compile_s[vname] = round(time.perf_counter() - t0, 1)
        print(f"warm {vname}: {compile_s[vname]} s", flush=True)

    names = list(variant_sets) + ["xla"]
    rows: dict[str, list[float]] = {n: [] for n in names}
    ranks: dict[str, list[int]] = {n: [] for n in names}
    for rnd in range(n_rounds):
        this = {}
        for vname, vs in variant_sets.items():
            pr._VARIANTS = vs
            this[vname] = device_loop_rate(
                pallas_body(vname), img, iters=3, repeats=2) * 1e3
        this["xla"] = device_loop_rate(
            lambda c: ipt.rotate(c, angle), img, iters=3, repeats=2) * 1e3
        order = sorted(this, key=this.get)
        for pos, n in enumerate(order):
            ranks[n].append(pos)
            rows[n].append(this[n])
        print(f"round {rnd}: " + ", ".join(
            f"{n} {this[n]:.1f}" for n in names), flush=True)
        time.sleep(4.0)

    def med(v):
        s = sorted(v)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    doc = {
        "date": time.strftime("%Y-%m-%d"),
        "angle": angle,
        "dims": [2160, 3840],
        "n_rounds": n_rounds,
        "harness": ("device_loop_rate fori_loop (iters=3, adjacent "
                    "baseline pairs), all configs visited back-to-back "
                    "per round; per-round ranks + medians per CLAUDE.md "
                    "contention lore"),
        "warm_first_call_s": compile_s,
        "median_ms": {n: round(med(v), 2) for n, v in rows.items()},
        "mean_rank": {n: round(sum(r) / len(r), 2) for n, r in ranks.items()},
        "rank_wins": {n: sum(1 for x in r if x == 0)
                      for n, r in ranks.items()},
        "passes_ms": {n: [round(x, 2) for x in v] for n, v in rows.items()},
    }
    text = json.dumps(doc, indent=2)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
