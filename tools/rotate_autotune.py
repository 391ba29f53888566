"""Per-angle-regime (G, L) tile probe for the blocked MXU rotation.

The blocked rotation's source-block shape (bh, bw — hence the matmul K and
the per-tile fixed cost) is a function of the FOLDED angle, so the best
output tile (G, L) differs per angle regime: the static (16, 128) won the
round-2 probe at 4K/30deg but e.g. wide-block regimes prefer different
shapes. This tool probes each 10-degree folded-angle bucket ON HARDWARE
with a small (G, L) grid, same-run, and writes
`imageprocessingtools_tpu/kernels/rotate_tuning.json`, which
`ops.geometry.rotate` consults per angle bucket (TPU backend, >= 1.5 MPix
images) and `kernels.pallas_rotate.pallas_profitable` uses as a veto.

Methodology: eager jitted dispatch + dependent tiny fetch, min over
REPEATS per config, all configs of a bucket measured back-to-back in one
run (only same-run comparisons are valid on this time-shared slice). The
tunnel RTT floor is common to every config and is also reported via a
no-op dispatch baseline. A fori_loop harness would exclude the RTT, but
its XLA compile for rotation-inside-loop programs takes >10 min per
(angle, G, L) here — 45 of those don't fit a round; min-over-repeats
eager ranking is what the table needs. Every probed config includes the
static default, so the routed path is >= 1.0x the untuned XLA path by
construction (modulo window noise). The JSON is written incrementally
after every bucket.

    python tools/rotate_autotune.py [--out .../rotate_tuning.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from imageprocessingtools_tpu.ops import geometry

H, W = 2160, 3840
# Representative CLI angle per folded bucket [10b, 10b+10); the bucket is
# what the lookup keys on, so one representative suffices (bh/bw vary
# smoothly within a bucket).
BUCKET_REPS = {0: 5, 1: 15, 2: 25, 3: 30, 4: 45, 5: 55, 6: 60, 7: 75, 8: 85}
CONFIGS = [(16, 128), (8, 128), (32, 128), (8, 256), (16, 256)]
DEFAULT = (16, 128)


def _fetch(x) -> None:
    np.asarray(jnp.ravel(x)[:1])


def probe_ms(img, angle: float, G: int, L: int, repeats: int) -> float | None:
    out = geometry._rotate_blocked(img, float(angle), G, L)
    if out is None:
        return None
    _fetch(out)  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = geometry._rotate_blocked(img, float(angle), G, L)
        _fetch(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "imageprocessingtools_tpu", "kernels", "rotate_tuning.json"),
    )
    ap.add_argument("--repeats", type=int, default=12)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8))

    noop = jax.jit(lambda x: x[:1, :1, :1] + 1)
    _fetch(noop(img))
    samples = []
    for _ in range(10):
        t0 = time.perf_counter()
        _fetch(noop(img))
        samples.append(time.perf_counter() - t0)
    rtt_ms = round(min(samples) * 1e3, 2)

    table = {
        "probed": {
            "backend": jax.default_backend(),
            "dims": [H, W],
            "date": time.strftime("%Y-%m-%d"),
            "configs": CONFIGS,
            "method": "eager jitted dispatch + tiny fetch, min over "
                      f"{args.repeats} repeats, same-run per bucket",
            "dispatch_rtt_floor_ms": rtt_ms,
        },
        "buckets": {},
    }

    def flush():
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2)

    flush()
    for bucket, angle in sorted(BUCKET_REPS.items()):
        rows = {}
        for G, L in CONFIGS:
            ms = probe_ms(img, angle, G, L, args.repeats)
            if ms is None:
                continue
            rows[f"{G}x{L}"] = round(ms, 2)
            print(f"bucket {bucket} (angle {angle}): G={G} L={L} "
                  f"{ms:.1f} ms", flush=True)
        if not rows:
            continue
        best = min(rows, key=rows.get)
        bg, bl = (int(t) for t in best.split("x"))
        ent = {
            "G": bg, "L": bl,
            "ms": rows[best],
            "default_ms": rows.get(f"{DEFAULT[0]}x{DEFAULT[1]}"),
            "rep_angle": angle,
            "all_ms": rows,
        }
        table["buckets"][str(bucket)] = ent
        flush()
        print(f"bucket {bucket}: best {best} ({rows[best]} ms, default "
              f"{ent['default_ms']} ms)", flush=True)

    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
