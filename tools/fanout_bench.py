"""A/B: fan-out serving vs sequential single-preset passes, end to end.

Measures `serving.process_files` wall time over the same file set for
  A) ONE fan-out pass with ("edge_detect", "enhance", "print_ready")
  B) three sequential single-preset passes
on the default (TPU) backend. Through the axon tunnel the host->device
upload dominates end-to-end serving (CLAUDE.md: ~5-15 MB/s each way), so
the fan-out arm — which uploads each decoded chunk once instead of three
times — is expected to win by roughly the upload-share of the pipeline.

Methodology per CLAUDE.md: the slice is time-shared, so the two arms are
INTERLEAVED within each round and only same-round ratios are aggregated
(median across rounds; per-round pairs reported). Compiles are paid in an
untimed warmup round over the same chunk shapes.

    python tools/fanout_bench.py > FANOUT_r03.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from imageprocessingtools_tpu import serving
from imageprocessingtools_tpu.codec import ppm

PRESETS = ("edge_detect", "enhance", "print_ready")
N_FILES = 32
SIDE = 512
MAX_BATCH = 16
ROUNDS = 5


def main() -> None:
    import jax

    work = "/tmp/fanout_bench"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    rng = np.random.default_rng(42)
    paths = []
    for i in range(N_FILES):
        p = os.path.join(work, f"img_{i:03d}.ppm")
        ppm.write_ppm(p, rng.integers(0, 256, (SIDE, SIDE, 3), dtype=np.uint8))
        paths.append(p)

    def arm_fanout():
        serving.process_files(paths, PRESETS, max_batch=MAX_BATCH,
                              suffix=".fo")

    def arm_sequential():
        for name in PRESETS:
            serving.process_files(paths, name, max_batch=MAX_BATCH,
                                  suffix=".sq_" + name)

    # Untimed warmup: pays every compile (one per (preset-combo, chunk
    # shape)) and first-touch page faults on both arms.
    arm_fanout()
    arm_sequential()

    rounds = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        arm_fanout()
        t_fo = time.perf_counter() - t0
        t0 = time.perf_counter()
        arm_sequential()
        t_sq = time.perf_counter() - t0
        rounds.append({"fanout_s": round(t_fo, 3),
                       "sequential_s": round(t_sq, 3),
                       "speedup_x": round(t_sq / t_fo, 3)})

    speedups = sorted(r["speedup_x"] for r in rounds)
    med = speedups[len(speedups) // 2]
    upload_mb = N_FILES * SIDE * SIDE * 3 / 1e6
    report = {
        "date": time.strftime("%Y-%m-%d"),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "workload": {
            "files": N_FILES, "shape": [SIDE, SIDE, 3],
            "presets": list(PRESETS), "max_batch": MAX_BATCH,
            "upload_mb_per_pass": round(upload_mb, 1),
        },
        "method": (
            "interleaved A/B per round, %d rounds after an untimed "
            "compile+pagefault warmup; same files, same chunk shapes; "
            "median of per-round speedups (time-shared slice — only "
            "same-round ratios are load-bearing, CLAUDE.md)" % ROUNDS
        ),
        "rounds": rounds,
        "median_speedup_x": med,
        "note": (
            "fan-out uploads each decoded chunk once for all %d presets; "
            "sequential uploads it %d times. Outputs are byte-identical "
            "(tests/test_serving.py fan-out suite)." % (len(PRESETS),
                                                        len(PRESETS))
        ),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
