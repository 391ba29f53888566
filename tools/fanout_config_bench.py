"""A/B: fan-out over REFERENCE PipelineConfigs vs sequential per-config runs.

FANOUT_r03 measured preset-tuple fan-out; round 5 extended fan-out to
tuples of reference `PipelineConfig`s (VERDICT #6) and this tool holds the
matching on-chip receipt: three ``-w`` targets of ONE decode (the verdict's
literal example) served as a tuple — one decode + one host->device upload
per chunk feeding three compiled resize pipelines — vs three sequential
single-config passes over the same files. Through the axon tunnel the
upload dominates end-to-end serving (~5-15 MB/s each way, CLAUDE.md), so
the fan-out arm is expected to win by roughly the upload share.

Methodology per CLAUDE.md: the slice is time-shared, so the two arms are
INTERLEAVED within each round and only same-round ratios are aggregated
(median across rounds; per-round pairs reported). Compiles are paid in an
untimed warmup round, which also byte-compares every fan-out output
against its per-config run (the VERDICT's done-condition).

    python tools/fanout_config_bench.py > FANOUT_CONFIG_r05.json
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
from imageprocessingtools_tpu.pipeline import PipelineConfig

CONFIGS = (
    PipelineConfig(new_width=1024),
    PipelineConfig(new_width=640),
    PipelineConfig(new_width=320),
)
N_FILES = 32
SIDE = 512
MAX_BATCH = 16
ROUNDS = 5


def main() -> None:
    import jax

    work = "/tmp/fanout_config_bench"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    rng = np.random.default_rng(43)
    paths = []
    for i in range(N_FILES):
        p = os.path.join(work, f"img_{i:03d}.ppm")
        ppm.write_ppm(p, rng.integers(0, 256, (SIDE, SIDE, 3), dtype=np.uint8))
        paths.append(p)
    tags = [serving.config_tag(c) for c in CONFIGS]

    def arm_fanout():
        serving.process_files(paths, CONFIGS, max_batch=MAX_BATCH,
                              suffix=".fo")

    def arm_sequential():
        for k, cfg in enumerate(CONFIGS):
            serving.process_files(paths, cfg, max_batch=MAX_BATCH,
                                  suffix=f".sq{k}")

    # Untimed warmup: pays every compile (one per (config, chunk shape))
    # and first-touch page faults on both arms.
    arm_fanout()
    arm_sequential()

    # Byte-identity: every fan-out output vs its per-config run.
    mismatches = []
    for p in paths:
        for k, tag in enumerate(tags):
            with open(f"{p}.{tag}.fo", "rb") as f1, \
                    open(f"{p}.sq{k}", "rb") as f2:
                if f1.read() != f2.read():
                    mismatches.append(f"{os.path.basename(p)}:{tag}")

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
            "configs": tags, "max_batch": MAX_BATCH,
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
        "byte_identical_vs_per_config": not mismatches,
        "byte_mismatches": mismatches,
        "checked_outputs": len(paths) * len(CONFIGS),
        "note": (
            "fan-out uploads each decoded chunk once for all %d reference "
            "configs (three -w targets of one decode — the VERDICT #6 "
            "example); sequential uploads it %d times. Byte-identity "
            "checked here output-by-output and in tests/test_serving.py's "
            "fan-out suite (which also compares against the C oracle)."
            % (len(CONFIGS), len(CONFIGS))
        ),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
