"""Same-run A/B: file-native batch decode vs the bytes path (round 4).

Compares, over interleaved rounds on warm page cache:
  A ("files"): native.decode_batch_files — per-file open + header-prefix
     parse + pread() of the payload straight into the batch tensor
     (one page-cache->tensor copy, no Python bytes objects);
  B ("bytes"): the round-3 serving path — a Python read loop building
     bytes objects, then native.decode_batch's parse + memcpy
     (two copies + Python allocation overhead).

Methodology per CLAUDE.md: warm-up pass first (first-touch anon pages on
this VM fault at ~20 MB/s; recycled arena pages run at DRAM speed), both
variants visited back-to-back per round, medians + per-round ranks
reported. Host-only — no TPU needed.

Usage: python tools/decode_ab.py [OUT.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imageprocessingtools_tpu.codec import native, ppm  # noqa: E402


def gen_files(workdir: str, h: int, w: int, n_unique: int, n: int) -> list[str]:
    rng = np.random.default_rng(h * 31 + w)
    uniq = []
    for i in range(n_unique):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        p = os.path.join(workdir, f"in_{h}x{w}_{i}.ppm")
        ppm.write_ppm(p, img)
        uniq.append(p)
    return [uniq[i % n_unique] for i in range(n)]


def run_case(workdir: str, h: int, w: int, n: int, rounds: int = 7) -> dict:
    paths = gen_files(workdir, h, w, min(8, n), n)
    for p in set(paths):
        with open(p, "rb") as f:
            f.read()  # warm page cache

    def files_pass():
        batch, errs = native.decode_batch_files(paths, h, w)
        assert not errs
        return batch

    def bytes_pass():
        buffers = [open(p, "rb").read() for p in paths]
        batch, _ = native.decode_batch(buffers)
        return batch

    # Warm-up: first allocations pay first-touch faults; later passes reuse
    # arena pages (CLAUDE.md). Also checks bit-identity once.
    a = files_pass()
    b = bytes_pass()
    assert np.array_equal(a, b), "A/B outputs differ"
    del a, b

    t_files, t_bytes = [], []
    wins = 0
    for _ in range(rounds):
        t0 = time.perf_counter()
        batch = files_pass()
        t1 = time.perf_counter()
        del batch
        t2 = time.perf_counter()
        batch = bytes_pass()
        t3 = time.perf_counter()
        del batch
        t_files.append(t1 - t0)
        t_bytes.append(t3 - t2)
        if t_files[-1] < t_bytes[-1]:
            wins += 1
    mpix = n * h * w / 1e6
    med_f = statistics.median(t_files)
    med_b = statistics.median(t_bytes)
    return {
        "shape": [h, w],
        "n_files": n,
        "mpix_per_round": round(mpix, 1),
        "files_median_s": round(med_f, 4),
        "bytes_median_s": round(med_b, 4),
        "files_mpix_s": round(mpix / med_f, 1),
        "bytes_mpix_s": round(mpix / med_b, 1),
        "speedup_files_vs_bytes": round(med_b / med_f, 3),
        "files_round_wins": wins,
        "rounds": rounds,
        "files_passes_s": [round(t, 4) for t in t_files],
        "bytes_passes_s": [round(t, 4) for t in t_bytes],
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    report = {"date": time.strftime("%Y-%m-%d"), "cases": {}}
    with tempfile.TemporaryDirectory(prefix="ipt_decode_ab_") as d:
        report["cases"]["b256_512"] = run_case(d, 512, 512, 256)
    with tempfile.TemporaryDirectory(prefix="ipt_decode_ab_") as d:
        report["cases"]["b16_4k"] = run_case(d, 2160, 3840, 16)
    with tempfile.TemporaryDirectory(prefix="ipt_decode_ab_") as d:
        report["cases"]["b64_1080p"] = run_case(d, 1080, 1920, 64)
    print(json.dumps(report, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
