"""Angle-domain compile-cost audit for the rotation surfaces (round 4).

The C reference handles all 359 CLI angles in uniform time
(``ppmx-edward.c:673-789``: the same per-pixel loop regardless of angle).
Our blocked MXU path's XLA graph SHAPE depends on the folded angle (bh/bw
source-block extents, n_g x n_k tile grid), and round-3 lore records a
>10-minute compile cliff when the blocked rotation is wrapped in a
fori_loop at angle 5 — so the question this tool answers is whether any
compile the CLI or serving surface actually pays (eager jitted dispatch;
jit(vmap(pipeline)) per bucket) cliffs anywhere in the angle domain.

Each angle is probed in a SUBPROCESS with a hard timeout: a cliff is
recorded as {"timeout": true} instead of stalling the sweep, and the
persistent compile cache is pointed at a throwaway dir so every
measurement is a genuine cold compile.

    python tools/compile_angles.py [--dims 2160x3840] [--angles spec]
                                   [--timeout 120] [--vmap-batch 2]
                                   [--out COMPILE_ANGLES_r04.json]

Angle spec: comma-separated ints and a..b ranges, e.g. "1..20,25,30..90/5".
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
os.environ["IPT_AUDIT_CACHE"] = "0"
os.environ["IPT_KERNEL_MANIFEST"] = "0"  # measure the XLA surface, not Pallas
import numpy as np
h, w, angle, vmap_batch = json.loads(sys.argv[1])
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[2])
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from imageprocessingtools_tpu.ops import geometry
from imageprocessingtools_tpu.pipeline import PipelineConfig
from imageprocessingtools_tpu import serving

img = np.random.default_rng(0).integers(0, 256, (h, w, 3), dtype=np.uint8)
res = {}

# 1) CLI surface: eager jitted blocked-path dispatch (compile + 1 run).
t0 = time.perf_counter()
out = geometry.rotate(jnp.asarray(img), float(angle))
np.asarray(out[:1, :1])
res["eager_first_call_s"] = round(time.perf_counter() - t0, 2)

# 2) Serving surface: jit(vmap(pipeline)) exactly as process_batch does.
cfg = PipelineConfig(angle=float(angle))
small = np.stack([img] * vmap_batch)
t0 = time.perf_counter()
out2, _ = serving.process_batch(small, cfg)
np.asarray(out2[0, :1, :1])
res["vmap_first_call_s"] = round(time.perf_counter() - t0, 2)

print("RESULT " + json.dumps(res))
"""


def parse_angles(spec: str) -> list[int]:
    out: list[int] = []
    for part in spec.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, s = part.split("/")
            step = int(s)
        if ".." in part:
            a, b = part.split("..")
            out.extend(range(int(a), int(b) + 1, step))
        elif part:
            out.append(int(part))
    return sorted(set(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="2160x3840")
    ap.add_argument("--angles",
                    default="1..20,22..88/3,89,45,95,175,269,359")
    ap.add_argument("--timeout", type=float, default=120.0)
    ap.add_argument("--vmap-batch", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    h, w = (int(t) for t in args.dims.split("x"))
    angles = parse_angles(args.angles)

    rows = []
    worst = {"eager": 0.0, "vmap": 0.0}
    for angle in angles:
        with tempfile.TemporaryDirectory() as cache_dir:
            child_args = json.dumps([h, w, angle, args.vmap_batch])
            t0 = time.time()
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", _CHILD % {"repo": REPO},
                     child_args, cache_dir],
                    capture_output=True, text=True, timeout=args.timeout,
                    cwd=REPO,
                )
                row: dict = {"angle": angle}
                for line in proc.stdout.splitlines():
                    if line.startswith("RESULT "):
                        row.update(json.loads(line[len("RESULT "):]))
                if "eager_first_call_s" not in row:
                    row["error"] = (proc.stdout[-300:] + proc.stderr[-300:])
                else:
                    worst["eager"] = max(worst["eager"],
                                         row["eager_first_call_s"])
                    worst["vmap"] = max(worst["vmap"],
                                        row.get("vmap_first_call_s", 0.0))
            except subprocess.TimeoutExpired:
                row = {"angle": angle, "timeout": True,
                       "timeout_s": args.timeout}
            row["wall_s"] = round(time.time() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    doc = {
        "date": time.strftime("%Y-%m-%d"),
        "dims": [h, w],
        "vmap_batch": args.vmap_batch,
        "timeout_s": args.timeout,
        "method": ("per-angle subprocess, throwaway compile cache (cold "
                   "compiles), first-call wall = trace+lower+XLA-compile+"
                   "1 dispatch for (a) the eager CLI rotate and (b) "
                   "jit(vmap(pipeline)) as serving's process_batch builds "
                   "it; first-call wall includes the ~3-8 s process jax "
                   "startup common mode"),
        "worst_eager_s": worst["eager"],
        "worst_vmap_s": worst["vmap"],
        "n_timeouts": sum(1 for r in rows if r.get("timeout")),
        "rows": rows,
    }
    text = json.dumps(doc, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
