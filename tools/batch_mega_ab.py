"""Batched flagship A/B: vmap(fused XLA) vs vmap(Pallas mega kernel).

`batched_fused_pipeline` vmaps the XLA pipeline; the tuned mega kernel is
single-image. Question: does vmapping the mega kernel (Pallas under vmap
adds a leading grid dim) compile on hardware, stay bit-identical, and beat
the vmapped XLA form at serving-style shapes? Interleaved rank rounds as
in tools/mega_rank.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from imageprocessingtools_tpu.kernels.fused import (
    fused_pipeline_pallas_mega,
    fused_pipeline_xla,
)
from imageprocessingtools_tpu.utils.timing import device_loop_rate


def main() -> None:
    rng = np.random.default_rng(9)
    doc = {"cases": {}}
    cases = {
        "b8_512": (8, 512, 512),
        "b4_1080p": (4, 1080, 1920),
    }
    if len(sys.argv) > 1:  # override: tag=BxHxW ...
        cases = {}
        for a in sys.argv[1:]:
            tag, dims = a.split("=")
            b, h, w = (int(t) for t in dims.split("x"))
            cases[tag] = (b, h, w)
    for tag, (b, h, w) in cases.items():
        batch = jax.device_put(
            rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8))
        ref = np.asarray(jax.jit(jax.vmap(fused_pipeline_xla))(batch))
        configs = {"vmap_xla": jax.vmap(fused_pipeline_xla)}
        try:
            mega = jax.vmap(fused_pipeline_pallas_mega)
            out = np.asarray(jax.jit(mega)(batch))
            assert (out == ref).all(), "vmap(mega) NOT bit-identical"
            configs["vmap_mega"] = mega
        except Exception as e:
            doc["cases"][tag] = {"vmap_mega_error": str(e)[:300]}
            print(f"{tag}: vmap(mega) failed: {str(e)[:150]}", flush=True)
            continue
        for fn in configs.values():
            device_loop_rate(fn, batch, iters=4, repeats=1)  # warm
        rounds, times = 10, {n: [] for n in configs}
        for r in range(rounds):
            for n, fn in configs.items():
                times[n].append(
                    device_loop_rate(fn, batch, iters=8, repeats=1) * 1e3)
            print(f"{tag} round {r}: " +
                  "  ".join(f"{n}={times[n][-1]:.3f}" for n in configs),
                  flush=True)
        a, m = np.array(times["vmap_xla"]), np.array(times["vmap_mega"])
        doc["cases"][tag] = {
            "batch_shape": [b, h, w, 3],
            "vmap_xla_median_ms": round(float(np.median(a)), 3),
            "vmap_mega_median_ms": round(float(np.median(m)), 3),
            "median_ratio_mega_vs_xla": round(float(np.median(m / a)), 3),
            "mega_wins": int((m < a).sum()),
            "rounds": rounds,
            "bit_identical": True,
        }
    json.dump(doc, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
