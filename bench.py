"""Benchmark: fused 4K pipeline (grayscale -> 5x5 Gaussian -> hist-eq),
flagship variant = the Pallas mega-kernel (one VMEM pass; XLA fallback).

Prints ONE JSON line:
  {"metric": "fused_4k_pipeline", "value": <MPix/s/chip>, "unit": "MPix/s",
   "vs_baseline": <x over the 1 GPix/s/chip north-star target>}

"vs_baseline" is value / 1000 MPix/s — the BASELINE.json north-star target
for this exact pipeline. (A ratio over the C binary would be apples-to-
oranges: its closest op, -gray at 4K, is 1.6 MPix/s but ~95% of that is its
1-byte-per-fwrite encoder, and it has no conv/hist-eq at all. For same-work
per-op ratios vs the C see ACCEPTANCE_TPU_r02.json / tools/profile_ops.py.)

Methodology: the per-call dispatch path to the TPU goes through a remote
tunnel with ~tens-of-ms RTT and a `block_until_ready` that does not actually
block, so the pipeline is iterated ON DEVICE inside one jitted
`lax.fori_loop`; each iteration's input is rebuilt from the previous output
(stack + rolls) so no stage can be hoisted out of the loop. The measured
per-iteration time therefore INCLUDES a ~25 MB feedback materialization —
the reported number is an underestimate of the pure pipeline rate.
Completion is observed via a tiny dependent device-to-host fetch; a 0-iter
loop fetch is subtracted as harness baseline.

Baseline: the C reference's closest op is -gray at 4K = 1.6 MPix/s
end-to-end (BASELINE.md; the reference has no conv/hist-eq at all, so the
fused pipeline does strictly more work per pixel). North star: >= 1000
MPix/s/chip.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

NORTH_STAR_MPIX_S = 1000.0  # >= 1 GPix/s/chip fused-pipeline target
H, W = 2160, 3840  # 4K


def _make_loop(pipeline):
    import jax

    @functools.partial(jax.jit, static_argnums=1)
    def loop(img, iters: int):
        import jax.numpy as jnp
        from jax import lax

        def body(_, carry):
            out = pipeline(carry)
            # Feed the output back as the next RGB input (cheap rolls
            # decorrelate channels); the loop-carried dependency defeats
            # loop hoisting.
            return jnp.stack(
                [out, jnp.roll(out, 1, axis=0), jnp.roll(out, 7, axis=1)],
                axis=-1,
            )

        return lax.fori_loop(0, iters, body, img)

    return loop


def _timed(loop, img, iters: int) -> float:
    t0 = time.perf_counter()
    r = loop(img, iters)
    np.asarray(r[:1, :1, :1])  # tiny fetch dependent on the last iteration
    return time.perf_counter() - t0


def main() -> None:
    import jax

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8))

    # Flagship variant: the Pallas MEGA kernel (gray+gauss+hist in ONE VMEM
    # pass, Pallas slab LUT apply, block_rows=32) — 0.982 vs 1.341 ms
    # same-run against the XLA pipeline at 4K in this very harness, then
    # 14/14 interleaved rounds at 0.69x after the round-3 tune pass
    # (MEGA_TUNE_r03.json). Mosaic has shipped silent shape-dependent
    # limitations before, so ANY failure to compile/run it falls back to
    # the XLA pipeline rather than failing the bench.
    from imageprocessingtools_tpu.kernels.fused import (
        fused_pipeline_pallas_mega,
        fused_pipeline_xla,
    )

    loop = _make_loop(fused_pipeline_pallas_mega)
    n = 50
    try:
        _timed(loop, img, n)  # compile both variants + warm
        _timed(loop, img, 0)
    except Exception:
        loop = _make_loop(fused_pipeline_xla)
        _timed(loop, img, n)
        _timed(loop, img, 0)

    # The chip is time-shared (contention varies per run by up to ~70x);
    # min over repeats SPACED over ~1 min approximates the uncontended rate
    # even if a contended window covers part of the run.
    base = min(_timed(loop, img, 0) for _ in range(5))
    totals = []
    reps = 12  # span ~2 min: one contended window must not cover every rep
    for rep in range(reps):
        totals.append(_timed(loop, img, n))
        if rep < reps - 1:
            time.sleep(10)
    per_iter = max((min(totals) - base) / n, 1e-9)

    mpix_s = (H * W) / per_iter / 1e6
    print(
        json.dumps(
            {
                "metric": "fused_4k_pipeline",
                "value": round(mpix_s, 1),
                "unit": "MPix/s",
                "vs_baseline": round(mpix_s / NORTH_STAR_MPIX_S, 2),
                # names the vs_baseline denominator: round 1 divided by the
                # C binary's -gray rate (1.6 MPix/s, ~95% fwrite time); this
                # is the ratio over the BASELINE.json 1 GPix/s target.
                "baseline": "north_star_1000_mpix_s",
            }
        )
    )


if __name__ == "__main__":
    main()
