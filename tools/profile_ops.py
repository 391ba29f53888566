"""Per-op device throughput table (run on TPU: `python tools/profile_ops.py`).

Window-robust methodology (round 3, after PROFILE_r02's gray/mono rows froze
a contended window): the whole table is measured in N_PASSES separate passes
spaced PASS_GAP_S apart; each row reports the MIN across passes (the chip is
a time-shared slice — min over spaced windows is the only defensible
point estimate, per CLAUDE.md) plus the per-pass values and the max/min
spread so a reader can see the contention for themselves.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import imageprocessingtools_tpu as ipt
from imageprocessingtools_tpu.kernels.fused import (
    fused_pipeline_pallas,
    fused_pipeline_pallas_mega,
    fused_pipeline_xla,
)
from imageprocessingtools_tpu.utils.timing import device_loop_rate

H, W = 2160, 3840
N_PASSES = 5
PASS_GAP_S = 8.0


# Measured C reference wall times at 4K, seconds (BASELINE.md; end-to-end
# incl. its fwrite-bound encoder — the reference has no op-only mode).
_C_BASELINE_S = {
    "grayscale": 5.094,
    "mono_dither": 0.159,
    "flip_v": 0.714,
    "flip_h": 0.683,
    "rot90": 2.936,
    "rotate30": 9.360,
    "resize->1920": 0.436,
}


def _op_table():
    import jax

    from imageprocessingtools_tpu.kernels import pallas_core as pk
    from imageprocessingtools_tpu.ops.histogram import apply_lut, histogram

    rng = np.random.default_rng(7)
    lut = jnp_lut = None
    import jax.numpy as jnp

    jnp_lut = jnp.asarray(rng.integers(0, 256, 256, dtype=np.uint8))

    vrot_1080 = jax.jit(jax.vmap(lambda c: ipt.rotate(c, 30)))
    vrot_4k = jax.jit(jax.vmap(lambda c: ipt.rotate(c, 30)))

    return [
        # (name, body, input_shape_override, images_per_iter[, method])
        # method "dispatch": eager jitted dispatch + tiny fetch (includes
        # the ~tens-of-ms tunnel RTT — reported as rtt_floor_ms); used for
        # the rotation rows because XLA takes >10 min to compile some
        # rotation-inside-fori_loop programs (see CLAUDE.md).
        ("grayscale", lambda c: ipt.grayscale(c), None, 1),
        ("mono_dither", lambda c: ipt.mono_dither(c), None, 1),
        ("flip_v", lambda c: ipt.flip_vertical(c), None, 1),
        ("flip_h", lambda c: ipt.flip_horizontal(c), None, 1),
        ("rot90", lambda c: ipt.rotate(c, 90), None, 1),
        # Same math on planar [3, H, W] input: isolates grayscale's
        # arithmetic from the loop harness's tile-padded [H, W, 3]
        # intermediate (the (W, 3) minor dims pad ~42x on TPU — lore), so
        # the gap between this row and the grayscale row is attributable
        # to that layout tax, not the op.
        ("gray (planar in)", lambda p: (
            p[0].astype("int32") + p[1].astype("int32")
            + p[2].astype("int32")) // 3, (3, H, W), 1),
        # rotate30 measures in-loop since the late-round harness validation:
        # the 30deg program compiles inside fori_loop in seconds (only some
        # angles, e.g. 5deg, hit the >10-min XLA compile that forces
        # dispatch rows), and the eager-dispatch alternative carries ~48 ms
        # of tunnel overhead (~2x the noop RTT floor) per call.
        ("rotate30", lambda c: ipt.rotate(c, 30), None, 1),
        ("rotate30 b=4 1080p", lambda c: vrot_1080(c), (4, 1080, 1920, 3), 4,
         "dispatch"),
        ("rotate30 b=2 4K", lambda c: vrot_4k(c), (2, H, W, 3), 2,
         "dispatch"),
        ("resize->1920", lambda c: ipt.resize_width(c, 1920), None, 1),
        ("invert", lambda c: ipt.invert(c), None, 1),
        ("brightness", lambda c: ipt.brightness(c, 25), None, 1),
        ("contrast", lambda c: ipt.contrast(c, 1.4), None, 1),
        ("threshold", lambda c: ipt.threshold(c, 128), None, 1),
        ("gray+box", lambda c: ipt.box_blur(ipt.grayscale(c)), None, 1),
        ("gray+sharpen", lambda c: ipt.sharpen(ipt.grayscale(c)), None, 1),
        ("gray+gauss5", lambda c: ipt.gaussian_blur(ipt.grayscale(c)), None, 1),
        ("gray+sobel", lambda c: ipt.sobel(ipt.grayscale(c)), None, 1),
        ("gray+equalize", lambda c: ipt.equalize_histogram(ipt.grayscale(c)), None, 1),
        # hist/LUT rows run on a 2-D gray input (their real operand); the
        # 1-D histogram output feeds back via a row broadcast.
        ("hist XLA", lambda c: histogram(c), (H, W), 1),
        ("hist pallas", lambda c: pk.histogram_pallas(c), (H, W), 1),
        ("lut XLA", lambda c: apply_lut(c, jnp_lut), (H, W), 1),
        ("lut pallas", lambda c: pk.lut_apply_pallas(c, jnp_lut), (H, W), 1),
        ("fused XLA", fused_pipeline_xla, None, 1),
        ("fused pallas", fused_pipeline_pallas, None, 1),
        ("fused mega", fused_pipeline_pallas_mega, None, 1),
    ]


def _dispatch_rate(body, img_dev, repeats: int = 8) -> float:
    """Seconds per eager jitted dispatch + tiny dependent fetch (min)."""
    import jax.numpy as jnp

    def fetch(x):
        np.asarray(jnp.ravel(x)[:1])

    fetch(body(img_dev))  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fetch(body(img_dev))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    import json

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    base_img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    inputs = {}
    dev_inputs = {}

    noop = jax.jit(lambda x: x[:1, :1, :1] + 1)
    base_dev = jax.device_put(base_img)
    np.asarray(jnp.ravel(noop(base_dev))[:1])
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(jnp.ravel(noop(base_dev))[:1])
        rtts.append(time.perf_counter() - t0)
    rtt_floor_ms = round(min(rtts) * 1e3, 2)

    ops = [row if len(row) == 5 else (*row, "loop") for row in _op_table()]
    passes: dict[str, list[float]] = {name: [] for name, *_ in ops}
    errors: dict[str, str] = {}

    for p in range(N_PASSES):
        for name, body, shape, _n_img, method in ops:
            if name in errors:
                continue
            if shape is not None and name not in inputs:
                inputs[name] = rng.integers(0, 256, size=shape, dtype=np.uint8)
            img = inputs.get(name, base_img)
            try:
                if method == "dispatch":
                    if name not in dev_inputs:
                        dev_inputs[name] = jax.device_put(img)
                    sec = _dispatch_rate(body, dev_inputs[name])
                else:
                    # Sub-ms ops need many iterations to rise above the
                    # ~tens-of-ms tunnel RTT noise floor of one fetch;
                    # 80 iterations keeps even 0.1 ms rows at ~10x the
                    # window jitter while multi-ms rows stay quick.
                    iters = 3 if "rotate" in name else 80
                    sec = device_loop_rate(body, img, iters=iters, repeats=2)
                passes[name].append(sec)
            except Exception as e:  # keep profiling resilient per-op
                errors[name] = f"{type(e).__name__}: {e}"[:200]
                print(f"{name:20s} FAILED: {errors[name]}")
        print(f"# pass {p + 1}/{N_PASSES} done", flush=True)
        if p + 1 < N_PASSES:
            time.sleep(PASS_GAP_S)

    mpix = H * W / 1e6
    table = {}
    for name, _body, shape, n_img, method in ops:
        if name in errors:
            table[name] = {"error": errors[name]}
            continue
        vals = passes[name]
        sec = min(vals) / n_img  # per image
        underflow = min(vals) * 1e3 < 0.01
        if underflow:
            # 0-iter-baseline window mismatch can underflow a pass to ~0
            # (CLAUDE.md lore: "medians/ranks absorb them, minima don't")
            # — a 0.000 ms min would print an absurd rate, so such rows
            # report the MEDIAN pass instead and carry both values.
            sec = sorted(vals)[len(vals) // 2] / n_img
        row_mpix = (
            mpix if shape is None
            else (shape[0] * shape[1] if len(shape) == 2
                  else shape[1] * shape[2]) / 1e6
        )
        row = {
            "ms": round(sec * 1e3, 3),
            "gpix_per_s": round(row_mpix / sec / 1e3, 3),
            "passes_ms": [round(v / n_img * 1e3, 3) for v in vals],
            "spread_max_over_min": round(max(vals) / max(min(vals), 1e-6), 2),
            "method": method,
        }
        if underflow:
            row["stat"] = "median (min underflowed to ~0)"
        if sec * 1e3 < 0.05 or underflow:
            row["below_resolution"] = True
            row["note"] = ("op is below the loop harness's resolution in "
                           "at least one window; treat ms/gpix as a bound, "
                           "not a measurement")
        if name in ("grayscale", "mono_dither"):
            row["note"] = (
                "inside-pipeline cost: the stack+roll loop feedback lets "
                "XLA fuse the op with the feedback into one elementwise "
                "pass, so no HWC intermediate materializes — which is also "
                "how the op runs inside real pipelines. 'gray (planar in)' "
                "shows the arithmetic floor. (A ravel/tile feedback "
                "instead measures a ~15 ms HWC relayout tax — a harness "
                "artifact that polluted PROFILE_r02's gray/mono rows.)"
            )
        if name in _C_BASELINE_S:
            row["c_reference_s"] = _C_BASELINE_S[name]
            row["vs_c_same_work"] = round(_C_BASELINE_S[name] / sec, 1)
        table[name] = row
        print(
            f"{name:20s} {sec * 1e3:9.3f} ms  {row['gpix_per_s']:8.2f} GPix/s"
            f"  spread {row['spread_max_over_min']}x  [{method}]"
            + (f"  ({row['vs_c_same_work']}x C)" if name in _C_BASELINE_S else "")
        )
    if "--json" in sys.argv:
        out = {
            "note": (
                "per-op device rates at 4K (batched rows: per image at the "
                "row's own shape); each row = MIN over "
                f"{N_PASSES} passes spaced {PASS_GAP_S}s apart (time-shared "
                "chip — see passes_ms / spread for the contention). "
                "method=loop rows use the on-device fori_loop harness "
                "(tunnel excluded; shape-changing outputs use the "
                "scalar-reduction feedback validated in "
                "FEEDBACK_VALIDATION_r03.json); method=dispatch rows "
                "(batched rotation — vmapped rotation's in-loop XLA "
                "compile exceeds 10 min) are eager jitted dispatches "
                "whose times INCLUDE the real per-dispatch tunnel "
                "overhead, ~2x the noop RTT floor below. C reference "
                "numbers are end-to-end CLI wall times "
                "(BASELINE.md) on the 1-vCPU host — same work per image, "
                "the C has no op-only mode."
            ),
            "dims": [H, W],
            "dispatch_rtt_floor_ms": rtt_floor_ms,
            "ops": table,
        }
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
