"""Validate device_loop_rate's shape-changing feedback against a
feedback-free method, and re-measure the dense-resize rows honestly.

Round-3 finding: PROFILE_r03's `resize->1920` row (6.354 ms) and every
number in ops/resize.py's A/B comments (6.56/6.69/7.05/7.26/9.41/10.7 ms)
were measured with the harness's generic ravel/tile feedback, which for
shape-changing outputs costs ~5 ms at 4K on its own (the same artifact
class that polluted PROFILE_r02's gray/mono rows). The same-run A/B
CONCLUSIONS stand (both sides carried the tax); the ABSOLUTE numbers do
not: dense 4K->1920 resize is ~1.3 ms.

Two independent measurements, same run:

1. loop: `device_loop_rate` with the scalar-reduction feedback
   (carry ^ sum(out) — every output element consumed, ~zero feedback
   cost; utils/timing.py).
2. chain: a straight-line K-step jit where every output element densely
   feeds the next input (x = img ^ zero-pad(out)), minus a slice-only
   control chain that prices the pad+xor feedback itself. No loop, no
   scalar tricks, dispatch RTT cancels in the K_hi - K_lo difference.
   Nothing can be elided or cross-iteration overlapped: each step's
   full output is data-required by the next step's input.

Agreement between the two (measured 2026-08-18: 1.29 vs 1.32 ms at
4K->1920; 0.023-0.056 ms loop passes vs 0.034 ms chain at 1080p->256)
certifies the scalar feedback; both sit below the 2-pass-bf16 MXU
speed-of-light for their FLOP counts (see `implied_eff_tf_s`; uint8
upcast operands let Precision.HIGH skip the low-half pass of the
integer-exact side, so the effective ceiling is ~native-bf16/2, not /3).

Writes FEEDBACK_VALIDATION_r03.json. Usage (on the TPU backend):
    python tools/validate_feedback.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from imageprocessingtools_tpu import ops
from imageprocessingtools_tpu.ops._exact import resize_output_height
from imageprocessingtools_tpu.utils.timing import device_loop_rate

N_PASSES = 5
PASS_GAP_S = 8.0


def _macs_dense(h: int, w: int, new_w: int, c: int = 3) -> int:
    nh = resize_output_height(h, w, new_w)
    return (nh * h * w + nh * w * new_w) * c


def _fetch(x) -> None:
    import jax.numpy as jnp

    np.asarray(jnp.ravel(x)[:1])


def _make_chain(body, oh, ow, k):
    import jax
    import jax.numpy as jnp

    def fn(img):
        h, w, _ = img.shape
        x = img
        for _ in range(k):
            out = body(x)
            x = img ^ jnp.pad(out, ((0, h - oh), (0, w - ow), (0, 0)))
        return x

    return jax.jit(fn)


def _chain_step_sec(body, img_dev, oh, ow, klo, khi, reps=4) -> float:
    flo, fhi = _make_chain(body, oh, ow, klo), _make_chain(body, oh, ow, khi)
    _fetch(flo(img_dev))
    _fetch(fhi(img_dev))

    def t(f):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _fetch(f(img_dev))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(fhi) - t(flo)) / (khi - klo)


def measure_geometry(h, w, new_w, khi, loop_iters):
    import jax

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    img_dev = jax.device_put(img)
    oh, ow = resize_output_height(h, w, new_w), new_w
    body = lambda x: ops.resize_width(x, new_w)
    loop_ms, chain_ms, ctrl_ms = [], [], []
    for p in range(N_PASSES):
        loop_ms.append(
            device_loop_rate(body, img, iters=loop_iters, repeats=2) * 1e3
        )
        chain_ms.append(
            _chain_step_sec(body, img_dev, oh, ow, 1, khi) * 1e3
        )
        ctrl_ms.append(
            _chain_step_sec(lambda x: x[:oh, :ow, :], img_dev, oh, ow, 1, khi)
            * 1e3
        )
        if p + 1 < N_PASSES:
            time.sleep(PASS_GAP_S)
    net_chain = [c - t for c, t in zip(chain_ms, ctrl_ms)]
    gflop = _macs_dense(h, w, new_w) * 2 / 1e9
    row = {
        "geometry": f"{h}x{w} -> {oh}x{ow}",
        "dense_gflop": round(gflop, 2),
        "loop_scalar_feedback_ms": [round(v, 3) for v in loop_ms],
        "chain_ms": [round(v, 3) for v in chain_ms],
        "chain_slice_control_ms": [round(v, 3) for v in ctrl_ms],
        "chain_net_ms": [round(v, 3) for v in net_chain],
        "loop_min_ms": round(min(loop_ms), 3),
        "chain_net_min_ms": round(min(net_chain), 3),
        "implied_eff_tf_s_at_chain_min": round(
            gflop / max(min(net_chain), 1e-6), 1
        ),
    }
    return row


def main() -> None:
    import jax

    doc = {
        "date": time.strftime("%Y-%m-%d"),
        "device": str(jax.devices()),
        "method": (
            "per geometry, N_PASSES interleaved passes spaced 8 s: "
            "(1) device_loop_rate with the scalar-reduction feedback "
            "(carry ^ sum(out)); (2) straight-line K-step jit chains "
            "(x = img ^ zero-pad(out)) timed at K_hi minus K_lo so "
            "dispatch RTT cancels, minus a slice-only control chain "
            "pricing the pad+xor feedback itself"
        ),
        "rows": [
            measure_geometry(2160, 3840, 1920, khi=6, loop_iters=20),
            measure_geometry(1080, 1920, 256, khi=129, loop_iters=50),
        ],
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FEEDBACK_VALIDATION_r03.json",
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
