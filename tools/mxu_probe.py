"""MXU throughput probe at the blocked-rotation matmul shapes.

Measures effective tera-ops/s for batched [B, M, K] @ [B, K, N] dots in the
dtype/precision configs relevant to the rotation kernel redesign:
int8->int32 (exact integer MXU), bf16->f32, and f32 at DEFAULT/HIGH/HIGHEST.
Run on the chip: `python tools/mxu_probe.py [B M K N]`.

Same-run numbers only (the slice is time-shared; see CLAUDE.md).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def probe(name, lhs, rhs, iters=2000, repeats=3, **dot_kwargs):
    b, m, k = lhs.shape
    n = rhs.shape[2]
    flops = 2.0 * b * m * k * n * iters

    @functools.partial(jax.jit, static_argnums=1)
    def loop(seed, it):
        def body(_, carry):
            # Perturb the SMALL operand (fuses into the lhs load) so nothing
            # hoists; rhs stays constant.
            l = lhs + carry.astype(lhs.dtype)
            out = lax.dot_general(
                l, rhs, (((2,), (1,)), ((0,), (0,))), **dot_kwargs
            )
            # Full reduce so XLA cannot dead-code-eliminate any output column.
            return out.sum(dtype=jnp.float32).astype(jnp.int32) % 3

        return lax.fori_loop(0, it, body, seed)

    def fetch(x):
        np.asarray(x)

    fetch(loop(jnp.int32(0), iters))
    fetch(loop(jnp.int32(0), 0))

    def run(it):
        t0 = time.perf_counter()
        fetch(loop(jnp.int32(0), it))
        return time.perf_counter() - t0

    base = min(run(0) for _ in range(repeats))
    total = min(run(iters) for _ in range(repeats))
    dt = max(total - base, 1e-9)
    tops = flops / dt / 1e12
    print(f"{name:34s} {dt/iters*1e3:8.3f} ms/iter  {tops:8.2f} Tops/s")
    return tops


def main():
    if len(sys.argv) not in (1, 5):
        sys.exit("usage: mxu_probe.py [B M K N] (all four or none)")
    b, m, k, n = (
        (int(x) for x in sys.argv[1:5]) if len(sys.argv) == 5
        else (64, 96, 128, 2048))
    print(f"shapes: [{b},{m},{k}] @ [{b},{k},{n}]  "
          f"({2.0*b*m*k*n/1e9:.2f} GFLOP/iter); device={jax.devices()[0]}")
    rng = np.random.default_rng(0)
    li8 = jnp.asarray(rng.integers(-127, 127, (b, m, k), dtype=np.int8))
    ri8 = jnp.asarray(rng.integers(-127, 127, (b, k, n), dtype=np.int8))
    lf = jnp.asarray(rng.standard_normal((b, m, k)), dtype=jnp.float32)
    rf = jnp.asarray(rng.standard_normal((b, k, n)), dtype=jnp.float32)

    probe("int8 -> int32", li8, ri8, preferred_element_type=jnp.int32)
    probe("bf16 -> f32", lf.astype(jnp.bfloat16), rf.astype(jnp.bfloat16),
          preferred_element_type=jnp.float32)
    for prec in ("DEFAULT", "HIGH", "HIGHEST"):
        probe(f"f32 {prec}", lf, rf,
              precision=getattr(lax.Precision, prec),
              preferred_element_type=jnp.float32)


if __name__ == "__main__":
    main()
