"""Banded-vs-dense resize A/B at upscales, compile-once harness.

Reproduces the measured rejection recorded in ops/resize.py: banded edges
dense ~4% at 4K->7680 only (9.12 vs 9.48 ms median, 5/5 passes) and loses
at 1080p->3840 (1.49 vs 1.14) — dense stays the default.

Same loop+feedback structure as utils.timing.device_loop_rate, but each
case's jitted loop is built ONCE and reused across the 5 interleaved
passes (the upscale weight constants are ~100 MB; re-jitting per pass
re-ships them through the 5-15 MB/s tunnel and never finishes).
"""
import sys, time, json, functools
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from imageprocessingtools_tpu import ops


def make_loop(body, shape):
    @functools.partial(jax.jit, static_argnums=1)
    def loop(x, n):
        def b(_, carry):
            out = body(carry)
            s = jnp.sum(out.astype(jnp.int32)).astype(jnp.uint8)
            return carry ^ s
        return lax.fori_loop(0, n, b, x)
    return loop


def fetch(x):
    np.asarray(jnp.ravel(x)[:1])


rng = np.random.default_rng(0)
img4k = jax.device_put(rng.integers(0, 256, (2160, 3840, 3), dtype=np.uint8))
img1080 = jax.device_put(rng.integers(0, 256, (1080, 1920, 3), dtype=np.uint8))

cases = [
    ("4K->7680 dense", img4k, lambda x: ops.resize_width(x, 7680, banded=False), 8),
    ("4K->7680 banded", img4k, lambda x: ops.resize_width(x, 7680, banded=True), 8),
    ("1080p->3840 dense", img1080, lambda x: ops.resize_width(x, 3840, banded=False), 20),
    ("1080p->3840 banded", img1080, lambda x: ops.resize_width(x, 3840, banded=True), 20),
]
loops = {}
for name, img, body, iters in cases:
    t0 = time.time()
    loops[name] = make_loop(body, img.shape)
    fetch(loops[name](img, iters))
    fetch(loops[name](img, 0))
    print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)

rows = {name: [] for name, *_ in cases}
for p in range(5):
    for name, img, body, iters in cases:
        loop = loops[name]
        def run(n):
            t0 = time.perf_counter()
            fetch(loop(img, n))
            return time.perf_counter() - t0
        base = min(run(0) for _ in range(2))
        tot = min(run(iters) for _ in range(2))
        rows[name].append(max((tot - base) / iters, 1e-9) * 1e3)
    print(f"pass {p}: " + ", ".join(f"{n} {rows[n][-1]:.2f}" for n in rows), flush=True)
    if p < 4:
        time.sleep(8.0)
print(json.dumps({k: [round(v, 2) for v in vs] for k, vs in rows.items()}))
for k, vs in rows.items():
    print(f"{k}: min {min(vs):.2f} ms median {sorted(vs)[2]:.2f}")
