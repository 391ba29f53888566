"""256-bin histogram and histogram equalization, scatter-free.

TPU has no fast scatter, so the histogram is a compare-and-reduce: the
compare against the 256 bin ids fuses into the reduction under XLA (and
`kernels/histogram.py` provides the MXU one-hot-matmul Pallas version).

Equalization: lut[v] = round_half_up((cdf[v] - cdf_min) * 255 / (N - cdf_min))
with cdf_min the first nonzero CDF value; constant images pass through. The
LUT arithmetic is float32 on device (f64 golden spec carries a documented
+-1 LSB budget); counts up to 2^24 are exact in f32.
"""

from __future__ import annotations

import jax.numpy as jnp

from imageprocessingtools_tpu.ops.common import as_i32


def histogram(img: jnp.ndarray) -> jnp.ndarray:
    """uint8[...] -> int32[256] bin counts."""
    vals = as_i32(img).reshape(-1)
    bins = jnp.arange(256, dtype=jnp.int32)
    # Compare-broadcast fused into the N-axis reduction by XLA.
    return jnp.sum((vals[:, None] == bins[None, :]).astype(jnp.int32), axis=0)


def _equalize_lut(hist: jnp.ndarray, n_pixels: int) -> jnp.ndarray:
    """uint8[256] LUT from int32[256] counts (n_pixels static)."""
    cdf = jnp.cumsum(hist)
    cdf_min = jnp.min(jnp.where(cdf > 0, cdf, n_pixels))
    denom = jnp.maximum(n_pixels - cdf_min, 1).astype(jnp.float32)
    lut = jnp.floor(
        (cdf - cdf_min).astype(jnp.float32) * 255.0 / denom + 0.5
    )
    lut = jnp.clip(lut, 0, 255).astype(jnp.uint8)
    identity = jnp.arange(256, dtype=jnp.uint8)
    return jnp.where(cdf_min == n_pixels, identity, lut)


def equalize_histogram(img: jnp.ndarray) -> jnp.ndarray:
    """Classic CDF equalization of a gray uint8 image."""
    n_pixels = 1
    for d in img.shape:
        n_pixels *= int(d)
    lut = _equalize_lut(histogram(img), n_pixels)
    return jnp.take(lut, as_i32(img), axis=0)
