"""Spatial (height) sharding of ONE giant image with halo exchange.

Image analog of sequence/context parallelism (survey §5): the H axis is
sharded over a mesh axis with `shard_map`; the 5x5 Gaussian needs a 2-row
halo, exchanged with `lax.ppermute` over ICI; global-boundary shards
replicate their own edge rows (matching `ops.stencil.gaussian_blur`'s
replicate padding bit-exactly); the histogram is a local bincount reduced
with `lax.psum`. Output equals the single-device fused pipeline exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from imageprocessingtools_tpu.ops.color import grayscale
from imageprocessingtools_tpu.ops.histogram import _equalize_lut, apply_lut, histogram


def _exchange_row_halo(tile: jnp.ndarray, radius: int, axis_name: str) -> jnp.ndarray:
    """Concatenate [halo_top, tile, halo_bottom] along H inside shard_map.

    Interior halos ride ICI via ppermute; the global top/bottom shards
    replicate their own edge row ``radius`` times (replicate padding).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top_rows = tile[:radius]
    bottom_rows = tile[-radius:]
    if n > 1:
        from_above = lax.ppermute(
            bottom_rows, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
        )
        from_below = lax.ppermute(
            top_rows, axis_name, perm=[(i + 1, i) for i in range(n - 1)]
        )
    else:
        from_above = bottom_rows
        from_below = top_rows

    edge_top = jnp.repeat(tile[:1], radius, axis=0)
    edge_bottom = jnp.repeat(tile[-1:], radius, axis=0)
    halo_top = jnp.where(idx == 0, edge_top, from_above)
    halo_bottom = jnp.where(idx == n - 1, edge_bottom, from_below)
    return jnp.concatenate([halo_top, tile, halo_bottom], axis=0)


def _gaussian5_from_padded(padded: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Integer binomial 5x5 on a row-halo'd int32 tile.

    Vertical pass is VALID over the 2-row halos; horizontal pass replicates
    edges locally (W is unsharded). Bit-identical to ops.stencil.gaussian_blur.
    """
    taps = (1, 4, 6, 4, 1)
    rows = None
    for dy, k in enumerate(taps):
        term = k * padded[dy : dy + h, :]
        rows = term if rows is None else rows + term
    rows = jnp.pad(rows, ((0, 0), (2, 2)), mode="edge")
    acc = None
    for dx, k in enumerate(taps):
        term = k * rows[:, dx : dx + w]
        acc = term if acc is None else acc + term
    return ((acc + 128) >> 8).astype(jnp.uint8)


def fused_pipeline_spatial(
    img: jnp.ndarray, mesh: Mesh, axis_name: str = "sp"
) -> jnp.ndarray:
    """gray -> gaussian5 -> hist-eq on one uint8[H, W, 3], H-sharded.

    H must be divisible by the mesh axis size, with >= 2 rows per shard.
    """
    height, width = int(img.shape[0]), int(img.shape[1])
    n = mesh.shape[axis_name]
    if height % n != 0 or height // n < 2:
        raise ValueError(f"H={height} must be divisible by {axis_name}={n} with >=2 rows/shard")
    n_pixels = height * width

    def local_fn(tile):  # uint8[H/n, W, 3]
        h = tile.shape[0]
        g = grayscale(tile).astype(jnp.int32)
        padded = _exchange_row_halo(g, radius=2, axis_name=axis_name)
        blurred = _gaussian5_from_padded(padded, h, width)
        hist = lax.psum(histogram(blurred), axis_name)
        lut = _equalize_lut(hist, n_pixels)
        return apply_lut(blurred, lut)

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
    )
    fn = jax.jit(
        sharded,
        in_shardings=NamedSharding(mesh, P(axis_name)),
        out_shardings=NamedSharding(mesh, P(axis_name)),
    )
    return fn(img)
