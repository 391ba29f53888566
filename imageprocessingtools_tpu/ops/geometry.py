"""Geometric ops: flips, orthogonal rotations, arbitrary-angle rotation.

Flips and 90/180/270 rotations are pure index permutations (bit-exact by
construction), expressed as lane-friendly transpose/reverse so XLA lowers them
to efficient copies (``ppmx-edward.c:888-913``, ``:714-725``).

Arbitrary-angle rotation splits reference-style (``ppmx-edward.c:673-785``):
all double-precision *decisions* (inverse map, zone masks, tap bases, cubic
weights) are precomputed on host in float64 (`ops/_exact.plan_rotation`), and
the device does only gathers + multiply-accumulates in float32. Interior
pixels carry the +-1 LSB budget from f32 accumulation; zone choice and nearest
indices are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from imageprocessingtools_tpu.ops import _exact


def flip_vertical(img: jnp.ndarray) -> jnp.ndarray:
    """Row reversal (``ppmx-edward.c:898-904``)."""
    return jnp.flip(img, axis=0)


def flip_horizontal(img: jnp.ndarray) -> jnp.ndarray:
    """Column reversal (``ppmx-edward.c:906-911``)."""
    return jnp.flip(img, axis=1)


def rotate90(img: jnp.ndarray) -> jnp.ndarray:
    """CW 90: out[x][H-1-y] = in[y][x] (``ppmx-edward.c:714-717``)."""
    return jnp.flip(jnp.swapaxes(img, 0, 1), axis=1)


def rotate180(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(jnp.flip(img, axis=0), axis=1)


def rotate270(img: jnp.ndarray) -> jnp.ndarray:
    """CCW 90: out[W-1-y][x] = in[x][y] (``ppmx-edward.c:722-725``)."""
    return jnp.flip(jnp.swapaxes(img, 0, 1), axis=0)


@functools.lru_cache(maxsize=32)
def _rotation_plan_arrays(height: int, width: int, angle: float):
    # Cache host numpy only (jnp constants created inside a trace are
    # trace-local; caching them across traces leaks tracers).
    plan = _exact.plan_rotation(height, width, angle)
    return (
        plan.new_height,
        plan.new_width,
        plan.interior,
        plan.edge,
        plan.nearest_y,
        plan.nearest_x,
        plan.base_y,
        plan.base_x,
        plan.weights_y.astype(np.float32),
        plan.weights_x.astype(np.float32),
    )


@functools.partial(jax.jit, donate_argnums=())
def _rotate_apply(img, interior, edge, ny, nx, by, bx, wy, wx):
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    src = img.astype(jnp.float32)
    channels = img.shape[2]
    out_shape = interior.shape + (channels,)

    acc = jnp.zeros(out_shape, dtype=jnp.float32)
    # C accumulation structure (:753-769): inner i-sum weighted by cubic in x,
    # outer j-sum weighted by cubic in y. 16 static gathers.
    for j in range(4):
        p = jnp.zeros(out_shape, dtype=jnp.float32)
        for i in range(4):
            tap = src[by + j, bx + i]
            p = p + tap * wx[:, :, i][:, :, None]
        acc = acc + p * wy[:, :, j][:, :, None]
    acc = jnp.where(acc < 0.0, 0.0, acc)
    acc = jnp.where(acc >= 256.0, 255.0, acc)
    interior_val = acc.astype(jnp.int32).astype(jnp.uint8)  # (int) truncation

    nearest_val = img[ny, nx]

    out = jnp.zeros(out_shape, dtype=jnp.uint8)
    out = jnp.where(edge[:, :, None], nearest_val, out)
    out = jnp.where(interior[:, :, None], interior_val, out)
    return out[:, :, 0] if squeeze else out


def rotate(img: jnp.ndarray, angle_deg: float) -> jnp.ndarray:
    """CW rotation by ``angle_deg`` with the reference's exact zone logic.

    ``angle_deg`` must be static (output shape depends on it). 0/90/180/270
    take exact permutation fast paths (``ppmx-edward.c:701-725``).
    """
    angle = float(angle_deg)
    if angle == 0.0:
        return jnp.asarray(img)
    if angle == 90.0:
        return rotate90(img)
    if angle == 180.0:
        return rotate180(img)
    if angle == 270.0:
        return rotate270(img)
    (_, _, interior, edge, ny, nx, by, bx, wy, wx) = _rotation_plan_arrays(
        img.shape[0], img.shape[1], angle
    )
    return _rotate_apply(
        img,
        jnp.asarray(interior),
        jnp.asarray(edge),
        jnp.asarray(ny),
        jnp.asarray(nx),
        jnp.asarray(by),
        jnp.asarray(bx),
        jnp.asarray(wy),
        jnp.asarray(wx),
    )
