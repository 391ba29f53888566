"""Shared device-side helpers: exact rounding and uint8 quantization.

The reference rounds with ``floor(v + 0.5)`` (round-half-up, ``ppmx-edward.c:27``)
and clamps with ``< 0 -> 0``, ``>= 256 -> 255`` (``ppmx-edward.c:831-837``).
``jnp.round`` is banker's rounding and must never be used on a parity path.
"""

from __future__ import annotations

import jax.numpy as jnp


def round_half_up(x: jnp.ndarray) -> jnp.ndarray:
    """floor(x + 0.5) — the reference's rounding everywhere."""
    return jnp.floor(x + 0.5)


def clamp_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Reference clamp: < 0 -> 0, >= 256 -> 255 (works for float or int x)."""
    x = jnp.where(x < 0, 0, x)
    x = jnp.where(x >= 256, 255, x)
    return x.astype(jnp.uint8)


def quantize_u8(acc: jnp.ndarray) -> jnp.ndarray:
    """round-half-up + reference clamp + uint8 cast (resize epilogue)."""
    return clamp_u8(round_half_up(acc))


def as_f32(img: jnp.ndarray) -> jnp.ndarray:
    return img.astype(jnp.float32)


def as_i32(img: jnp.ndarray) -> jnp.ndarray:
    return img.astype(jnp.int32)
