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


def _transpose_hw(img: jnp.ndarray) -> jnp.ndarray:
    """Swap H/W. For HWC uint8, per-plane 2D transposes are ~15x faster on
    TPU than one HWC transpose (the minor channel dim forces a bad layout).
    """
    if img.ndim == 2:
        return jnp.swapaxes(img, 0, 1)
    return jnp.stack(
        [jnp.swapaxes(img[:, :, i], 0, 1) for i in range(img.shape[2])], axis=-1
    )


def rotate90(img: jnp.ndarray) -> jnp.ndarray:
    """CW 90: out[x][H-1-y] = in[y][x] (``ppmx-edward.c:714-717``)."""
    return jnp.flip(_transpose_hw(img), axis=1)


def rotate180(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(jnp.flip(img, axis=0), axis=1)


def rotate270(img: jnp.ndarray) -> jnp.ndarray:
    """CCW 90: out[W-1-y][x] = in[x][y] (``ppmx-edward.c:722-725``)."""
    return jnp.flip(_transpose_hw(img), axis=0)


def _split_f64(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """float64 -> (f32 hi, f32 lo) with hi + lo == x to double-f32 precision."""
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


@functools.lru_cache(maxsize=64)
def _rotation_geometry(height: int, width: int, angle: float):
    """O(H + W) host-side rotation geometry (float64, exact C expressions).

    The per-pixel inverse map separates: nX[i, j] = (cos*x0)[j] + (sin*y0)[i]
    + x_center (``ppmx-edward.c:741-742``), so only the 1-D terms are
    computed on host; the O(outH*outW) combination happens on device in
    double-f32 (see `_rotate_apply`). This replaces a ~600 MB, minutes-long
    host plan at 4K with kilobytes.
    """
    folded = _exact.fold_angle(float(angle))
    new_w, new_h = _exact.calc_rot_size(folded, width, height)
    theta = (float(angle) * np.pi) / 180.0
    x_center = width // 2
    y_center = height // 2
    x_offset = new_w // 2 - x_center
    y_offset = new_h // 2 - y_center

    xs = np.arange(new_w, dtype=np.float64) - x_offset - x_center
    ys = np.arange(new_h, dtype=np.float64) - y_offset - y_center
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    ax = cos_t * xs       # nX = ax[j] + bx[i] + x_center
    bx = sin_t * ys
    ay = -sin_t * xs      # nY = ay[j] + by[i] + y_center
    by = cos_t * ys
    return (
        new_h,
        new_w,
        _split_f64(ax),
        _split_f64(bx),
        _split_f64(ay),
        _split_f64(by),
        float(x_center),
        float(y_center),
    )


def _two_sum(p, q):
    """Knuth two-sum: p + q = s + err exactly (f32)."""
    s = p + q
    bb = s - p
    err = (p - (s - bb)) + (q - bb)
    return s, err


def _combine_df32(a_hi, a_lo, b_hi, b_lo, c):
    """(a + b + c) as (hi, lo) double-f32; a, b are broadcast row/col terms."""
    s, e = _two_sum(a_hi, b_hi)
    s2, e2 = _two_sum(s, c)
    return s2, e + e2 + (a_lo + b_lo)


def _floor_df32(hi, lo, add=0.0):
    """floor(hi + lo + add) with f64-grade boundary decisions.

    hi - t is exact (Sterbenz: |hi - t| <= ~1, same magnitude), so the
    residual d carries full precision and fixes up the f32 floor.
    """
    t = jnp.floor(hi + (lo + add))
    d = (hi - t) + (lo + add)
    t = jnp.where(d >= 1.0, t + 1.0, t)
    t = jnp.where(d < 0.0, t - 1.0, t)
    return t


def _cubic_f32(x):
    """Keys a=-0.5 bicubic kernel in f32 (``ppmx-edward.c:477-489``)."""
    absx = jnp.abs(x)
    absx2 = absx * absx
    absx3 = absx2 * absx
    ret = jnp.where(absx <= 1.0, (1.5 * absx3) - (2.5 * absx2) + 1.0, 0.0)
    return jnp.where(
        (1.0 < absx) & (absx <= 2.0),
        ret + ((-0.5 * absx3) + (2.5 * absx2) - (4.0 * absx) + 2.0),
        ret,
    )


@functools.partial(jax.jit, static_argnames=("new_h", "new_w"))
def _rotate_apply(img, ax, bx, ay, by, xc, yc, *, new_h: int, new_w: int):
    """Device-side inverse-map rotation (``ppmx-edward.c:727-785``).

    Coordinates combine in double-f32 (hi/lo pairs from the exact f64 host
    terms), so zone masks, nearest indices, and tap bases match the C's
    float64 decisions except within ~1e-7 of a rounding boundary; interior
    bicubic accumulates in f32 (the documented +-1 LSB budget).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    height, width = img.shape[0], img.shape[1]
    (ax_hi, ax_lo), (bx_hi, bx_lo) = ax, bx
    (ay_hi, ay_lo), (by_hi, by_lo) = ay, by

    nx_hi, nx_lo = _combine_df32(
        ax_hi[None, :], ax_lo[None, :], bx_hi[:, None], bx_lo[:, None], xc
    )
    ny_hi, ny_lo = _combine_df32(
        ay_hi[None, :], ay_lo[None, :], by_hi[:, None], by_lo[:, None], yc
    )

    rX = _floor_df32(nx_hi, nx_lo, 0.5)  # round half up, integer-valued f32
    rY = _floor_df32(ny_hi, ny_lo, 0.5)
    in_bounds = (rX < width) & (rY < height) & (rY >= 0) & (rX >= 0)
    interior = (
        in_bounds
        & (rX > 1)
        & (rY > 1)
        & (rX < max(width - 2, 0))
        & (rY < max(height - 2, 0))
    )
    edge = in_bounds & ~interior

    nearest_y = jnp.clip(rY, 0, height - 1).astype(jnp.int32)
    nearest_x = jnp.clip(rX, 0, width - 1).astype(jnp.int32)

    fbase_x = _floor_df32(nx_hi, nx_lo) - 1.0
    fbase_y = _floor_df32(ny_hi, ny_lo) - 1.0
    base_x = jnp.clip(fbase_x, 0, max(width - 4, 0)).astype(jnp.int32)
    base_y = jnp.clip(fbase_y, 0, max(height - 4, 0)).astype(jnp.int32)

    # Tap weights cubic(nX - u); (hi - u) is Sterbenz-exact, lo restores the
    # f64-grade fraction.
    wx = [
        _cubic_f32((nx_hi - (fbase_x + i)) + nx_lo) for i in range(4)
    ]
    wy = [
        _cubic_f32((ny_hi - (fbase_y + j)) + ny_lo) for j in range(4)
    ]

    src = img.astype(jnp.float32)
    out_shape = (new_h, new_w, img.shape[2])
    acc = jnp.zeros(out_shape, dtype=jnp.float32)
    # C accumulation structure (:753-769): inner i-sum weighted by cubic in x,
    # outer j-sum weighted by cubic in y. 16 static gathers.
    for j in range(4):
        p = jnp.zeros(out_shape, dtype=jnp.float32)
        for i in range(4):
            tap = src[base_y + j, base_x + i]
            p = p + tap * wx[i][:, :, None]
        acc = acc + p * wy[j][:, :, None]
    acc = jnp.where(acc < 0.0, 0.0, acc)
    acc = jnp.where(acc >= 256.0, 255.0, acc)
    interior_val = acc.astype(jnp.int32).astype(jnp.uint8)  # (int) truncation

    nearest_val = img[nearest_y, nearest_x]

    out = jnp.zeros(out_shape, dtype=jnp.uint8)
    out = jnp.where(edge[:, :, None], nearest_val, out)
    out = jnp.where(interior[:, :, None], interior_val, out)
    return out[:, :, 0] if squeeze else out


def rotate_exact(img, angle_deg: float):
    """float64 exactness mode (survey §4): bit-exact vs the C binary.

    Runs the golden host path (f64 j-then-i accumulation). For verification
    or when the f32 interior's +-1 LSB budget is unacceptable.
    """
    from imageprocessingtools_tpu.golden import model as _golden

    return _golden.rotate(np.asarray(img), float(angle_deg))


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
    new_h, new_w, ax, bx, ay, by, xc, yc = _rotation_geometry(
        img.shape[0], img.shape[1], angle
    )
    to_dev = lambda pair: (jnp.asarray(pair[0]), jnp.asarray(pair[1]))
    return _rotate_apply(
        jnp.asarray(img),
        to_dev(ax),
        to_dev(bx),
        to_dev(ay),
        to_dev(by),
        xc,
        yc,
        new_h=new_h,
        new_w=new_w,
    )
