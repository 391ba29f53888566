"""rotate_fast: TPU-native 3-shear rotation (DEPRECATED, non-parity).

DEPRECATED since round 3: the blocked-MXU `ops.geometry.rotate` is ~11x
faster at 4K (59 vs 659 ms, PROFILE_r02) AND keeps the reference's exact
zone semantics, so this op is strictly dominated — worse speed and worse
semantics, with no compensating property. Calling it emits a
DeprecationWarning pointing at `rotate`; it is no longer exported from
`ops`. Its three per-line resampling stages would need the blocked
rotation's own tile/banded-matmul machinery to go fast on the MXU, at
which point it IS the blocked rotation with worse resampling.

The reference's arbitrary rotation is a per-destination-pixel 2-D bicubic
gather (``ppmx-edward.c:729-785``). This op predates the blocked MXU form
of `ops.geometry.rotate`; it factorizes the same inverse affine
map via Paeth shears:

    R = Sx(t) . Sy(-s) . Sx(t),   t = tan(theta/2), s = sin(theta)

Writing the destination->source map src = R (dst - c_dst) + c_src and using
the identities s*t + cos = 1 and sin - cos*t = t, the three resampling
stages close EXACTLY with per-line-constant offsets:

    stage 1 (x): I1[w, u]   = SRC(u + c1(w), w),    c1(w) = t*w + Cx - t*Cy - k3
    stage 2 (y): I2[v, u]   = I1(v + c2(u), u),     c2(u) = -s*(u - k3) + Cy - Cdy
    stage 3 (x): OUT[i, j]  = I2(i, j + c3(i)),     c3(i) = t*(i - Cdy) + k3

so the geometric mapping matches the exact op to machine precision; only the
RESAMPLING differs (three separable Keys-cubic passes with black fill
instead of one 2-D bicubic with a nearest edge band). Each stage is a
contiguous `dynamic_slice` per line (cheap on TPU — no per-element gathers)
plus four VPU multiply-adds with per-line scalar cubic weights; the vertical
stage rides transposes. Orthogonal parts (0/90/180/270) are taken exactly by permutation; the
residual angle is in (-45, 45] so canvas growth stays bounded
(|t| <= tan 22.5 deg).

Spec mirror: `golden.rotate_fast` implements the identical algorithm in
float64; the device output matches it within the usual +-1 f32 budget.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from imageprocessingtools_tpu.ops import _exact
from imageprocessingtools_tpu.ops.geometry import (
    _cubic_f32,
    rotate90,
    rotate180,
    rotate270,
)


def _decompose(angle_deg: float) -> tuple[int, float]:
    """angle = quarter * 90 + residual, residual in (-45, 45]."""
    angle = float(angle_deg) % 360.0
    quarter = int(round(angle / 90.0)) % 4
    residual = angle - 90.0 * round(angle / 90.0)
    return quarter, residual


class ShearRotatePlan:
    """Host float64 geometry for the three stages (one (h, w, phi) triple)."""

    def __init__(self, height: int, width: int, residual_deg: float):
        theta = math.radians(residual_deg)
        t = math.tan(theta / 2.0)
        s = math.sin(theta)

        folded = _exact.fold_angle(residual_deg % 360.0)
        new_w, new_h = _exact.calc_rot_size(folded, width, height)
        # Reference center conventions (``ppmx-edward.c:694-698``).
        cx, cy = width // 2, height // 2
        cdx, cdy = new_w // 2, new_h // 2

        i = np.arange(new_h, dtype=np.float64)
        c3_raw = t * (i - cdy)
        k3 = -math.floor(c3_raw.min())  # anchor stage-3 offsets at >= 0
        c3 = c3_raw + k3
        # Stage-2/1 column range: u = j + c3(i), plus cubic tap reach (+2).
        u_count = int(math.ceil(new_w + c3.max())) + 3

        u = np.arange(u_count, dtype=np.float64)
        c2 = -s * (u - k3 - cdx) + cy - cdy
        w0 = math.floor(c2.min()) - 1  # lowest I1 row any stage-2 tap touches
        h1_count = int(math.ceil((new_h - 1) + c2.max())) + 3 - w0

        w_rows = np.arange(h1_count, dtype=np.float64) + w0
        c1 = t * w_rows + cx - t * cy - k3 - cdx

        self.new_h, self.new_w = new_h, new_w
        self.u_count, self.h1_count, self.w0 = u_count, h1_count, w0
        self.c1_int = np.floor(c1).astype(np.int64)
        self.c1_frac = (c1 - np.floor(c1)).astype(np.float32)
        c2_shifted = c2 - w0  # stage-2 taps into I1's stored rows
        self.c2_int = np.floor(c2_shifted).astype(np.int64)
        self.c2_frac = (c2_shifted - np.floor(c2_shifted)).astype(np.float32)
        self.c3_int = np.floor(c3).astype(np.int64)
        self.c3_frac = (c3 - np.floor(c3)).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _plan(height: int, width: int, residual: float) -> ShearRotatePlan:
    return ShearRotatePlan(height, width, residual)


def _resample_rows(src, row_starts, fracs, out_w: int):
    """Per-row x-resample: out[r, c] = cubic(src_row_r at c + offset_r).

    src f32[R, W, C]; row_starts int[R] = floor(offset)-1 relative to src
    columns (may be negative — black padding is added); fracs f32[R].
    One contiguous dynamic_slice per row + 4 multiply-adds.
    """
    r_, w_, ch = src.shape
    lo = int(max(0, -int(row_starts.min())))
    hi = int(max(0, int(row_starts.max()) + out_w + 3 - w_))
    padded = jnp.pad(src, ((0, 0), (lo, hi), (0, 0)))
    starts = jnp.asarray(row_starts + lo, dtype=jnp.int32)

    sl = jax.vmap(
        lambda row, st: jax.lax.dynamic_slice(row, (st, 0), (out_w + 3, ch))
    )(padded, starts)
    k = jnp.arange(4, dtype=jnp.float32)
    w = _cubic_f32(fracs[:, None] + 1.0 - k[None, :])  # [R, 4]
    return (
        sl[:, 0:out_w] * w[:, 0][:, None, None]
        + sl[:, 1 : out_w + 1] * w[:, 1][:, None, None]
        + sl[:, 2 : out_w + 2] * w[:, 2][:, None, None]
        + sl[:, 3 : out_w + 3] * w[:, 3][:, None, None]
    )


def _transpose_f32(x):
    return jnp.stack(
        [jnp.swapaxes(x[:, :, c], 0, 1) for c in range(x.shape[2])], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("height", "width", "residual"))
def _shear_rotate_apply(img, *, height: int, width: int, residual: float):
    plan = _plan(height, width, residual)
    src = img.astype(jnp.float32)

    # Stage 1: source rows w0..w0+H1-1 (black outside), x-resample by c1.
    pad_top = max(0, -plan.w0)
    pad_bot = max(0, plan.w0 + plan.h1_count - height)
    banded = jnp.pad(src, ((pad_top, pad_bot), (0, 0), (0, 0)))
    banded = jax.lax.dynamic_slice_in_dim(
        banded, plan.w0 + pad_top, plan.h1_count, axis=0
    )
    # taps at u + c1(w): base column = floor(c1)-1 relative to src columns
    i1 = _resample_rows(
        banded,
        plan.c1_int - 1,
        jnp.asarray(plan.c1_frac),
        plan.u_count,
    )

    # Stage 2: y-resample by c2 (per column) — transpose, row-resample, back.
    i1_t = _transpose_f32(i1)  # [U, H1, C]
    i2_t = _resample_rows(
        i1_t,
        plan.c2_int - 1,
        jnp.asarray(plan.c2_frac),
        plan.new_h,
    )
    i2 = _transpose_f32(i2_t)  # [new_h, U, C]

    # Stage 3: x-resample by c3 (per output row).
    out = _resample_rows(
        i2,
        plan.c3_int - 1,
        jnp.asarray(plan.c3_frac),
        plan.new_w,
    )
    return jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0).astype(jnp.uint8)


def rotate_fast(img: jnp.ndarray, angle_deg: float) -> jnp.ndarray:
    """CW rotation via three shears; same bbox/centers as the exact op.

    DEPRECATED: use `ops.rotate` — faster (blocked MXU) and reference-exact.
    NOT bit-parity with the reference (separable cubic resampling, black
    fill, no nearest edge band). 0/90/180/270 are exact.
    """
    import warnings

    warnings.warn(
        "rotate_fast is deprecated: ops.rotate is ~11x faster at 4K and "
        "keeps exact reference zone semantics",
        DeprecationWarning,
        stacklevel=2,
    )
    quarter, residual = _decompose(angle_deg)
    out = jnp.asarray(img)
    if quarter == 1:
        out = rotate90(out)
    elif quarter == 2:
        out = rotate180(out)
    elif quarter == 3:
        out = rotate270(out)
    if abs(residual) < 1e-12:
        return out

    squeeze = out.ndim == 2
    if squeeze:
        out = out[:, :, None]
    result = _shear_rotate_apply(
        out, height=out.shape[0], width=out.shape[1], residual=residual
    )
    return result[:, :, 0] if squeeze else result
