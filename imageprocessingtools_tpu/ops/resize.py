"""Separable bicubic resize as two MXU matmuls.

The reference precomputes per-output-row tap indices/weights and applies them
with scalar loops (``ppmx-edward.c:516-641, 808-872``). The TPU-idiomatic form
scatters those taps into dense weight matrices ``W_h [outH, H]`` and
``W_w [outW, W]`` on host (float64, exact — `ops/_exact`), and applies
``quantize(W_h @ img)`` then ``quantize(img @ W_w^T)`` on device — each pass a
single dense matmul on the MXU, with the reference's uint8 requantization
between passes and its pass order (smaller scale factor first,
``ppmx-edward.c:1102-1120``).

float32 accumulation vs the C double carries the documented +-1 LSB budget
PER QUANTIZED PASS; because the reference requantizes to uint8 between the
two passes, a pass-1 flip can stack with pass-2's own rounding — worst
observed |diff| is 2 at a single pixel (first hits after 2,080 fuzz
campaign cases: seeds 950088/960030; see ops/common.py::float_stage_budget
and the regression tests in tests/test_fuzz_differential.py). The
contributions themselves (indices, weights, pruning) are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from imageprocessingtools_tpu.ops import _exact
from imageprocessingtools_tpu.ops.common import quantize_u8


# Dense weight matrices above this element count take the f64 host path
# instead (see resize_width): ~1 GB of f32 per pass is past what the tunnel
# transfer + HBM layout tolerate, and such geometries are extreme-aspect
# corner cases, not throughput paths.
_DENSE_LIMIT = 2**28


def _dense_infeasible(height: int, width: int, new_width: int) -> bool:
    new_height = _exact.resize_output_height(height, width, new_width)
    if new_height < 1:
        return False  # let plan_resize raise the B7 surface
    return max(new_height * height, new_width * width) > _DENSE_LIMIT


@functools.lru_cache(maxsize=32)
def _resize_plan_arrays(height: int, width: int, new_width: int):
    # Cache host numpy only: caching jnp arrays would leak tracers when the
    # first call happens inside a jit trace (constants are trace-local).
    plan = _exact.plan_resize(height, width, new_width)
    mats = []
    for dim, contrib in plan.passes:
        in_size = height if dim == 0 else width
        mats.append((dim, _exact.dense_weights(contrib, in_size).astype(np.float32)))
    return plan.new_height, plan.new_width, tuple(mats)


def _apply_pass(img: jnp.ndarray, weight: jnp.ndarray, dim: int) -> jnp.ndarray:
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    src = img.astype(jnp.float32)
    # precision=HIGH (3-pass bf16 ~ f32-grade): measured within the +-1
    # budget across a 24-case on-TPU fuzz vs the f64 golden (worst diff 1)
    # and faster than HIGHEST at 4K (6.56 vs 7.26 ms same-run; both
    # readings carried a common ~5 ms harness-feedback term — see the
    # correction note below — so the net matmul gap is larger than the
    # raw 10%). The plain TPU default (1-pass bf16) has a worst-case
    # tap-rounding error of several LSB, so it stays off parity paths.
    if dim == 0:
        # out[o, w, c] = sum_h W[o, h] * img[h, w, c]
        acc = jnp.einsum(
            "oh,hwc->owc",
            weight,
            src,
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
    else:
        # out[h, o, c] = sum_w img[h, w, c] * W[o, w]
        acc = jnp.einsum(
            "ow,hwc->hoc",
            weight,
            src,
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
    out = quantize_u8(acc)
    return out[:, :, 0] if squeeze else out


# ---------------------------------------------------------------------------
# Banded apply: exploit the weight matrices' band structure.
#
# Each W row has <= ceil(4/scale)+2 nonzero taps in a contiguous (mirror-
# reflected at edges, still local) index range, so the dense [out, in]
# matmul does mostly zero MACs — at 4K -> 1080p, 2160 columns vs a ~26-wide
# band. Rows are grouped (static group size) and each group contracts only
# its band. MEASURED on the chip (same-run A/B at 4K->1920): banded loses,
# 10.7-11.1 ms vs 7.05 ms dense across G in {32, 64, 128, 256} and for a
# banded-H/dense-W hybrid — the dense matmul is MXU-throughput-rich, not
# bandwidth-bound, and the per-group concats/launches cost more than the
# skipped zero MACs. Kept for reference and OFF by default; it only
# approaches parity on big upscales (13.0 vs 14.0 ms at 4K->7680).
# f32 sums over the extra zeros are exact, so banded and dense agree except
# for MXU accumulation-order ulps — both inside the documented +-1 budget.
#
# Upscale re-check with the validated harness (late round 3, compile-once
# interleaved 5-pass A/B): banded edges dense at 4K->7680 by ~4% (9.12 vs
# 9.48 ms median; banded won all 5 passes, even running HIGHEST vs the
# dense path's HIGH) but loses at 1080p->3840 (1.49 vs 1.14). A ~4% win
# confined to giant upscales doesn't justify routing: the dense default
# stands, and the honest numbers replace the tax-carrying 13.0-vs-14.0
# reading quoted above.
#
# Also measured and REJECTED (same-run A/B at 4K->1920 on the chip): a
# two-level int8 weight split (w ~ q1/64 + q2/8192, exact int32 MXU dots —
# the Pallas rotation kernel's scheme) ran 9.41 ms vs 6.69 for the f32
# HIGH einsum: the (x-128)->int8 recentering cast, the two separate dots,
# and the i32 h-combine on the full output cost more than the int8 MXU
# rate saves. It also carries a +-2 budget (its ~0.1-LSB per-pass weight
# error flips ~2% of pass-1 roundings, which the second pass can amplify),
# so it lost on both axes and was removed.
#
# CORRECTION (late round 3, FEEDBACK_VALIDATION_r03.json): every absolute
# number in the two A/B paragraphs above was measured with the loop
# harness's ravel/tile feedback, which for shape-changing outputs costs
# ~5 ms at this geometry ON ITS OWN (the same artifact class that
# polluted PROFILE_r02's gray/mono rows). The A/B *conclusions* stand —
# both sides of each comparison carried the same tax, and net of it the
# margins only widen (banded ~5.5 vs dense ~1.3; int8 ~4.2 vs ~1.4) —
# but the honest absolute cost of the dense HIGH resize at 4K->1920 is
# ~1.3 ms (validated two ways: scalar-reduction-feedback loop 1.27-1.36
# ms vs a feedback-free dense-dependency chain 0.95-1.60 ms, same run).
# ---------------------------------------------------------------------------

_BAND_GROUP = 32  # output rows per block: band stays small, M-dim utilization ok


@functools.lru_cache(maxsize=32)
def _banded_blocks(height: int, width: int, new_width: int):
    """Per-pass banded weight blocks: tuple of (dim, ((start, Wb), ...))."""
    plan = _exact.plan_resize(height, width, new_width)
    passes = []
    for dim, contrib in plan.passes:
        idx, wts = contrib.indices, contrib.weights
        out_size, taps = idx.shape
        blocks = []
        for s in range(0, out_size, _BAND_GROUP):
            e = min(s + _BAND_GROUP, out_size)
            lo = int(idx[s:e].min())
            hi = int(idx[s:e].max()) + 1
            wb = np.zeros((e - s, hi - lo), dtype=np.float64)
            rows = np.repeat(np.arange(e - s), taps)
            np.add.at(wb, (rows, (idx[s:e] - lo).ravel()), wts[s:e].ravel())
            blocks.append((lo, hi, wb.astype(np.float32)))
        passes.append((dim, tuple(blocks)))
    return plan.new_height, plan.new_width, tuple(passes)


def _apply_pass_banded(img: jnp.ndarray, blocks, dim: int) -> jnp.ndarray:
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    if dim == 1:
        # Resize W as a row-banded pass on per-plane transposed data (HWC
        # transposes are slow on TPU; per-plane 2D ones are cheap).
        from imageprocessingtools_tpu.ops.geometry import _transpose_hw

        out = _apply_pass_banded(_transpose_hw(img), blocks, 0)
        out = _transpose_hw(out)
        return out[:, :, 0] if squeeze else out
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(jnp.float32)
    parts = [
        jax.lax.dot(
            jnp.asarray(wb), flat[lo:hi],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        for lo, hi, wb in blocks
    ]
    acc = jnp.concatenate(parts, axis=0).reshape(-1, w, c)
    out = quantize_u8(acc)
    return out[:, :, 0] if squeeze else out


def resize_width(
    img: jnp.ndarray, new_width: int, banded: bool | None = None
) -> jnp.ndarray:
    """Resize to ``new_width``; height = trunc(H * new_width / W) (B6).

    Matches ``-wN``: MATLAB-imresize-compatible bicubic with antialiasing on
    downscale and mirror boundaries. ``banded=True`` selects the
    banded-matmul apply — measured SLOWER than dense on the MXU (see module
    comment), so it is off by default and exists as a documented
    alternative.
    """
    if banded is None:
        banded = False
    if _dense_infeasible(img.shape[0], img.shape[1], int(new_width)) and not isinstance(
        img, jax.core.Tracer
    ):
        # Extreme aspect geometries (e.g. the B9 wrap case 4294968x1 -w1000,
        # a real 1000x704 output per the reference) make the dense [out, in]
        # weight matrix enormous even though the output and the contributions
        # [out, taps] are small. The f64 golden path applies taps directly —
        # O(out*taps) memory — and is bit-exact vs the C, strictly stronger
        # than the MXU path's +-1 budget. Concrete arrays only: under a jit
        # trace there is no host escape (and the dense constant would not
        # compile anyway).
        return jnp.asarray(resize_width_exact(img, int(new_width)))
    if banded:
        _, _, passes = _banded_blocks(img.shape[0], img.shape[1], int(new_width))
        out = img
        for dim, blocks in passes:
            out = _apply_pass_banded(out, blocks, dim)
        return out
    _, _, mats = _resize_plan_arrays(img.shape[0], img.shape[1], int(new_width))
    out = img
    for dim, weight in mats:
        out = _apply_pass(out, jnp.asarray(weight), dim)
    return out


def _hw_passes(height: int, width: int, new_height: int, new_width: int):
    """Both contribution passes for an explicit (H, W) target, smaller
    scale first (the reference's -wN ordering rule, applied generally)."""
    scale_h = float(new_height) / float(height)
    scale_w = float(new_width) / float(width)
    contrib_h = _exact.calc_contributions(height, new_height, scale_h)
    contrib_w = _exact.calc_contributions(width, new_width, scale_w)
    return (
        ((0, contrib_h), (1, contrib_w))
        if scale_h < scale_w
        else ((1, contrib_w), (0, contrib_h))
    )


@functools.lru_cache(maxsize=32)
def _resize_hw_plan_arrays(height: int, width: int, new_height: int, new_width: int):
    """General (H, W) target: both passes as dense f32 weight matrices."""
    mats = []
    for dim, contrib in _hw_passes(height, width, new_height, new_width):
        in_size = height if dim == 0 else width
        mats.append((dim, _exact.dense_weights(contrib, in_size).astype(np.float32)))
    return tuple(mats)


def resize_width_exact(img, new_width: int):
    """float64 exactness mode (survey §4): bit-exact vs the C binary.

    Runs the golden host path (sequential f64 tap accumulation — TPU has no
    f64). Use for verification / when +-1 LSB is unacceptable.
    """
    import numpy as np

    from imageprocessingtools_tpu.golden import model as _golden

    return _golden.resize_width(np.asarray(img), int(new_width))


def resize(img: jnp.ndarray, new_height: int, new_width: int) -> jnp.ndarray:
    """Library extension: resize to an explicit (new_height, new_width).

    Same guards as `resize_width`: outputs beyond the resource caps raise
    up front (a clear extension message, not the -wN parity surface), and
    extreme-aspect geometries whose dense weight matrix would exceed the
    feasible size take the f64 host tap path (bit-exact, O(out*taps)
    memory) instead of materializing an O(out*in) matrix.
    """
    new_height, new_width = int(new_height), int(new_width)
    if new_height < 1 or new_width < 1:
        raise ValueError("invalid option for new width\n")
    if (
        max(new_height, new_width) > _exact._MAX_RESIZE_DIM
        or new_height * new_width > _exact._MAX_RESIZE_OUT_PX
    ):
        raise ValueError(
            f"resize output {new_height}x{new_width} exceeds the supported "
            f"bound (dim <= 2^26, pixels <= 2^31)"
        )
    height, width = img.shape[0], img.shape[1]
    if max(new_height * height, new_width * width) > _DENSE_LIMIT and not isinstance(
        img, jax.core.Tracer
    ):
        from imageprocessingtools_tpu.golden.model import _apply_contributions

        out_np = np.asarray(img)
        for dim, contrib in _hw_passes(height, width, new_height, new_width):
            out_np = _apply_contributions(out_np, contrib, dim)
        return jnp.asarray(out_np)
    mats = _resize_hw_plan_arrays(height, width, new_height, new_width)
    out = img
    for dim, weight in mats:
        out = _apply_pass(out, jnp.asarray(weight), dim)
    return out
