"""Pallas TPU kernels: tiled stencils with halo, fused elementwise chain,
and MXU histogram / LUT-apply variants.

Design notes (see /opt/skills/guides/pallas_guide.md):
- Kernels tile the image over row blocks [TR, W]; W rides the 128-lane axis
  (4K width 3840 = 30 * 128). Row halos come from passing the SAME input
  array multiple times with shifted block index maps (prev/cur/next) — the
  standard Pallas halo pattern; global-boundary blocks replicate their own
  edge rows, matching `ops.stencil`'s replicate padding bit-exactly.
- All arithmetic is the integer-exact spec from `ops/stencil.py`, so pallas
  and XLA paths are interchangeable bit-for-bit.
- The histogram/LUT kernels use the nibble-one-hot MXU trick of
  `ops/histogram.py`, re-formulated in round 3 (slab-expanded LANE-major
  one-hots — design comment above `_expand_rows16`) so they compile and
  run ON HARDWARE: the round-2 sublane-major form needed a
  [TR, W] -> [TR*W, 1] reshape Mosaic rejects. Clean-harness same-run
  numbers at 4K (PROFILE_r03): histogram 0.21 ms (parity with the XLA
  nibble op), LUT apply 0.13 vs 0.28 ms (2.1x the XLA op), and the
  gray+gauss+hist mega-kernel 1.18 vs 1.38 ms against the fused XLA
  pipeline (bit-identical output; bench.py ships it).
- Kernels run in interpret mode off-TPU so the CPU suite covers them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows_edge(x: jnp.ndarray, block_rows: int) -> tuple[jnp.ndarray, int]:
    """Pad H up to a block_rows multiple by replicating the last row.

    For replicate-boundary stencils this is EXACTLY equivalent to running on
    the original H: every access past H-1 clamps to row H-1 either way. The
    caller slices the output back to H.
    """
    h = x.shape[0]
    padded_h = -(-h // block_rows) * block_rows
    if padded_h != h:
        x = jnp.pad(x, ((0, padded_h - h), (0, 0)), mode="edge")
    return x, h


def _resolve_block_rows(h: int, block_rows: int | None, radius: int, default: int = 128) -> int:
    """Validated block size: >= halo radius, bounded by the (padded) H."""
    br = default if block_rows is None else int(block_rows)
    if br < max(radius, 1):
        raise ValueError(f"block_rows={br} must be >= halo radius {radius}")
    return min(br, max(h, radius, 1))


def _halo_specs(block_rows: int, w: int, n: int):
    return [
        pl.BlockSpec(
            (block_rows, w), lambda i: (jnp.maximum(i - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (block_rows, w), lambda i: (jnp.minimum(i + 1, n - 1), 0),
            memory_space=pltpu.VMEM,
        ),
    ]


def _row_halo(prev_ref, cur, next_ref, radius: int):
    """[TR + 2*radius, W] with neighbor halos / replicated global edges."""
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    tr = cur.shape[0]
    prev_tail = prev_ref[tr - radius :, :].astype(jnp.int32)
    next_head = next_ref[:radius, :].astype(jnp.int32)
    edge_top = jnp.concatenate([cur[:1]] * radius, axis=0)
    edge_bot = jnp.concatenate([cur[tr - 1 :]] * radius, axis=0)
    top = jnp.where(step == 0, edge_top, prev_tail)
    bot = jnp.where(step == n_steps - 1, edge_bot, next_head)
    return jnp.concatenate([top, cur, bot], axis=0)


def _col_edge_pad(x, radius: int):
    w = x.shape[1]
    left = [x[:, :1]] * radius
    right = [x[:, w - 1 :]] * radius
    return jnp.concatenate(left + [x] + right, axis=1)


# ---------------------------------------------------------------------------
# 5x5 binomial Gaussian (separable, integer-exact).
# ---------------------------------------------------------------------------

_GAUSS_TAPS = (1, 4, 6, 4, 1)


def _gauss5_kernel(prev_ref, cur_ref, next_ref, out_ref):
    tr, w = cur_ref.shape
    cur = cur_ref[:].astype(jnp.int32)
    padded = _row_halo(prev_ref, cur, next_ref, radius=2)  # [TR+4, W]
    rows = None
    for dy, k in enumerate(_GAUSS_TAPS):
        term = k * padded[dy : dy + tr, :]
        rows = term if rows is None else rows + term
    rows = _col_edge_pad(rows, 2)
    acc = None
    for dx, k in enumerate(_GAUSS_TAPS):
        term = k * rows[:, dx : dx + w]
        acc = term if acc is None else acc + term
    out_ref[:] = ((acc + 128) >> 8).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def gaussian_blur_pallas(gray: jnp.ndarray, block_rows: int | None = None):
    """uint8[H, W] -> uint8[H, W]; bit-identical to ops.stencil.gaussian_blur."""
    br = _resolve_block_rows(gray.shape[0], block_rows, radius=2)
    padded, h = _pad_rows_edge(gray, br)
    ph, w = padded.shape
    n = ph // br
    out = pl.pallas_call(
        _gauss5_kernel,
        grid=(n,),
        in_specs=_halo_specs(br, w, n),
        out_specs=pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ph, w), jnp.uint8),
        interpret=_interpret(),
    )(padded, padded, padded)
    return out[:h]


# ---------------------------------------------------------------------------
# Generic 3x3 integer stencils: box, sharpen, sobel.
# ---------------------------------------------------------------------------


def _stencil3_kernel(weights, post, prev_ref, cur_ref, next_ref, out_ref):
    tr, w = cur_ref.shape
    cur = cur_ref[:].astype(jnp.int32)
    padded = _col_edge_pad(_row_halo(prev_ref, cur, next_ref, radius=1), 1)
    results = []
    for kern in weights:
        acc = None
        for dy in range(3):
            for dx in range(3):
                c = kern[dy][dx]
                if c == 0:
                    continue
                tap = padded[dy : dy + tr, dx : dx + w]
                term = tap if c == 1 else c * tap
                acc = term if acc is None else acc + term
        results.append(acc)
    out_ref[:] = post(*results).astype(jnp.uint8)


def _make_stencil3(weights, post):
    @functools.partial(jax.jit, static_argnames=("block_rows",))
    def run(img: jnp.ndarray, block_rows: int | None = None):
        br = _resolve_block_rows(img.shape[0], block_rows, radius=1)
        padded, h = _pad_rows_edge(img, br)
        ph, w = padded.shape
        n = ph // br
        out = pl.pallas_call(
            functools.partial(_stencil3_kernel, weights, post),
            grid=(n,),
            in_specs=_halo_specs(br, w, n),
            out_specs=pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ph, w), jnp.uint8),
            interpret=_interpret(),
        )(padded, padded, padded)
        return out[:h]

    return run


from imageprocessingtools_tpu.ops.stencil import _isqrt_round  # noqa: E402


box_blur_pallas = _make_stencil3(
    (((1, 1, 1), (1, 1, 1), (1, 1, 1)),),
    lambda s: (2 * s + 9) // 18,
)
sharpen_pallas = _make_stencil3(
    (((0, -1, 0), (-1, 5, -1), (0, -1, 0)),),
    lambda s: jnp.clip(s, 0, 255),
)
sobel_pallas = _make_stencil3(
    (
        ((-1, 0, 1), (-2, 0, 2), (-1, 0, 1)),
        ((-1, -2, -1), (0, 0, 0), (1, 2, 1)),
    ),
    lambda gx, gy: jnp.clip(_isqrt_round(gx * gx + gy * gy), 0, 255),
)


# ---------------------------------------------------------------------------
# Fused elementwise chain kernel (gray from planar RGB + pointwise ops).
# ---------------------------------------------------------------------------


def _elementwise_kernel(chain, r_ref, g_ref, b_ref, out_ref):
    v = (
        r_ref[:].astype(jnp.int32)
        + g_ref[:].astype(jnp.int32)
        + b_ref[:].astype(jnp.int32)
    ) // 3
    for op, arg in chain:
        if op == "invert":
            v = 255 - v
        elif op == "brightness":
            v = jnp.clip(v + int(arg), 0, 255)
        elif op == "contrast":
            # f32 affine + round-half-up (documented +-1 vs the f64 LUT op)
            vf = (v.astype(jnp.float32) - 128.0) * float(arg) + 128.0
            v = jnp.clip(jnp.floor(vf + 0.5), 0.0, 255.0).astype(jnp.int32)
        elif op == "threshold":
            v = jnp.where(v >= int(arg), 255, 0)
        else:
            raise ValueError(f"unknown op {op}")
    out_ref[:] = v.astype(jnp.uint8)


def fused_elementwise_pallas(
    rgb_planes,
    chain: tuple = (),
    block_rows: int | None = None,
) -> jnp.ndarray:
    """One VMEM pass: grayscale of planar RGB + a static pointwise op chain.

    ``rgb_planes``: three uint8[H, W] arrays. ``chain``: tuple of
    ("invert" | "brightness" | "contrast" | "threshold", arg) applied in
    order after grayscale. All integer ops bit-exact; contrast is +-1 vs the
    f64-LUT `ops.color.contrast`.
    """
    r, g, b = rgb_planes
    br = _resolve_block_rows(r.shape[0], block_rows, radius=1)
    r, h = _pad_rows_edge(r, br)
    g, _ = _pad_rows_edge(g, br)
    b, _ = _pad_rows_edge(b, br)
    ph, w = r.shape
    spec = pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_elementwise_kernel, tuple(chain)),
        grid=(ph // br,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((ph, w), jnp.uint8),
        interpret=_interpret(),
    )(r, g, b)
    return out[:h]


# ---------------------------------------------------------------------------
# Histogram + LUT-apply kernels (MXU nibble contraction, VMEM-resident).
# ---------------------------------------------------------------------------


# The in-kernel histogram/LUT design (round 3 — this is what made these
# kernels compile AND go fast on real TPUs):
#
# - LANE-MAJOR one-hots: pixels ride the LANE axis and the nibble dot
#   contracts over lanes (dim 1 x dim 1). The round-2 form put pixels on
#   sublanes, which required the [TR, W] -> [TR*W, 1] reshape Mosaic
#   rejects ("infer-vector-layout: unsupported shape cast").
# - SLAB EXPANSION: dynamic sublane slices must be 8-aligned ("cannot
#   statically prove that index ... is a multiple of 8"), so rows are
#   processed in [8, W] slabs; `_expand_rows16` replicates slab row j onto
#   sublanes 16j..16j+15 with single-vreg `dynamic_gather`s (the rotation
#   kernel's table trick — an [8, W] source is exactly one vreg along the
#   gather dim). One [128, W] x [128, W] dot then computes EIGHT rows' 16x16
#   nibble outer products on the block diagonal at once — 8x fewer MXU
#   FLOPs than a per-row [128, W] dot, and the per-row python loop that
#   cost ~550 s of Mosaic compile time is gone.
# - The 8 diagonal 16x16 blocks are summed OUTSIDE the kernel (XLA side):
#   lane offsets of 16 are not sliceable in-kernel, and it is 8 KB of data.


def _expand_rows16(slab):
    """int32[8, W] -> int32[128, W] with row j at sublanes 16j..16j+15."""
    w = slab.shape[1]
    idx = lax.broadcasted_iota(jnp.int32, (8, w), 0)
    return jnp.concatenate(
        [jnp.take_along_axis(slab, (idx + 8 * c) >> 4, axis=0)
         for c in range(16)],
        axis=0,
    )


def _hist_slab_counts(ref, tr: int, w: int, valid_rows=None,
                      w_real: int | None = None):
    """Block-diagonal nibble counts of ``ref[:tr, :w]`` -> f32[128, 128].

    ``valid_rows(global_row_iota) -> bool`` masks padding rows (their
    expanded values become -1, which matches no nibble); ``w_real`` masks
    padding LANES the same way, generalizing the kernel to W % 128 != 0
    inputs whose column padding is data-dependent (round 4). The true
    histogram is the sum of the 8 diagonal 16x16 blocks
    (`_fold_diag_blocks`).
    """
    iota_m16 = lax.broadcasted_iota(jnp.int32, (128, w), 0) & 15

    def body(s, acc):
        base = pl.multiple_of(s * 8, 8)
        slab = ref[pl.ds(base, 8), :].astype(jnp.int32)
        ex = _expand_rows16(slab)
        if valid_rows is not None:
            rows = base + (lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 4)
            ex = jnp.where(valid_rows(rows), ex, -1)
        if w_real is not None and w_real < w:
            cols = lax.broadcasted_iota(jnp.int32, (128, w), 1)
            ex = jnp.where(cols < w_real, ex, -1)
        hi = ((ex >> 4) == iota_m16).astype(jnp.bfloat16)
        lo = ((ex & 15) == iota_m16).astype(jnp.bfloat16)
        return acc + lax.dot_general(
            hi, lo, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return lax.fori_loop(0, tr // 8, body, jnp.zeros((128, 128), jnp.float32))


def _hist_slab_counts_reg(tile_i32, tr: int, w: int, valid_rows=None,
                          w_real: int | None = None):
    """`_hist_slab_counts` over an in-register int32[tr, w] tile.

    Statically unrolled (tr//8 chained dots; cheap — the expensive unroll
    in the session lore was 64 per-row dot chains, this is one slab dot per
    8 rows), with STATIC sublane slices instead of ref loads. Lets the
    mega-kernel histogram the blurred tile without reading the output
    block back from VMEM.
    """
    iota_m16 = lax.broadcasted_iota(jnp.int32, (128, w), 0) & 15
    acc = jnp.zeros((128, 128), jnp.float32)
    for s in range(tr // 8):
        slab = tile_i32[s * 8 : s * 8 + 8, :]
        ex = _expand_rows16(slab)
        if valid_rows is not None:
            rows = s * 8 + (lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 4)
            ex = jnp.where(valid_rows(rows), ex, -1)
        if w_real is not None and w_real < w:
            cols = lax.broadcasted_iota(jnp.int32, (128, w), 1)
            ex = jnp.where(cols < w_real, ex, -1)
        hi = ((ex >> 4) == iota_m16).astype(jnp.bfloat16)
        lo = ((ex & 15) == iota_m16).astype(jnp.bfloat16)
        acc = acc + lax.dot_general(
            hi, lo, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _fold_diag_blocks(big: jnp.ndarray) -> jnp.ndarray:
    """Sum the 8 diagonal 16x16 blocks of [128, 128] -> int32[256]."""
    blocks = big.reshape(8, 16, 8, 16)
    diag = sum(blocks[j, :, j, :] for j in range(8))
    return diag.reshape(256).astype(jnp.int32)


def _hist_kernel(v_ref, out_ref):
    step = pl.program_id(0)
    tr, w = v_ref.shape
    # Per-step counts are exact in f32 (<= tr*w < 2^24 per bin per step);
    # the CROSS-step accumulator is int32 so any H*W stays exact (round 5:
    # this lifted the 2^24-pixel cap).
    counts = _hist_slab_counts(v_ref, tr, w).astype(jnp.int32)

    @pl.when(step == 0)
    def _():
        out_ref[:] = counts

    @pl.when(step != 0)
    def _():
        out_ref[:] = out_ref[:] + counts


def _pad_to_lane_multiple(x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """Zero-pad W up to a 128 multiple (Mosaic lane-pads blocks with
    UNDEFINED data, which the lane-contraction dots would accumulate)."""
    w = x.shape[1]
    pad = (-w) % 128
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, pad


@functools.partial(jax.jit, static_argnames=("block_rows",))
def histogram_pallas(gray: jnp.ndarray, block_rows: int | None = None):
    """uint8[H, W] -> int32[256]; exact, in-VMEM Pallas kernel.

    Compiles and runs ON HARDWARE (round 3): the lane-major one-hot dot
    needs no shape cast (see `_hist_rows_acc`). Exact at ANY H*W since
    round 5: per-grid-step counts are f32-exact (<= tile pixels < 2^24
    per bin) and the cross-step accumulator is int32.
    """
    br = _resolve_block_rows(gray.shape[0], block_rows, radius=1, default=64)
    br = max(8, br - br % 8)  # slab processing needs 8-row multiples
    h, w0 = gray.shape
    padded_h = -(-h // br) * br
    if padded_h != h:
        # Zero-pad; the extra pixels land in bin 0 and are subtracted below.
        gray = jnp.pad(gray, ((0, padded_h - h), (0, 0)))
    gray, _ = _pad_to_lane_multiple(gray)
    w = gray.shape[1]
    big = pl.pallas_call(
        _hist_kernel,
        grid=(padded_h // br,),
        in_specs=[pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        interpret=_interpret(),
    )(gray)
    hist = _fold_diag_blocks(big)
    pad_pixels = padded_h * w - h * w0  # all zero-valued -> bin 0
    return hist.at[0].add(-pad_pixels) if pad_pixels else hist


def _lut_kernel(v_ref, lut_ref, out_ref):
    """LUT apply with the slab expansion (see histogram design comment).

    Per [8, W] slab: expand rows onto 16-sublane groups, one-hot the hi
    nibble, contract with the BLOCK-DIAGONAL transposed-LUT matrix (row
    16j+b holds lut[a*16+b] at columns 16j+a, so rows only couple within
    their own group): t[16j+b, c] = lut2d[hi_j[c], b]. Select by the lo
    one-hot and reduce each 16-sublane group with one [8, 128] group-sum
    matmul. All values are exact small integers.
    """
    tr, w = v_ref.shape
    iota = lax.broadcasted_iota(jnp.int32, (128, w), 0)
    iota_m16 = iota & 15
    lut_bd = lut_ref[:].astype(jnp.bfloat16)              # [128, 128]
    # G[j, s] = (s >> 4 == j): sums each 16-sublane group to one row.
    g_lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    g_row = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    gsum = ((g_lane >> 4) == g_row).astype(jnp.bfloat16)  # [8, 128]

    def body(s, _):
        base = pl.multiple_of(s * 8, 8)
        slab = v_ref[pl.ds(base, 8), :].astype(jnp.int32)
        ex = _expand_rows16(slab)                         # [128, W]
        hi = ((ex >> 4) == iota_m16).astype(jnp.bfloat16)
        lo = (ex & 15) == iota_m16
        t = lax.dot_general(
            lut_bd, hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [128, W]
        z = jnp.where(lo, t, 0.0).astype(jnp.bfloat16)    # exact (<= 255)
        picked = lax.dot_general(
            gsum, z, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [8, W]
        # Mosaic has no f32->u8 cast; route through int32.
        out_ref[pl.ds(base, 8), :] = picked.astype(jnp.int32).astype(jnp.uint8)
        return 0

    lax.fori_loop(0, tr // 8, body, 0)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def lut_apply_pallas(values: jnp.ndarray, lut: jnp.ndarray, block_rows: int | None = None):
    """uint8[H, W] through an integer [256] LUT; exact, gather-free.

    Same lane-major slab formulation as `histogram_pallas` — compiles and
    runs on hardware (round 3); no XLA fallback needed.
    """
    br = _resolve_block_rows(values.shape[0], block_rows, radius=1, default=64)
    br = max(8, br - br % 8)
    padded, h = _pad_rows_edge(values, br)
    padded, wpad = _pad_to_lane_multiple(padded)
    ph, w = padded.shape
    # Block-diagonal transposed LUT: block[b, a] = lut[a*16 + b] at rows
    # 16j+b, cols 16j+a for each of the 8 groups j (lut may be traced —
    # stay in jnp).
    l2 = lut.reshape(16, 16).astype(jnp.float32).T
    lut_t = jnp.kron(jnp.eye(8, dtype=jnp.float32), l2)
    out = pl.pallas_call(
        _lut_kernel,
        grid=(ph // br,),
        in_specs=[
            pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ph, w), jnp.uint8),
        interpret=_interpret(),
    )(padded, jnp.asarray(lut_t))
    return out[:h, : w - wpad]


# ---------------------------------------------------------------------------
# Mega-kernel: gray + 5x5 Gaussian in ONE VMEM pass.
#
# Fuses the grayscale into the Gaussian's tile loads (planar RGB in), so the
# intermediate gray image never round-trips HBM. The histogram stage stays
# in XLA: its in-kernel MXU form needs a [TR, W] -> [TR*W, 1] reshape that
# the current Mosaic compiler rejects ("infer-vector-layout: unsupported
# shape cast" — see histogram_pallas), and a VPU-only in-kernel histogram
# (256 masked reductions/tile) costs more than the 8 MB HBM read it saves.
# Bit-identical to grayscale -> ops.stencil.gaussian_blur (verified on
# hardware at 4K). Same-run A/B on the chip: full pipeline 8.92 ms (mega)
# vs 8.77 ms (XLA), stage 7.76 vs 7.66 ms — XLA already fuses the
# elementwise gray into its Gaussian, so the pipeline ships the XLA form
# and this kernel stands as the measured-at-parity Pallas alternative.
# ---------------------------------------------------------------------------


def _gray_gauss_kernel(r_prev, g_prev, b_prev, r_cur, g_cur, b_cur,
                       r_next, g_next, b_next, out_ref):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    tr, w = r_cur.shape

    def gray_rows(refs, lo, hi):
        r, g, b = refs
        return (
            r[lo:hi, :].astype(jnp.int32)
            + g[lo:hi, :].astype(jnp.int32)
            + b[lo:hi, :].astype(jnp.int32)
        ) // 3

    cur = gray_rows((r_cur, g_cur, b_cur), 0, tr)              # [TR, W]
    prev_tail = gray_rows((r_prev, g_prev, b_prev), tr - 2, tr)
    next_head = gray_rows((r_next, g_next, b_next), 0, 2)
    edge_top = jnp.concatenate([cur[:1]] * 2, axis=0)
    edge_bot = jnp.concatenate([cur[tr - 1 :]] * 2, axis=0)
    top = jnp.where(step == 0, edge_top, prev_tail)
    bot = jnp.where(step == n_steps - 1, edge_bot, next_head)
    padded = jnp.concatenate([top, cur, bot], axis=0)          # [TR+4, W]

    rows = None
    for dy, k in enumerate(_GAUSS_TAPS):
        term = k * padded[dy : dy + tr, :]
        rows = term if rows is None else rows + term
    rows = _col_edge_pad(rows, 2)
    acc = None
    for dx, k in enumerate(_GAUSS_TAPS):
        term = k * rows[:, dx : dx + w]
        acc = term if acc is None else acc + term
    out_ref[:] = ((acc + 128) >> 8).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def gray_gauss_pallas(img: jnp.ndarray, block_rows: int | None = None):
    """uint8[H, W, 3] -> uint8[H, W]: grayscale fused into the 5x5 Gaussian.

    Bit-identical to ``gaussian_blur(grayscale(img))``; the gray image never
    touches HBM.
    """
    h0, w = img.shape[0], img.shape[1]
    br = _resolve_block_rows(h0, block_rows, radius=2, default=64)
    planes = []
    for c in range(3):
        p, _ = _pad_rows_edge(img[:, :, c], br)
        planes.append(p)
    ph = planes[0].shape[0]
    n = ph // br
    halo = _halo_specs(br, w, n)
    in_specs = [halo[0]] * 3 + [halo[1]] * 3 + [halo[2]] * 3
    blurred = pl.pallas_call(
        _gray_gauss_kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ph, w), jnp.uint8),
        interpret=_interpret(),
    )(*(planes * 3))
    return blurred[:h0]


def _gray_gauss_hist_kernel(h_real, w_real, hist_from_reg,
                            r_prev, g_prev, b_prev,
                            r_cur, g_cur, b_cur, r_next, g_next, b_next,
                            out_ref, hist_ref):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    tr, w = r_cur.shape

    def gray_rows(refs, lo, hi):
        r, g, b = refs
        return (
            r[lo:hi, :].astype(jnp.int32)
            + g[lo:hi, :].astype(jnp.int32)
            + b[lo:hi, :].astype(jnp.int32)
        ) // 3

    cur = gray_rows((r_cur, g_cur, b_cur), 0, tr)
    prev_tail = gray_rows((r_prev, g_prev, b_prev), tr - 2, tr)
    next_head = gray_rows((r_next, g_next, b_next), 0, 2)
    edge_top = jnp.concatenate([cur[:1]] * 2, axis=0)
    edge_bot = jnp.concatenate([cur[tr - 1 :]] * 2, axis=0)
    top = jnp.where(step == 0, edge_top, prev_tail)
    bot = jnp.where(step == n_steps - 1, edge_bot, next_head)
    padded = jnp.concatenate([top, cur, bot], axis=0)

    rows = None
    for dy, k in enumerate(_GAUSS_TAPS):
        term = k * padded[dy : dy + tr, :]
        rows = term if rows is None else rows + term
    rows = _col_edge_pad(rows, 2)
    acc = None
    for dx, k in enumerate(_GAUSS_TAPS):
        term = k * rows[:, dx : dx + w]
        acc = term if acc is None else acc + term
    blurred = (acc + 128) >> 8                               # [TR, W] int32
    out_ref[:] = blurred.astype(jnp.uint8)

    # In-kernel histogram of the blurred tile (slab-expanded lane-major
    # nibble dots — see the histogram design comment); edge-replicated pad
    # rows beyond the real image are masked out (expanded value -1 matches
    # no nibble). `hist_from_reg` sources the counts from the in-register
    # tile (static slab unroll) instead of reading the just-written output
    # block back from VMEM.
    mask = lambda rows: (step * tr + rows) < h_real
    if hist_from_reg:
        counts = _hist_slab_counts_reg(blurred, tr, w, valid_rows=mask,
                                       w_real=w_real)
    else:
        counts = _hist_slab_counts(out_ref, tr, w, valid_rows=mask,
                                   w_real=w_real)
    # Per-step counts are f32-exact (<= tr*w < 2^24 per bin); the
    # cross-step accumulator is int32, so the histogram is exact at ANY
    # H*W (round 5: this lifted the mega kernel's 2^24-pixel cap).
    counts = counts.astype(jnp.int32)

    @pl.when(step == 0)
    def _():
        hist_ref[:] = counts

    @pl.when(step != 0)
    def _():
        hist_ref[:] = hist_ref[:] + counts


@functools.partial(jax.jit, static_argnames=("block_rows", "hist_from_reg"))
def _gray_gauss_hist_call(img: jnp.ndarray, block_rows: int,
                          hist_from_reg: bool = False):
    h0, w0 = img.shape[0], img.shape[1]
    br = block_rows
    # Column EDGE pad up to a lane multiple (round 4): replicated edge
    # columns reproduce `_col_edge_pad`'s semantics for the real pixels
    # within the blur radius, so the blur stays bit-exact at the right
    # edge; the padding lanes' (data-dependent) blurred values are masked
    # out of the histogram in-kernel via ``w_real``.
    wpad = (-w0) % 128
    planes = []
    for c in range(3):
        p = img[:, :, c]
        if wpad:
            p = jnp.pad(p, ((0, 0), (0, wpad)), mode="edge")
        p, _ = _pad_rows_edge(p, br)
        planes.append(p)
    ph, w = planes[0].shape
    n = ph // br
    halo = _halo_specs(br, w, n)
    in_specs = [halo[0]] * 3 + [halo[1]] * 3 + [halo[2]] * 3
    blurred, big = pl.pallas_call(
        functools.partial(_gray_gauss_hist_kernel, h0, w0, hist_from_reg),
        grid=(n,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ph, w), jnp.uint8),
            jax.ShapeDtypeStruct((128, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(*(planes * 3))
    return blurred[:h0, :w0], _fold_diag_blocks(big)


def gray_gauss_hist_pallas(img: jnp.ndarray, block_rows: int | None = None,
                           hist_from_reg: bool = False):
    """(blurred-gray, histogram) in ONE Pallas VMEM pass — the flagship
    mega-kernel, fully in-kernel on hardware since round 3 (grayscale fused
    into the Gaussian's tile loads, histogram accumulated across grid steps
    with the lane-major nibble dots; neither the gray image nor the blurred
    intermediate round-trips HBM for the histogram).

    Any width since round 4: W % 128 != 0 shapes are column-EDGE-padded to
    a lane multiple (blur-exact at the right edge) and the padding lanes
    masked out of the in-kernel histogram (`w_real` -> expanded value -1,
    the same mechanism as the row mask). Any H*W since round 5: per-step
    bin counts are f32-exact (<= tile pixels < 2^24) and the cross-step
    accumulator is int32, so 8K frames run the one-pass flagship too.
    Requires H >= 8; smaller images take the two-step path
    (`gray_gauss_pallas` + the XLA nibble-MXU histogram, same results).

    ``hist_from_reg`` histograms the in-register blurred tile (static slab
    unroll) instead of reading the output block back from VMEM —
    bit-identical, and measured statistically TIED with the readback form
    on hardware (MEGA_TUNE_r03.json phase 3: the kernel is VPU+MXU
    phase-bound, not readback-bound), so the default stays False.
    """
    h0, w = int(img.shape[0]), int(img.shape[1])
    # default=32 from the round-3 hardware rank sweep (MEGA_TUNE_r03.json):
    # br=32 beat br=16 in 14/14 interleaved rounds at 4K (median 0.90x).
    br = _resolve_block_rows(h0, block_rows, radius=2, default=32)
    br = max(8, br - br % 8)  # slab processing needs 8-row multiples
    w_lanes = w + ((-w) % 128)
    if h0 < 8 or br * w_lanes >= 2**24:
        # H < 8 can't form one slab; a (theoretical) >= 2^24-px TILE would
        # break the per-step f32 bin exactness (needs W >= ~520k at br=32).
        # Both join the two-step fallback so the variant stays a drop-in.
        from imageprocessingtools_tpu.ops.histogram import histogram as _xla_hist

        blurred = gray_gauss_pallas(img, block_rows=block_rows)
        return blurred, _xla_hist(blurred)
    return _gray_gauss_hist_call(img, br, hist_from_reg)
