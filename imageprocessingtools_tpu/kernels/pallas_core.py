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
- The histogram/LUT kernels use the same nibble-one-hot MXU contraction as
  `ops/histogram.py`. CAVEAT (found in round 2): their [TR, W] -> [TR*W, 1]
  reshape is rejected by the current Mosaic compiler on real TPUs
  ("infer-vector-layout: unsupported shape cast"), so on hardware they
  transparently fall back to the XLA ops (identical trick and results,
  measured at parity); the in-kernel forms remain the reference and run
  under interpret mode in CI. The stencil/elementwise/gray+gauss kernels
  compile and run on hardware.
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


def _hist_kernel(v_ref, out_ref):
    step = pl.program_id(0)
    tr, w = v_ref.shape
    v = v_ref[:].astype(jnp.int32).reshape(tr * w, 1)
    iota = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    hi = ((v >> 4) == iota).astype(jnp.bfloat16)   # [M, 128], cols 16+ zero
    lo = ((v & 15) == iota).astype(jnp.bfloat16)
    counts = lax.dot_general(
        hi, lo, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [128, 128]; useful block [:16, :16]

    @pl.when(step == 0)
    def _():
        out_ref[:] = counts

    @pl.when(step != 0)
    def _():
        out_ref[:] = out_ref[:] + counts


@functools.partial(jax.jit, static_argnames=("block_rows",))
def histogram_pallas(gray: jnp.ndarray, block_rows: int | None = None):
    """uint8[H, W] -> int32[256] (exact; requires H*W < 2^24).

    The f32 accumulator loses integer exactness once one bin exceeds 2^24
    (e.g. a constant 4096x4096 image), so such inputs are rejected rather
    than silently wrong; ops.histogram chunks and stays exact at any size.

    NOTE (measured on hardware, round 2): the [TR, W] -> [TR*W, 1] reshape
    this formulation needs is rejected by the current Mosaic compiler
    ("infer-vector-layout: unsupported shape cast"), so on a real TPU this
    function falls back to the XLA nibble-MXU op (same trick, same exact
    result, and measured at parity). The kernel remains the reference
    in-VMEM formulation and runs under interpret mode in CI.
    """
    if not _interpret():
        from imageprocessingtools_tpu.ops.histogram import histogram as _xla_hist

        # The XLA op chunks internally for huge images, so the hardware
        # fallback is a drop-in at ANY size (it used to raise for
        # H*W >= 2^24, which broke the drop-in contract for e.g. 4096^2).
        return _xla_hist(gray)
    if gray.shape[0] * gray.shape[1] >= 2**24:
        raise ValueError(
            f"histogram_pallas requires H*W < 2^24 for exact f32 bin counts; "
            f"got {gray.shape[0]}x{gray.shape[1]}; use ops.histogram instead"
        )
    br = _resolve_block_rows(gray.shape[0], block_rows, radius=1, default=64)
    h = gray.shape[0]
    padded_h = -(-h // br) * br
    pad = padded_h - h
    if pad:
        # Zero-pad; the extra rows land in bin 0 and are subtracted below.
        gray = jnp.pad(gray, ((0, pad), (0, 0)))
    w = gray.shape[1]
    big = pl.pallas_call(
        _hist_kernel,
        grid=(padded_h // br,),
        in_specs=[pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        interpret=_interpret(),
    )(gray)
    hist = big[:16, :16].reshape(256).astype(jnp.int32)
    return hist.at[0].add(-pad * w) if pad else hist


def _lut_kernel(v_ref, lut_ref, out_ref):
    tr, w = v_ref.shape
    v = v_ref[:].astype(jnp.int32).reshape(tr * w, 1)
    iota = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    hi = ((v >> 4) == iota).astype(jnp.bfloat16)
    lo = (v & 15) == iota
    partial = jnp.dot(
        hi, lut_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )  # [M, 128]
    out = jnp.sum(jnp.where(lo, partial, 0.0), axis=1)
    out_ref[:] = out.reshape(tr, w).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def lut_apply_pallas(values: jnp.ndarray, lut: jnp.ndarray, block_rows: int | None = None):
    """uint8[H, W] through an integer [256] LUT; exact, gather-free.

    Same Mosaic reshape limitation as histogram_pallas: on a real TPU this
    falls back to the XLA nibble-MXU ops.apply_lut (identical trick/result).
    """
    if not _interpret():
        from imageprocessingtools_tpu.ops.histogram import apply_lut as _xla_lut

        return _xla_lut(values, lut)
    br = _resolve_block_rows(values.shape[0], block_rows, radius=1, default=64)
    padded, h = _pad_rows_edge(values, br)
    ph, w = padded.shape
    lut128 = jnp.zeros((128, 128), jnp.float32).at[:16, :16].set(
        lut.reshape(16, 16).astype(jnp.float32)
    )
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
    )(padded, lut128)
    return out[:h]


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


def gray_gauss_hist_pallas(img: jnp.ndarray, block_rows: int | None = None):
    """(blurred-gray, histogram) — gray+gauss in one Pallas pass, histogram
    via the XLA nibble-MXU op (in-kernel form is Mosaic-rejected, see module
    comment). H*W < 2^24 required for the downstream equalize exactness."""
    if img.shape[0] * img.shape[1] >= 2**24:
        raise ValueError("gray_gauss_hist_pallas requires H*W < 2^24")
    from imageprocessingtools_tpu.ops.histogram import histogram as _xla_hist

    blurred = gray_gauss_pallas(img, block_rows=block_rows)
    return blurred, _xla_hist(blurred)
