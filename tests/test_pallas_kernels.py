"""Pallas kernels (interpret mode on CPU) vs golden / XLA ops: bit-exact."""

import numpy as np
import pytest

import imageprocessingtools_tpu as ipt
from imageprocessingtools_tpu.golden import model as golden
from imageprocessingtools_tpu.kernels import pallas_core as pk
from tests.conftest import make_gradient, make_image


@pytest.mark.parametrize("shape", [(16, 128), (32, 256), (24, 384)])
def test_gaussian_pallas_exact(shape):
    gray = golden.grayscale(make_image(*shape, seed=1))
    out = np.asarray(pk.gaussian_blur_pallas(gray, block_rows=8))
    np.testing.assert_array_equal(out, golden.gaussian_blur(gray))


def test_gaussian_pallas_single_block():
    gray = golden.grayscale(make_image(16, 128, seed=2))
    out = np.asarray(pk.gaussian_blur_pallas(gray, block_rows=16))
    np.testing.assert_array_equal(out, golden.gaussian_blur(gray))


@pytest.mark.parametrize(
    "pallas_fn,golden_fn",
    [
        (pk.box_blur_pallas, golden.box_blur),
        (pk.sharpen_pallas, golden.sharpen),
        (pk.sobel_pallas, golden.sobel),
    ],
)
def test_stencil3_pallas_exact(pallas_fn, golden_fn):
    gray = golden.grayscale(make_image(24, 256, seed=3))
    out = np.asarray(pallas_fn(gray, block_rows=8))
    np.testing.assert_array_equal(out, golden_fn(gray))


def test_fused_elementwise_chain():
    img = make_image(16, 128, seed=4)
    planes = (img[:, :, 0], img[:, :, 1], img[:, :, 2])
    out = np.asarray(
        pk.fused_elementwise_pallas(
            planes,
            chain=(("invert", 0), ("brightness", 30), ("threshold", 128)),
            block_rows=8,
        )
    )
    expected = golden.threshold(
        golden.brightness(golden.invert(golden.grayscale(img)), 30), 128
    )
    np.testing.assert_array_equal(out, expected)


def test_fused_elementwise_contrast_budget():
    img = make_image(16, 128, seed=5)
    planes = (img[:, :, 0], img[:, :, 1], img[:, :, 2])
    out = np.asarray(
        pk.fused_elementwise_pallas(planes, chain=(("contrast", 1.5),), block_rows=8)
    )
    expected = golden.contrast(golden.grayscale(img), 1.5)
    assert np.abs(out.astype(int) - expected.astype(int)).max() <= 1


def test_histogram_pallas_exact():
    gray = golden.grayscale(make_image(32, 128, seed=6))
    out = np.asarray(pk.histogram_pallas(gray, block_rows=8))
    np.testing.assert_array_equal(out, golden.histogram(gray))


def test_lut_apply_pallas_exact():
    gray = golden.grayscale(make_gradient(16, 128))
    rng = np.random.default_rng(7)
    lut = rng.integers(0, 256, 256, dtype=np.uint8)
    out = np.asarray(pk.lut_apply_pallas(gray, lut, block_rows=8))
    np.testing.assert_array_equal(out, lut[gray])


def test_fused_pipeline_pallas_matches_xla():
    from imageprocessingtools_tpu.kernels.fused import (
        fused_pipeline_pallas,
        fused_pipeline_xla,
    )

    img = make_gradient(32, 128)
    out = np.asarray(fused_pipeline_pallas(img))
    np.testing.assert_array_equal(out, np.asarray(fused_pipeline_xla(img)))


@pytest.mark.parametrize("shape", [(64, 128, 3), (130, 384, 3), (7, 128, 3)])
def test_mega_kernel_bit_identical(shape):
    """gray+gauss+hist mega-kernel pipeline == XLA flagship, bit for bit."""
    from imageprocessingtools_tpu.kernels.fused import (
        fused_pipeline_pallas_mega, fused_pipeline_xla)

    rng = np.random.default_rng(shape[0])
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fused_pipeline_pallas_mega(img)),
        np.asarray(fused_pipeline_xla(img)),
    )


@pytest.mark.parametrize("shape", [(64, 128, 3), (40, 256, 3)])
def test_mega_kernel_reghist_variant(shape):
    """hist_from_reg=True (register-tile histogram, static slab unroll)
    must be bit-identical to the ref-readback form and the XLA ops."""
    from imageprocessingtools_tpu.kernels.pallas_core import gray_gauss_hist_pallas
    from imageprocessingtools_tpu.ops.color import grayscale
    from imageprocessingtools_tpu.ops.histogram import histogram
    from imageprocessingtools_tpu.ops.stencil import gaussian_blur

    rng = np.random.default_rng(shape[0])
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    blurred, hist = gray_gauss_hist_pallas(img, hist_from_reg=True)
    expected = gaussian_blur(grayscale(img))
    np.testing.assert_array_equal(np.asarray(blurred), np.asarray(expected))
    np.testing.assert_array_equal(np.asarray(hist), np.asarray(histogram(expected)))


def test_mega_kernel_hist_matches_ops():
    from imageprocessingtools_tpu.kernels.pallas_core import gray_gauss_hist_pallas
    from imageprocessingtools_tpu.ops.color import grayscale
    from imageprocessingtools_tpu.ops.histogram import histogram
    from imageprocessingtools_tpu.ops.stencil import gaussian_blur

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(50, 256, 3), dtype=np.uint8)
    blurred, hist = gray_gauss_hist_pallas(img)
    expected = gaussian_blur(grayscale(img))
    np.testing.assert_array_equal(np.asarray(blurred), np.asarray(expected))
    np.testing.assert_array_equal(np.asarray(hist), np.asarray(histogram(expected)))
    assert int(np.asarray(hist).sum()) == 50 * 256


def test_mega_kernel_size_guard_delegates():
    """>= 2^24 px takes the two-step fallback (gray+gauss kernel + chunked
    XLA histogram) instead of raising — the mega variant is a drop-in for
    the other fused forms at any size (in-kernel f32 bins would lose
    integer exactness there; the XLA histogram chunks for it)."""
    from imageprocessingtools_tpu.kernels.pallas_core import gray_gauss_hist_pallas

    img = np.zeros((4096, 4096, 3), np.uint8)  # exactly 2^24 px
    img[0, :7] = 255
    blurred, hist = gray_gauss_hist_pallas(img)
    h = np.asarray(hist)
    assert int(h.sum()) == 4096 * 4096
    assert blurred.shape == (4096, 4096)


def test_histogram_pallas_odd_shapes_exact():
    """Non-8-multiple rows AND non-128-multiple lanes: the zero-pad + bin-0
    correction and the slab row masking must stay exact."""
    for shape in ((37, 300), (8, 100), (9, 128), (64, 384)):
        gray = golden.grayscale(make_image(*shape, seed=shape[0]))
        out = np.asarray(pk.histogram_pallas(gray))
        np.testing.assert_array_equal(out, golden.histogram(gray), err_msg=str(shape))
        assert out.sum() == shape[0] * shape[1]


def test_lut_apply_pallas_odd_shapes_exact():
    rng = np.random.default_rng(11)
    lut = rng.integers(0, 256, 256, dtype=np.uint8)
    for shape in ((37, 300), (8, 100), (9, 128)):
        gray = golden.grayscale(make_image(*shape, seed=shape[1]))
        out = np.asarray(pk.lut_apply_pallas(gray, lut))
        np.testing.assert_array_equal(out, lut[gray], err_msg=str(shape))


def test_mega_kernel_row_masking_exact():
    """H not a slab multiple: the in-kernel validity mask must exclude the
    edge-replicated pad rows from the histogram."""
    from imageprocessingtools_tpu.kernels.pallas_core import gray_gauss_hist_pallas
    from imageprocessingtools_tpu.ops.color import grayscale
    from imageprocessingtools_tpu.ops.histogram import histogram
    from imageprocessingtools_tpu.ops.stencil import gaussian_blur

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(43, 128, 3), dtype=np.uint8)
    blurred, hist = gray_gauss_hist_pallas(img)
    expected = gaussian_blur(grayscale(img))
    np.testing.assert_array_equal(np.asarray(blurred), np.asarray(expected))
    np.testing.assert_array_equal(np.asarray(hist), np.asarray(histogram(expected)))


@pytest.mark.parametrize("shape", [
    (48, 120, 3),     # W < 128 (pad to one lane group)
    (64, 200, 3),     # W % 128 != 0, > 128
    (96, 683, 3),     # odd width, multiple lane groups (1366/2 class)
    (40, 500, 3),     # 4000x3000 class scaled down
])
def test_mega_kernel_nonmultiple_width(shape):
    """Round-4 gate lift: W % 128 != 0 now runs the ONE-PASS mega kernel
    (edge-padded lanes, in-kernel column mask) bit-identically to the XLA
    flagship — both blur (right-edge taps) and histogram (no padding
    pixels counted)."""
    from imageprocessingtools_tpu.kernels.fused import (
        fused_pipeline_pallas_mega, fused_pipeline_xla)
    from imageprocessingtools_tpu.kernels.pallas_core import gray_gauss_hist_pallas
    from imageprocessingtools_tpu.ops.color import grayscale
    from imageprocessingtools_tpu.ops.histogram import histogram
    from imageprocessingtools_tpu.ops.stencil import gaussian_blur

    rng = np.random.default_rng(shape[1])
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    blurred, hist = gray_gauss_hist_pallas(img)
    expected = gaussian_blur(grayscale(img))
    np.testing.assert_array_equal(np.asarray(blurred), np.asarray(expected))
    np.testing.assert_array_equal(
        np.asarray(hist), np.asarray(histogram(expected)))
    assert int(np.asarray(hist).sum()) == shape[0] * shape[1]
    np.testing.assert_array_equal(
        np.asarray(fused_pipeline_pallas_mega(img)),
        np.asarray(fused_pipeline_xla(img)),
    )


def test_mega_kernel_nonmultiple_width_reghist():
    from imageprocessingtools_tpu.kernels.pallas_core import gray_gauss_hist_pallas
    from imageprocessingtools_tpu.ops.color import grayscale
    from imageprocessingtools_tpu.ops.histogram import histogram
    from imageprocessingtools_tpu.ops.stencil import gaussian_blur

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(56, 300, 3), dtype=np.uint8)
    blurred, hist = gray_gauss_hist_pallas(img, hist_from_reg=True)
    expected = gaussian_blur(grayscale(img))
    np.testing.assert_array_equal(np.asarray(blurred), np.asarray(expected))
    np.testing.assert_array_equal(
        np.asarray(hist), np.asarray(histogram(expected)))
