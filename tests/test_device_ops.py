"""Device (JAX) ops vs the golden model.

Integer ops are bit-exact; float-accumulation ops (resize, arbitrary-rotate
interior, equalize LUT) carry the documented +-1 LSB budget.
"""

import numpy as np
import pytest

import imageprocessingtools_tpu as ipt
from imageprocessingtools_tpu.golden import model as golden
from tests.conftest import SHAPES, SHAPES_ROT, make_gradient, make_image


def _assert_close_u8(actual, expected, tol=0):
    actual = np.asarray(actual)
    assert actual.shape == expected.shape
    assert actual.dtype == np.uint8
    if tol == 0:
        np.testing.assert_array_equal(actual, expected)
    else:
        diff = np.abs(actual.astype(np.int32) - expected.astype(np.int32))
        assert diff.max() <= tol, f"max diff {diff.max()} > {tol}"


@pytest.mark.parametrize("shape", SHAPES)
def test_grayscale_exact(shape):
    img = make_image(*shape)
    _assert_close_u8(ipt.grayscale(img), golden.grayscale(img))


@pytest.mark.parametrize("shape", SHAPES)
def test_mono_exact(shape):
    img = make_image(*shape, seed=1)
    _assert_close_u8(ipt.mono_dither(img), golden.mono_dither(img))


@pytest.mark.parametrize("shape", SHAPES)
def test_flips_exact(shape):
    img = make_image(*shape, seed=2)
    _assert_close_u8(ipt.flip_vertical(img), golden.flip_vertical(img))
    _assert_close_u8(ipt.flip_horizontal(img), golden.flip_horizontal(img))


@pytest.mark.parametrize("shape", [(12, 16), (13, 17), (29, 7)])
def test_rot_orthogonal_exact(shape):
    img = make_image(*shape, seed=3)
    for angle, fn in [(90, golden.rotate90), (180, golden.rotate180), (270, golden.rotate270)]:
        _assert_close_u8(ipt.rotate(img, angle), fn(img))


# 60/120/240/300 regression the half-ulp64 boundary shift in _floor_df32:
# their cos/sin are 0.5 +- 1 f64 ulp, landing coordinates ~1e-15 from x.5
# boundaries where naive double-f32 flips round() by a full pixel.
@pytest.mark.parametrize("angle", [30, 45, 60, 120, 135, 222, 240, 300, 359])
@pytest.mark.parametrize("shape", SHAPES_ROT)
def test_rotate_arbitrary_within_budget(shape, angle):
    img = make_gradient(*shape)
    _assert_close_u8(ipt.rotate(img, angle), golden.rotate(img, angle), tol=1)


def test_rotate_zones_exact():
    """Outside (black) and edge (nearest) zones carry no float budget."""
    img = make_image(16, 16, seed=8)
    from imageprocessingtools_tpu.ops import _exact

    plan = _exact.plan_rotation(16, 16, 30.0)
    actual = np.asarray(ipt.rotate(img, 30))
    expected = golden.rotate(img, 30)
    outside = ~(plan.interior | plan.edge)
    np.testing.assert_array_equal(actual[outside], expected[outside])
    np.testing.assert_array_equal(actual[plan.edge], expected[plan.edge])


@pytest.mark.parametrize("shape,new_width", [
    ((12, 16), 10), ((12, 16), 24), ((13, 17), 8), ((13, 17), 40),
    ((48, 64), 64), ((29, 7), 21),
])
def test_resize_within_budget(shape, new_width):
    img = make_image(*shape, seed=4)
    expected = golden.resize_width(img, new_width)
    _assert_close_u8(ipt.resize_width(img, new_width), expected, tol=1)


def test_resize_hw_extension():
    img = make_image(20, 30, seed=9)
    out = np.asarray(ipt.resize(img, 10, 45))
    assert out.shape == (10, 45, 3)


def test_resize_hw_extension_host_fallback(monkeypatch):
    """Extreme-aspect route: the f64 host tap path (triggered by shrinking
    the dense limit) agrees with the dense MXU path within the +-1 budget
    and exactly equals the direct f64 contributions composition."""
    import importlib

    # the ops package re-exports the resize FUNCTION under the same name,
    # so attribute-style imports find the function, not the module
    rz = importlib.import_module("imageprocessingtools_tpu.ops.resize")
    from imageprocessingtools_tpu.golden.model import _apply_contributions

    img = make_image(20, 30, seed=11)
    dense = np.asarray(ipt.resize(img, 10, 45))
    monkeypatch.setattr(rz, "_DENSE_LIMIT", 1)
    host = np.asarray(ipt.resize(img, 10, 45))
    assert np.max(np.abs(host.astype(int) - dense.astype(int))) <= 1
    expected = img
    for dim, contrib in rz._hw_passes(20, 30, 10, 45):
        expected = _apply_contributions(expected, contrib, dim)
    np.testing.assert_array_equal(host, expected)


def test_resize_hw_extension_caps():
    img = make_image(8, 8, seed=1)
    with pytest.raises(ValueError, match="exceeds the supported bound"):
        ipt.resize(img, 2**27, 4)
    with pytest.raises(ValueError, match="exceeds the supported bound"):
        ipt.resize(img, 2**16, 2**16)
    with pytest.raises(ValueError, match="invalid option"):
        ipt.resize(img, 0, 4)


@pytest.mark.parametrize("shape", [(13, 17), (48, 64)])
def test_extension_pointwise_exact(shape):
    img = make_image(*shape, seed=5)
    _assert_close_u8(ipt.invert(img), golden.invert(img))
    _assert_close_u8(ipt.brightness(img, 37), golden.brightness(img, 37))
    _assert_close_u8(ipt.brightness(img, -80), golden.brightness(img, -80))
    for factor in (0.5, 1.0, 1.7, 2.5):
        _assert_close_u8(ipt.contrast(img, factor), golden.contrast(img, factor))
    gray = golden.grayscale(img)
    _assert_close_u8(ipt.threshold(gray, 100), golden.threshold(gray, 100))


@pytest.mark.parametrize("shape", [(13, 17), (48, 64)])
def test_extension_stencils_exact(shape):
    img = make_image(*shape, seed=6)
    gray = golden.grayscale(img)
    _assert_close_u8(ipt.box_blur(img), golden.box_blur(img))
    _assert_close_u8(ipt.box_blur(gray), golden.box_blur(gray))
    _assert_close_u8(ipt.sharpen(img), golden.sharpen(img))
    _assert_close_u8(ipt.gaussian_blur(img), golden.gaussian_blur(img))
    _assert_close_u8(ipt.gaussian_blur(gray), golden.gaussian_blur(gray))
    _assert_close_u8(ipt.sobel(gray), golden.sobel(gray))


def test_histogram_exact():
    img = make_image(31, 47, seed=7)
    gray = golden.grayscale(img)
    np.testing.assert_array_equal(
        np.asarray(ipt.histogram(gray)), golden.histogram(gray)
    )


def test_equalize_within_budget():
    gray = golden.grayscale(make_gradient(48, 64))
    _assert_close_u8(
        ipt.equalize_histogram(gray), golden.equalize_histogram(gray), tol=1
    )


def test_equalize_constant_image_passthrough():
    gray = np.full((8, 8), 77, dtype=np.uint8)
    _assert_close_u8(ipt.equalize_histogram(gray), gray)


def test_pipeline_fixed_order():
    """run_pipeline applies resize -> rotate -> gray -> flips (B1 fixed)."""
    img = make_gradient(16, 12)
    cfg = ipt.PipelineConfig(new_width=10, angle=90.0, gray=True, flip_v=True)
    out, ftype = ipt.run_pipeline(img, cfg)
    expected = golden.flip_vertical(
        golden.grayscale(golden.rotate90(golden.resize_width(img, 10)))
    )
    assert ftype == 1  # PGM
    _assert_close_u8(np.asarray(out), expected, tol=1)


def test_pipeline_noop_b2():
    with pytest.raises(ValueError, match="no data to write"):
        ipt.run_pipeline(make_image(4, 4), ipt.PipelineConfig())


def test_pipeline_conflicts():
    with pytest.raises(ValueError, match="Conflicting"):
        ipt.PipelineConfig(gray=True, mono=True)
    with pytest.raises(ValueError, match="Conflicting"):
        ipt.PipelineConfig(flip_v=True, flip_h=True)


@pytest.mark.parametrize("shape,new_width", [
    ((64, 96), 48), ((64, 96), 200), ((29, 7), 21), ((200, 130), 65),
])
def test_resize_banded_within_budget(shape, new_width):
    """Banded-matmul apply (big-image path) stays within the +-1 budget and
    agrees with the golden model, incl. upscale and mirror edges."""
    from imageprocessingtools_tpu.ops.resize import resize_width

    img = make_image(*shape, seed=6)
    expected = golden.resize_width(img, new_width)
    _assert_close_u8(resize_width(img, new_width, banded=True), expected, tol=1)


def test_resize_banded_gray_2d():
    from imageprocessingtools_tpu.ops.resize import resize_width

    img = make_image(48, 64, seed=2)[:, :, 0]
    expected = golden.resize_width(img, 40)
    _assert_close_u8(resize_width(img, 40, banded=True), expected, tol=1)
