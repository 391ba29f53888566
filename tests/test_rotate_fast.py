"""rotate_fast (3-shear): spec conformance + geometric agreement with the
exact rotation. The op is DEPRECATED (ops.rotate dominates it); these tests
pin its behavior for compat and assert the deprecation surface."""

import warnings

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")

from imageprocessingtools_tpu.golden import model as golden
from imageprocessingtools_tpu.ops.shear_rotate import rotate_fast
from tests.conftest import make_gradient, make_image


@pytest.mark.parametrize("angle", [0, 90, 180, 270])
def test_orthogonal_exact(angle):
    img = make_image(13, 17, seed=1)
    np.testing.assert_array_equal(
        np.asarray(rotate_fast(img, angle)), golden.rotate(img, angle)
    )


@pytest.mark.parametrize("angle", [7, 30, 44, 46, 100, 211, 300, 359])
@pytest.mark.parametrize("shape", [(24, 32), (31, 19)])
def test_matches_float64_spec(shape, angle):
    """Device f32 output vs the f64 golden spec of the same algorithm."""
    img = make_gradient(*shape)
    got = np.asarray(rotate_fast(img, angle))
    exp = golden.rotate_fast(img, angle)
    assert got.shape == exp.shape
    assert np.abs(got.astype(int) - exp.astype(int)).max() <= 1


@pytest.mark.parametrize("angle", [15, 30, 60, 120, 345])
def test_same_bbox_as_exact(angle):
    img = make_image(40, 56, seed=2)
    assert rotate_fast(img, angle).shape == golden.rotate(img, angle).shape


@pytest.mark.parametrize("angle", [10, 30, 45])
def test_geometric_agreement_with_exact(angle):
    """On a smooth gradient the separable resampling agrees closely with the
    exact 2-D bicubic in the interior (same affine map); the content
    boundary differs by design (nearest band vs cubic black bleed)."""
    from imageprocessingtools_tpu.ops import _exact

    img = make_gradient(64, 80)
    fast = np.asarray(rotate_fast(img, angle)).astype(np.int32)
    exact = golden.rotate(img, angle).astype(np.int32)

    plan = _exact.plan_rotation(64, 80, float(angle))
    mask = plan.interior
    for _ in range(4):  # erode away the zone boundary
        m = mask.copy()
        m[1:] &= mask[:-1]
        m[:-1] &= mask[1:]
        m[:, 1:] &= mask[:, :-1]
        m[:, :-1] &= mask[:, 1:]
        mask = m
    assert mask.sum() > 1000
    diff = np.abs(fast - exact)[mask]
    assert float(diff.mean()) < 1.0, diff.mean()
    assert diff.max() <= 4, diff.max()


def test_gray_input():
    g = golden.grayscale(make_image(20, 24, seed=3))
    out = np.asarray(rotate_fast(g, 33))
    assert out.ndim == 2 and out.shape == golden.rotate(g, 33).shape


def test_rotate_fast_deprecation_surface():
    """Calling it warns; it is gone from the public ops/API exports."""
    import imageprocessingtools_tpu as ipt
    from imageprocessingtools_tpu import ops

    assert not hasattr(ops, "rotate_fast")
    assert not hasattr(ipt, "rotate_fast")
    img = make_image(8, 8, seed=0)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        with pytest.raises(DeprecationWarning):
            rotate_fast(img, 30)
