"""float64 exactness-mode aliases return golden (bit-exact) results."""

import numpy as np

import imageprocessingtools_tpu as ipt
from imageprocessingtools_tpu.golden import model as golden
from tests.conftest import make_image


def test_resize_width_exact_is_golden():
    img = make_image(12, 16, seed=1)
    np.testing.assert_array_equal(
        ipt.resize_width_exact(img, 10), golden.resize_width(img, 10)
    )


def test_rotate_exact_is_golden():
    img = make_image(16, 16, seed=2)
    np.testing.assert_array_equal(
        ipt.rotate_exact(img, 33), golden.rotate(img, 33)
    )


def test_exact_mode_accepts_device_arrays():
    import jax.numpy as jnp

    img = jnp.asarray(make_image(8, 12, seed=3))
    out = ipt.resize_width_exact(img, 6)
    assert isinstance(out, np.ndarray) and out.shape == (4, 6, 3)
