"""jit/vmap transform parity (survey §4: chex.variants-style coverage).

Every op must produce identical results eagerly, under jit, and under vmap.
"""

import chex
import jax
import numpy as np
import pytest

import imageprocessingtools_tpu as ipt
from tests.conftest import make_image


OPS = [
    ("grayscale", lambda im: ipt.grayscale(im)),
    ("mono", lambda im: ipt.mono_dither(im)),
    ("flip_v", lambda im: ipt.flip_vertical(im)),
    ("flip_h", lambda im: ipt.flip_horizontal(im)),
    ("rot90", lambda im: ipt.rotate(im, 90)),
    ("rot180", lambda im: ipt.rotate(im, 180)),
    ("rot270", lambda im: ipt.rotate(im, 270)),
    ("rot30", lambda im: ipt.rotate(im, 30)),
    ("resize", lambda im: ipt.resize_width(im, 10)),
    ("invert", lambda im: ipt.invert(im)),
    ("contrast", lambda im: ipt.contrast(im, 1.5)),
    ("box", lambda im: ipt.box_blur(im)),
    ("gauss", lambda im: ipt.gaussian_blur(im)),
]


@pytest.mark.parametrize("name,op", OPS, ids=[n for n, _ in OPS])
def test_eager_jit_vmap_agree(name, op):
    imgs = np.stack([make_image(12, 16, seed=s) for s in range(3)])
    eager = np.stack([np.asarray(op(imgs[i])) for i in range(3)])
    jitted = np.stack([np.asarray(jax.jit(op)(imgs[i])) for i in range(3)])
    vmapped = np.asarray(jax.jit(jax.vmap(op))(imgs))
    np.testing.assert_array_equal(eager, jitted)
    np.testing.assert_array_equal(eager, vmapped)


def test_gray_sobel_equalize_composed_under_vmap():
    imgs = np.stack([make_image(16, 24, seed=s) for s in range(4)])

    def chain(im):
        return ipt.equalize_histogram(ipt.sobel(ipt.grayscale(im)))

    single = np.stack([np.asarray(chain(imgs[i])) for i in range(4)])
    batched = np.asarray(jax.jit(jax.vmap(chain))(imgs))
    np.testing.assert_array_equal(single, batched)


def test_chex_assert_shapes():
    img = make_image(8, 8)
    out = ipt.grayscale(img)
    chex.assert_shape(out, (8, 8))
    chex.assert_type(out, np.uint8)


def test_isqrt_round_exact_exhaustive():
    """round_half_up(sqrt(m)) for every m in [0, 2^16): the f32-estimate
    +-1 fix-up must be exact, including m = 0 (a flat Sobel region), which
    the unguarded down-correction used to send to -1."""
    import numpy as np

    from imageprocessingtools_tpu.ops.stencil import _isqrt_round

    import jax.numpy as jnp

    m = np.arange(2**16, dtype=np.int32)
    got = np.asarray(_isqrt_round(jnp.asarray(m)))
    want = np.floor(np.sqrt(m.astype(np.float64)) + 0.5).astype(np.int32)
    assert got[0] == 0
    np.testing.assert_array_equal(got, want)
