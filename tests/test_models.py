"""Preset pipelines: correctness vs golden chains + vmap/batch usability."""

import jax
import numpy as np
import pytest

from imageprocessingtools_tpu import models
from imageprocessingtools_tpu.golden import model as golden
from imageprocessingtools_tpu.pipeline import PipelineConfig
from tests.conftest import make_gradient, make_image


def test_edge_detect_matches_golden():
    img = make_image(16, 24, seed=1)
    expected = golden.sobel(golden.gaussian_blur(golden.grayscale(img)))
    np.testing.assert_array_equal(np.asarray(models.edge_detect(img)), expected)


def test_enhance_within_budget():
    img = make_gradient(24, 32)
    expected = golden.sharpen(golden.equalize_histogram(golden.grayscale(img)))
    got = np.asarray(models.enhance(img))
    # equalize LUT carries the documented +-1; sharpen amplifies by <= 9x
    assert np.abs(got.astype(int) - expected.astype(int)).max() <= 9


def test_thumbnail_shape():
    img = make_image(64, 128, seed=2)
    out = np.asarray(models.thumbnail(img, width=32))
    assert out.shape == (16, 32, 3)


def test_print_ready_is_bilevel():
    img = make_image(12, 16, seed=3)
    out = np.asarray(models.print_ready(img))
    assert set(np.unique(out)).issubset({0, 1})


def test_reference_pipeline_preset():
    img = make_image(16, 12, seed=4)
    fn = models.reference_pipeline(PipelineConfig(new_width=8, gray=True))
    expected = golden.grayscale(golden.resize_width(img, 8))
    got = np.asarray(jax.jit(fn)(img))
    assert np.abs(got.astype(int) - expected.astype(int)).max() <= 1


def test_presets_vmappable():
    imgs = np.stack([make_image(8, 16, seed=s) for s in range(4)])
    out = np.asarray(jax.jit(jax.vmap(models.edge_detect))(imgs))
    assert out.shape == (4, 8, 16)


def test_get_preset_unknown():
    with pytest.raises(ValueError, match="unknown preset"):
        models.get_preset("nope")
