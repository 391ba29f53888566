"""Named pipeline presets built from the op library."""

from __future__ import annotations

import functools

import jax.numpy as jnp

from imageprocessingtools_tpu import ops
from imageprocessingtools_tpu.pipeline import PipelineConfig, run_pipeline


def reference_pipeline(config: PipelineConfig):
    """The reference's fixed-order pipeline as a traceable callable."""

    def fn(img: jnp.ndarray) -> jnp.ndarray:
        out, _ = run_pipeline(img, config)
        return out

    return fn


def edge_detect(img: jnp.ndarray) -> jnp.ndarray:
    """gray -> 5x5 Gaussian (denoise) -> Sobel magnitude."""
    return ops.sobel(ops.gaussian_blur(ops.grayscale(img)))


def enhance(img: jnp.ndarray) -> jnp.ndarray:
    """gray -> histogram equalization -> sharpen (the BASELINE.json
    hist-eq + edge config, composed)."""
    return ops.sharpen(ops.equalize_histogram(ops.grayscale(img)))


def thumbnail(img: jnp.ndarray, width: int = 256) -> jnp.ndarray:
    """Antialiased bicubic downscale to a target width (MATLAB-compatible)."""
    return ops.resize_width(img, width)


def print_ready(img: jnp.ndarray) -> jnp.ndarray:
    """gray -> contrast stretch -> Bayer bilevel (P4-ready bits)."""
    eq = ops.equalize_histogram(ops.grayscale(img))
    rgb = jnp.broadcast_to(eq[..., None], eq.shape + (3,))
    return ops.mono_dither(rgb)


PRESETS = {
    "edge_detect": edge_detect,
    "enhance": enhance,
    "thumbnail": functools.partial(thumbnail, width=256),
    "print_ready": print_ready,
}

# Output encoding per preset (serving writes one file per input):
# 0 = P6 color, 1 = P5 gray, 2 = P4 bilevel (values {0,1}, device-packed).
PRESET_FILE_TYPES = {
    "edge_detect": 1,
    "enhance": 1,
    "thumbnail": 0,
    "print_ready": 2,
}


def get_preset(name: str):
    try:
        return PRESETS[name]
    except KeyError:
        raise ValueError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        ) from None
