"""ASan/UBSan over the native codec + jax debug-nans checks (survey §5)."""

import os
import subprocess

import numpy as np
import pytest

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "imageprocessingtools_tpu",
    "codec",
    "csrc",
)


@pytest.fixture(scope="session")
def sanitized_selftest(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("san") / "ppmcodec_selftest")
    proc = subprocess.run(
        [
            "g++",
            "-O1",
            "-g",
            "-std=c++17",
            "-fsanitize=address,undefined",
            "-fno-sanitize-recover=all",
            "-o",
            out,
            os.path.join(_CSRC, "ppmcodec.cpp"),
            os.path.join(_CSRC, "ppmcodec_selftest.cpp"),
            "-pthread",
        ],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {proc.stderr[:300]}")
    return out


def test_native_codec_under_asan_ubsan(sanitized_selftest):
    proc = subprocess.run(
        [sanitized_selftest],
        capture_output=True,
        text=True,
        env={**os.environ, "ASAN_OPTIONS": "detect_leaks=1"},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "selftest OK" in proc.stdout


def test_float_ops_produce_no_nans():
    """jax debug_nans over the float-accumulation ops (survey §5 CI check)."""
    import jax

    import imageprocessingtools_tpu as ipt
    from tests.conftest import make_image

    img = make_image(16, 20, seed=3)
    jax.config.update("jax_debug_nans", True)
    try:
        np.asarray(ipt.resize_width(img, 11))
        np.asarray(ipt.rotate(img, 37))
        np.asarray(ipt.equalize_histogram(ipt.grayscale(img)))
        np.asarray(ipt.sobel(ipt.grayscale(img)))
    finally:
        jax.config.update("jax_debug_nans", False)
