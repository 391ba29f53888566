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


@pytest.fixture(scope="session")
def asan_reference(tmp_path_factory):
    """The REFERENCE binary compiled with ASan — used to prove quirk B8's
    use-after-free at the binary level (evidence only; never an oracle)."""
    out = str(tmp_path_factory.mktemp("san") / "ppmx_asan")
    proc = subprocess.run(
        ["gcc", "-O1", "-g", "-fsanitize=address", "-o", out,
         "/root/reference/ppmx-edward.c", "-lm"],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {proc.stderr[:300]}")
    return out


def test_quirk_b8_use_after_free_proven(asan_reference, tmp_path):
    """B8: -r0 aliases new_buff = buff; the next stage's renewBuffer frees
    the alias and the stage reads freed rows. ASan pinpoints the read at
    ppmx-edward.c:1000 (gray's buff[y][x] access)."""
    from imageprocessingtools_tpu.codec import ppm

    rng = np.random.default_rng(0)
    p = str(tmp_path / "b8.ppm")
    ppm.write_ppm(p, rng.integers(0, 256, (9, 11, 3), dtype=np.uint8))
    r = subprocess.run([asan_reference, "-r0", "-gray", p],
                       capture_output=True, text=True)
    assert r.returncode != 0
    assert "heap-use-after-free" in r.stderr
    assert "in gray" in r.stderr
