"""Cache-aware Pallas-rotate dispatch (utils/kernel_manifest)."""

import numpy as np
import pytest

import jax

from imageprocessingtools_tpu.ops import geometry
from imageprocessingtools_tpu.utils import kernel_manifest


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("IPT_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("IPT_KERNEL_MANIFEST", raising=False)
    monkeypatch.delenv("IPT_PALLAS_ROTATE", raising=False)
    return tmp_path


@pytest.fixture
def compile_cache_on(tmp_path, monkeypatch):
    d = tmp_path / "xla"
    d.mkdir()
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(d))
    yield str(d)
    jax.config.update("jax_compilation_cache_dir", prev)


def test_not_paid_when_empty(cache_dir, compile_cache_on):
    assert not kernel_manifest.compile_paid("rotate_blocked", 2160, 3840, 30.0)


def test_record_and_hit(cache_dir, compile_cache_on):
    kernel_manifest.record_compile("rotate_blocked", 2160, 3840, 30.0)
    assert kernel_manifest.compile_paid("rotate_blocked", 2160, 3840, 30.0)
    # A different geometry/angle is a miss.
    assert not kernel_manifest.compile_paid("rotate_blocked", 2160, 3840, 31.0)
    assert not kernel_manifest.compile_paid("rotate_blocked", 1080, 3840, 30.0)


def test_record_noop_without_compile_cache(cache_dir, monkeypatch):
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        kernel_manifest.record_compile("rotate_blocked", 2160, 3840, 30.0)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
    assert not (cache_dir / "kernel_manifest.json").exists()


def test_hit_requires_same_cache_dir(cache_dir, compile_cache_on, tmp_path):
    kernel_manifest.record_compile("rotate_blocked", 2160, 3840, 30.0)
    other = tmp_path / "elsewhere"
    other.mkdir()
    jax.config.update("jax_compilation_cache_dir", str(other))
    # Entry points at compile_cache_on's dir; current config differs -> cold.
    assert not kernel_manifest.compile_paid("rotate_blocked", 2160, 3840, 30.0)


def test_hit_requires_cache_dir_exists(cache_dir, compile_cache_on):
    import shutil

    kernel_manifest.record_compile("rotate_blocked", 2160, 3840, 30.0)
    shutil.rmtree(compile_cache_on)
    assert not kernel_manifest.compile_paid("rotate_blocked", 2160, 3840, 30.0)


def test_dispatch_policy(cache_dir, compile_cache_on, monkeypatch):
    img = np.zeros((2160, 3840, 3), dtype=np.uint8)

    kernel_manifest.record_compile("rotate_blocked", 2160, 3840, 30.0)
    if jax.default_backend() != "tpu":
        # CPU backend -> never wants pallas regardless of manifest;
        # pretend-TPU below exercises the policy logic. Under
        # IPT_TEST_TPU=1 the real backend validates it directly.
        assert not geometry._pallas_rotate_wanted(img, 30.0)
        monkeypatch.setattr(geometry.jax, "default_backend", lambda: "tpu")
    assert geometry._pallas_rotate_wanted(img, 30.0)  # auto: manifest hit
    assert not geometry._pallas_rotate_wanted(img, 31.0)  # auto: cold
    monkeypatch.setenv("IPT_PALLAS_ROTATE", "1")
    assert geometry._pallas_rotate_wanted(img, 31.0)  # forced on
    monkeypatch.setenv("IPT_PALLAS_ROTATE", "0")
    assert not geometry._pallas_rotate_wanted(img, 30.0)  # forced off
    monkeypatch.delenv("IPT_PALLAS_ROTATE")
    small = np.zeros((100, 100, 3), dtype=np.uint8)
    assert not geometry._pallas_rotate_wanted(small, 30.0)  # sub-1.5 MPix
