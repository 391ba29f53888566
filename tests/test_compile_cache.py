"""Persistent compilation cache wiring (utils/compile_cache.py).

The cache is an optimization with a correctness obligation: a cache-hit
run must produce byte-identical output to a cold run, the disable value
must leave JAX config untouched, and enabling must never raise even when
the dir is hostile.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import numpy as np

from imageprocessingtools_tpu.codec.ppm import write_ppm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_env(cache: str) -> dict:
    env = dict(os.environ)
    env["IPT_PLATFORM"] = "cpu"
    env["IPT_COMPILE_CACHE"] = cache
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_cli(args, env):
    return subprocess.run(
        [sys.executable, "-m", "imageprocessingtools_tpu.cli", *args],
        capture_output=True,
        env=env,
    )


def test_cli_cache_roundtrip(tmp_path):
    cache = tmp_path / "xla-cache"
    img = np.random.default_rng(5).integers(0, 256, (24, 32, 3), dtype=np.uint8)
    a = tmp_path / "a.ppm"
    b = tmp_path / "b.ppm"
    write_ppm(str(a), img)
    write_ppm(str(b), img)

    r1 = _run_cli(["-gray", "-w16", str(a)], _cli_env(str(cache)))
    assert r1.returncode == 0, r1.stdout + r1.stderr
    assert cache.is_dir() and any(cache.iterdir()), "cache not populated"

    r2 = _run_cli(["-gray", "-w16", str(b)], _cli_env(str(cache)))
    assert r2.returncode == 0, r2.stdout + r2.stderr
    out_a = pathlib.Path(str(a) + ".out").read_bytes()
    out_b = pathlib.Path(str(b) + ".out").read_bytes()
    assert out_a == out_b, "cache-hit output differs from cold output"


def test_disable_value_leaves_config_untouched(monkeypatch):
    import jax

    from imageprocessingtools_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    before = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("IPT_COMPILE_CACHE", "0")
    assert enable_persistent_cache() is None
    assert jax.config.jax_compilation_cache_dir == before


def test_hostile_dir_degrades_to_none(monkeypatch, tmp_path):
    from imageprocessingtools_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    blocker = tmp_path / "not-a-dir"
    blocker.write_text("file in the way")
    monkeypatch.setenv("IPT_COMPILE_CACHE", str(blocker / "sub"))
    assert enable_persistent_cache() is None
