"""Persistent rotation-audit verdict cache (utils/audit_cache)."""

import json
import os

import pytest

from imageprocessingtools_tpu.ops import geometry
from imageprocessingtools_tpu.utils import audit_cache


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("IPT_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("IPT_AUDIT_CACHE", raising=False)
    return tmp_path


def test_round_trip_and_file_layout(cache_dir):
    assert audit_cache.get(10, 20, 30.0) is None
    audit_cache.put(10, 20, 30.0, True)
    audit_cache.put(7, 7, 135.0, False)
    assert audit_cache.get(10, 20, 30.0) is True
    assert audit_cache.get(7, 7, 135.0) is False
    with open(cache_dir / "rotation_audit.json") as f:
        data = json.load(f)
    assert data["version"] == audit_cache._code_version()
    assert len(data["entries"]) == 2


def test_version_invalidates(cache_dir):
    audit_cache.put(10, 20, 30.0, False)
    p = cache_dir / "rotation_audit.json"
    data = json.loads(p.read_text())
    data["version"] = "stale"
    p.write_text(json.dumps(data))
    assert audit_cache.get(10, 20, 30.0) is None


def test_corrupt_file_degrades_to_miss(cache_dir):
    p = cache_dir / "rotation_audit.json"
    p.write_text("{not json")
    assert audit_cache.get(1, 2, 3.0) is None
    audit_cache.put(1, 2, 3.0, True)  # and put recovers the file
    assert audit_cache.get(1, 2, 3.0) is True


def test_disable_env(cache_dir, monkeypatch):
    monkeypatch.setenv("IPT_AUDIT_CACHE", "0")
    audit_cache.put(10, 20, 30.0, True)
    assert audit_cache.get(10, 20, 30.0) is None
    assert not (cache_dir / "rotation_audit.json").exists()


def test_rotation_decisions_safe_persists_across_lru_clear(cache_dir):
    geometry.rotation_decisions_safe.cache_clear()
    v1 = geometry.rotation_decisions_safe(37, 53, 135.0)
    assert audit_cache.get(37, 53, 135.0) == v1
    # Poison the stored verdict; a cleared-LRU lookup must read it back
    # (proving the persistent layer is consulted, not recomputed).
    audit_cache.put(37, 53, 135.0, not v1)
    geometry.rotation_decisions_safe.cache_clear()
    assert geometry.rotation_decisions_safe(37, 53, 135.0) == (not v1)
    geometry.rotation_decisions_safe.cache_clear()
    audit_cache.put(37, 53, 135.0, v1)


def test_eviction_bound(cache_dir, monkeypatch):
    monkeypatch.setattr(audit_cache._store, "max_entries", 8)
    for i in range(10):
        audit_cache.put(i, 1, 1.0, True)
    data = json.loads((cache_dir / "rotation_audit.json").read_text())
    assert len(data["entries"]) <= 8
    assert audit_cache.get(9, 1, 1.0) is True  # newest survives
