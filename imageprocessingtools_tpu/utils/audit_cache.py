"""Persistent cache for host-audit verdicts (rotation zone decisions).

The CLI is one process per image by design (mirroring the reference
binary, ``ppmx-edward.c:117-191``), so in-process ``lru_cache`` on
``ops.geometry.rotation_decisions_safe`` never survives to the next
invocation. With the XLA compile cache removing the 0.6-2 s recompile,
the ~0.5 s O(outH*outW) host audit at 4K became the dominant
per-invocation rotation overhead. This sidecar persists the boolean
verdict per (height, width, angle) next to the compile cache.

Entries are keyed by a code-version tag — the content hash of the
modules whose arithmetic the verdict depends on — so editing the
decision code invalidates every stored verdict. The store is a single
small JSON file written atomically (tmp + rename); a racing writer can
lose a concurrent entry, which only costs a recompute. Any I/O or
format failure degrades to "not cached": the cache is an optimization,
never a dependency.

Disable with ``IPT_AUDIT_CACHE=0``; relocate with ``IPT_CACHE_DIR``
(shared with the native-codec build cache).
"""

from __future__ import annotations

import hashlib
import json
import os
import threading

_DISABLE_VALUES = {"0", "off", "false", "no"}
_MAX_ENTRIES = 4096

_lock = threading.Lock()
_version: str | None = None


def _code_version() -> str:
    """Content hash of the modules the audit's arithmetic lives in."""
    global _version
    if _version is None:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for rel in (
            os.path.join("ops", "geometry.py"),
            os.path.join("ops", "_exact.py"),
        ):
            try:
                with open(os.path.join(here, rel), "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(b"?")
        _version = h.hexdigest()[:16]
    return _version


def _cache_path() -> str | None:
    if os.environ.get("IPT_AUDIT_CACHE", "").strip().lower() in _DISABLE_VALUES:
        return None
    env = os.environ.get("IPT_CACHE_DIR")
    if env:
        base = env
    else:
        base = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "imageprocessingtools_tpu",
        )
    return os.path.join(base, "rotation_audit.json")


def _load(path: str) -> dict:
    try:
        with open(path, "r") as f:
            data = json.load(f)
        if (
            isinstance(data, dict)
            and data.get("version") == _code_version()
            and isinstance(data.get("entries"), dict)
        ):
            return data["entries"]
    except (OSError, ValueError):
        pass
    return {}


def get(height: int, width: int, angle: float) -> bool | None:
    """Stored verdict for this geometry, or None when absent/disabled."""
    path = _cache_path()
    if path is None:
        return None
    with _lock:
        v = _load(path).get(f"{height}x{width}@{angle!r}")
    return v if isinstance(v, bool) else None


def put(height: int, width: int, angle: float, verdict: bool) -> None:
    """Persist a verdict (best-effort; failures are silent by design)."""
    path = _cache_path()
    if path is None:
        return
    with _lock:
        entries = _load(path)
        entries[f"{height}x{width}@{angle!r}"] = bool(verdict)
        if len(entries) > _MAX_ENTRIES:
            # Drop oldest-inserted half (dict preserves insertion order).
            entries = dict(list(entries.items())[len(entries) // 2:])
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump({"version": _code_version(), "entries": entries}, f)
            os.replace(tmp, path)
        except OSError:
            pass
