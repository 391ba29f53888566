"""Persistent manifest of Pallas kernel compiles that are already paid.

A per-geometry Mosaic compile costs minutes on this platform, but once
paid it lives in JAX's persistent compilation cache and reloads in ~1 s
(utils/compile_cache.py) — comparable to the XLA blocked path's own
0.6-2 s compile. So the profitable dispatch policy is: route ``rotate()``
to the Pallas kernel exactly when its compile has been paid before on
this machine. JAX's cache key is internal and version-fragile, so
instead of probing the cache we keep this tiny sidecar manifest: a
successful kernel build records (geometry, device kind, compile-cache
dir); the dispatcher auto-routes on a hit when the same persistent cache
is still configured.

Entries are invalidated by a content hash of the kernel source plus the
JAX version — either change alters the program hash, which would turn an
"already paid" hit into a fresh minutes-scale compile. Disable with
``IPT_KERNEL_MANIFEST=0``; relocate with ``IPT_CACHE_DIR``.
"""

from __future__ import annotations

import os

from imageprocessingtools_tpu.utils.sidecar import (
    JsonSidecar,
    module_content_version,
)

_version: str | None = None


def _code_version() -> str:
    global _version
    if _version is None:
        import jax

        _version = (
            module_content_version(os.path.join("kernels", "pallas_rotate.py"))
            + ":"
            + jax.__version__
        )
    return _version


_store = JsonSidecar(
    "kernel_manifest.json", _code_version, disable_env="IPT_KERNEL_MANIFEST"
)


def _key(kind: str, height: int, width: int, angle: float) -> str:
    import jax

    device_kind = jax.devices()[0].device_kind
    return f"{kind}:{height}x{width}@{angle!r}:{device_kind}"


def compile_paid(kind: str, height: int, width: int, angle: float) -> bool:
    """True when this kernel's Mosaic compile was paid on this machine
    AND the persistent compile cache that holds it is still configured
    (same directory, still present) — i.e. dispatching now costs a ~1 s
    reload, not a minutes-scale compile."""
    entry = _store.get(_key(kind, height, width, angle))
    if not isinstance(entry, dict):
        return False
    cache_dir = entry.get("cache_dir")
    if not cache_dir or not os.path.isdir(cache_dir):
        return False
    import jax

    return jax.config.jax_compilation_cache_dir == cache_dir


def record_compile(kind: str, height: int, width: int, angle: float) -> None:
    """Record a successfully-built kernel (no-op unless the persistent
    compile cache is on — without it nothing was actually paid forward)."""
    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return
    _store.put(_key(kind, height, width, angle), {"cache_dir": cache_dir})
