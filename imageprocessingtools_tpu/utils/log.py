"""Structured diagnostics (survey §5: metrics/logging subsystem).

The reference prints errors to STDOUT and exits 255 (quirk B3); the CLI
keeps that surface byte-compatible. When ``IPT_STRUCTURED_LOG=1``, a JSON
diagnostic line additionally goes to STDERR (never stdout, so differential
tests stay byte-identical).
"""

from __future__ import annotations

import json
import os
import sys
import time


def enabled() -> bool:
    return os.environ.get("IPT_STRUCTURED_LOG") == "1"


def emit(event: str, **fields) -> None:
    if not enabled():
        return
    record = {"ts": round(time.time(), 3), "event": event, **fields}
    print(json.dumps(record), file=sys.stderr, flush=True)
