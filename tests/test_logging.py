"""Structured stderr logging stays off stdout (B3 parity preserved)."""

import json
import os
import subprocess
import sys

from imageprocessingtools_tpu.codec import ppm
from tests.conftest import make_image


def _run_cli(tmp_path, args, env_extra):
    p = os.path.join(str(tmp_path), "x.ppm")
    ppm.write_ppm(p, make_image(4, 4))
    env = {
        **os.environ,
        "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "JAX_PLATFORMS": "cpu",
        **env_extra,
    }
    return subprocess.run(
        [sys.executable, "-m", "imageprocessingtools_tpu.cli"] + args + [p],
        capture_output=True,
        env=env,
    )


def test_structured_log_on_stderr_only(tmp_path):
    proc = _run_cli(tmp_path, ["-gray"], {"IPT_STRUCTURED_LOG": "1"})
    assert proc.returncode == 0
    assert proc.stdout == b""  # stdout untouched on success (parity)
    records = [json.loads(l) for l in proc.stderr.splitlines() if l.startswith(b"{")]
    assert any(r["event"] == "ok" for r in records)


def test_structured_log_error_event(tmp_path):
    proc = _run_cli(tmp_path, ["-r999"], {"IPT_STRUCTURED_LOG": "1"})
    assert proc.returncode == 255
    assert b"invalid option for rotate" in proc.stdout  # parity message
    records = [json.loads(l) for l in proc.stderr.splitlines() if l.startswith(b"{")]
    assert any(r["event"] == "arg_error" for r in records)


def test_disabled_by_default(tmp_path):
    proc = _run_cli(tmp_path, ["-gray"], {})
    assert proc.returncode == 0
    assert not [l for l in proc.stderr.splitlines() if l.startswith(b"{")]
