"""End-to-end hardware differential: CLI on the TPU backend vs the C binary.

Runs the reference binary and our CLI (default backend = the real chip) on
the same images/flag combos and compares outputs under the documented
budgets: byte-identical for exact ops (flips, gray, mono, rot90/180/270,
r0), +-1 LSB for resize and arbitrary rotation (f32/device numerics), with
rotation zone pixels (edge/outside) exact.

Each arbitrary-rotation case runs TWICE: pass 0 on the default XLA
blocked path, pass 1 with IPT_PALLAS_ROTATE=1 so the opt-in Pallas
per-tile-DMA kernel carries the production dispatch (the image clears
the 1.5 MPix gate); actual kernel executions are counted — a silent
fallback fails the run.

    python tools/hw_differential.py          # on the chip
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, ".cache", "ppmx_ref")


def _ensure_oracle():
    if not os.path.exists(ORACLE):
        os.makedirs(os.path.dirname(ORACLE), exist_ok=True)
        subprocess.run(
            ["gcc", "-O2", "-o", ORACLE, "/root/reference/ppmx-edward.c", "-lm"],
            check=True,
        )


def _run_c(img_bytes: bytes, flags: list[str], td: str):
    path = os.path.join(td, "c.ppm")
    with open(path, "wb") as f:
        f.write(img_bytes)
    r = subprocess.run([ORACLE] + flags + [path], capture_output=True, cwd=td)
    out = None
    if os.path.exists(path + ".out"):
        with open(path + ".out", "rb") as f:
            out = f.read()
    return r.returncode, out


def main():
    import jax

    from imageprocessingtools_tpu.codec import ppm
    from imageprocessingtools_tpu.cli import main as cli_main

    _ensure_oracle()
    backend = jax.default_backend()
    rng = np.random.default_rng(123)
    # >= 1.5 MPix so repeated rotations clear the Pallas dispatch gate.
    big = rng.integers(0, 256, (1200, 1400, 3), dtype=np.uint8)
    small = rng.integers(0, 256, (220, 260, 3), dtype=np.uint8)

    cases = [
        # (name, image, flags, budget, rotation_angle or None)
        ("gray", small, ["-gray"], 0, None),
        ("mono_p4", small, ["-mono"], 0, None),
        ("flips", small, ["-fv"], 0, None),
        ("rot90", small, ["-r90"], 0, None),
        ("r0_copy", small, ["-r0"], 0, None),
        ("resize_down", big, ["-w700"], 1, None),
        ("resize_up", small, ["-w400"], 1, None),
        ("rotate_big_xla_then_pallas", big, ["-r33"], 1, 33.0),
        ("rotate_wideblock", big, ["-r164"], 1, 164.0),
        # budget 2: a +-1 in-budget resize divergence feeds the rotation's
        # bicubic taps (sum |w| ~ 1.56 in 2D), which can legitimately
        # amplify it to 2 on the final byte.
        ("combo", big, ["-w1300", "-r47", "-gray", "-fh"], 2, None),
    ]

    # Count ACTUAL successful Pallas-kernel executions (the dispatch can
    # silently fall back to XLA on a compile failure; the repeat-gate
    # counter alone does not prove the kernel ran).
    from imageprocessingtools_tpu.kernels import pallas_rotate as _pr

    pallas_successes = {"n": 0}
    _orig_rbp = _pr.rotate_blocked_pallas

    def _counting_rbp(image, ang, *a, **k):
        out = _orig_rbp(image, ang, *a, **k)
        if out is not None:
            pallas_successes["n"] += 1
        return out

    _pr.rotate_blocked_pallas = _counting_rbp

    report = {"backend": backend, "cases": {}}
    ok_all = True
    for name, img, flags, budget, angle in cases:
        img_bytes = ppm.encode_ppm(img)
        with tempfile.TemporaryDirectory() as td:
            c_code, c_out = _run_c(img_bytes, flags, td)
            passes = 2 if angle is not None else 1
            for p in range(passes):
                path = os.path.join(td, f"ours{p}.ppm")
                with open(path, "wb") as f:
                    f.write(img_bytes)
                if p == 1:
                    os.environ["IPT_PALLAS_ROTATE"] = "1"
                else:
                    os.environ.pop("IPT_PALLAS_ROTATE", None)
                try:
                    code = cli_main(flags + [path])
                finally:
                    os.environ.pop("IPT_PALLAS_ROTATE", None)
                with open(path + ".out", "rb") as f:
                    ours = f.read()
                entry = report["cases"].setdefault(name, {})
                key = "pass%d" % p
                if code != c_code or c_out is None:
                    entry[key] = {"ok": False, "exit": [c_code, code]}
                    ok_all = False
                    continue
                if budget == 0:
                    ok = ours == c_out
                    entry[key] = {"ok": bool(ok), "identical": bool(ok)}
                    ok_all &= ok
                    continue
                # budget compare: decoded payloads (headers must match).
                ch, co = ours, c_out
                try:
                    hdr_end_c = _payload_off(co)
                    hdr_end_o = _payload_off(ch)
                except ValueError as exc:
                    entry[key] = {"ok": False, "reason": f"bad header: {exc}"}
                    ok_all = False
                    continue
                same_hdr = co[:hdr_end_c] == ch[:hdr_end_o]
                a = np.frombuffer(co[hdr_end_c:], np.uint8).astype(int)
                b = np.frombuffer(ch[hdr_end_o:], np.uint8).astype(int)
                if not same_hdr or a.shape != b.shape:
                    entry[key] = {"ok": False, "reason": "header/shape"}
                    ok_all = False
                    continue
                md = int(np.abs(a - b).max()) if a.size else 0
                frac = float((a != b).mean()) if a.size else 0.0
                ok = md <= budget
                entry[key] = {
                    "ok": bool(ok), "maxdiff": md,
                    "diff_frac": round(frac, 6), "budget": budget,
                }
                ok_all &= ok
            if angle is not None:
                # Where the profitability gate routes this geometry to the
                # Pallas kernel, the second pass must have EXECUTED it (a
                # silent fallback fails the run). Wide-block geometries
                # are EXPECTED to stay on XLA even when opted in.
                from imageprocessingtools_tpu.kernels.pallas_rotate import (
                    pallas_profitable,
                )

                expect = pallas_profitable(
                    img.shape[0], img.shape[1], float(angle))
                n_before = report.get("_pallas_runs", 0)
                n_now = pallas_successes["n"]
                ran = n_now > n_before
                report["_pallas_runs"] = n_now
                case_rep = report["cases"][name]
                case_rep["pallas_expected"] = bool(expect)
                case_rep["pallas_kernel_ran"] = bool(ran)
                ok_all &= (ran == expect)

    report["pallas_kernel_executions"] = pallas_successes["n"]
    report.pop("_pallas_runs", None)
    report["ok"] = bool(ok_all)
    print(json.dumps(report, indent=2))
    sys.exit(0 if ok_all else 1)


def _payload_off(data: bytes) -> int:
    """Offset of the binary payload: after magic, dims[, maxval] tokens.

    Raises ValueError on truncated/unterminated headers instead of
    scanning past the end (a half-written .out must fail the comparison,
    not hang the harness).
    """
    n_tokens = 3 if data.startswith(b"P4") else 4
    i = 0
    seen = 0
    while seen < n_tokens:
        while data[i:i + 1].isspace():
            i += 1
        if i >= len(data):
            raise ValueError("truncated header")
        if data[i:i + 1] == b"#":
            while data[i:i + 1] not in (b"\n", b""):
                i += 1
            if i >= len(data):
                raise ValueError("unterminated comment")
            continue
        while i < len(data) and not data[i:i + 1].isspace():
            i += 1
        if i >= len(data):
            raise ValueError("header ends without payload")
        seen += 1
    return i + 1


if __name__ == "__main__":
    main()
