"""Randomized differential fuzzing: random shapes x random flag combos vs
the C binary (survey §4 property-test strategy).

Combos avoid the B1 class (flip + gray/mono WITHOUT resize/rotate — the
reference emits garbage there by bug; see test_quirk_b1_documented). Exact
combos compare byte-for-byte; combos containing resize or arbitrary
rotation allow the documented +-1 on P5/P6 payloads and are skipped for P4
(a +-1 gray change legitimately flips dither bits).
"""

import numpy as np
import pytest

from imageprocessingtools_tpu import cli
from imageprocessingtools_tpu.codec import ppm
from tests.conftest import make_image


def _random_args(rng):
    args = []
    resize = rng.random() < 0.4
    rot = rng.random() < 0.5
    if resize:
        args.append(f"-w{int(rng.integers(1, 40))}")
    if rot:
        args.append(f"-r{int(rng.integers(0, 360))}")
    color = rng.integers(0, 3)
    if color == 1:
        args.append("-gray")
    elif color == 2:
        args.append("-mono")
    flip = rng.integers(0, 3)
    if flip and (resize or rot or color == 0):
        # flips without resize/rotate are fine alone, but pair them with
        # gray/mono only when renewBuffer runs (B1 guard)
        if color == 0 or resize or rot:
            args.append("-fv" if flip == 1 else "-fh")
    if not args:
        args.append("-gray")
    if "-r0" in args and len(args) > 1:
        # B8: -r0 + any later stage is a use-after-free in the reference
        # (the r0 alias is freed by the next renewBuffer) — garbage or a
        # crash, proven in test_quirk_b8_documented / test_sanitizers.
        # -r0 alone stays covered by test_r0_is_copy.
        args[args.index("-r0")] = "-r1"
    rng.shuffle(args)
    return args


def _has_float_op(args):
    return any(
        a.startswith("-w")
        or (a.startswith("-r") and a[2:] not in ("0", "90", "180", "270"))
        for a in args
    )


@pytest.mark.parametrize("case", range(40))
def test_fuzz_vs_reference(ref_runner, tmp_path, capsys, case):
    rng = np.random.default_rng(1000 + case)
    h = int(rng.integers(4, 40))
    w = int(rng.integers(4, 40))
    img = make_image(h, w, seed=case)
    args = _random_args(rng)
    data = ppm.encode_ppm(img)

    ref_code, ref_stdout, ref_out = ref_runner.run(data, args)

    import os

    in_path = os.path.join(str(tmp_path), "f.ppm")
    with open(in_path, "wb") as f:
        f.write(data)
    our_code = cli.main(args + [in_path])
    our_stdout = capsys.readouterr().out
    our_out = None
    if os.path.exists(in_path + ".out"):
        with open(in_path + ".out", "rb") as f:
            our_out = f.read()

    assert our_code == ref_code, (args, h, w, ref_stdout, our_stdout)
    assert our_stdout == ref_stdout, (args, h, w)
    if ref_code != 0:
        return
    assert our_out is not None and ref_out is not None, (args, h, w)
    if not _has_float_op(args):
        assert our_out == ref_out, (args, h, w)
    elif ref_out[:2] != b"P4":
        head_r, pay_r = ref_out.split(b"\n", 3)[:3], ref_out.split(b"\n", 3)[3]
        head_o, pay_o = our_out.split(b"\n", 3)[:3], our_out.split(b"\n", 3)[3]
        assert head_r == head_o, (args, h, w)
        a = np.frombuffer(pay_r, np.uint8).astype(np.int16)
        b = np.frombuffer(pay_o, np.uint8).astype(np.int16)
        assert a.shape == b.shape and np.abs(a - b).max() <= 1, (args, h, w)


@pytest.mark.parametrize("case", range(12))
def test_fuzz_vs_reference_midsize(ref_runner, tmp_path, capsys, case):
    """Same differential at 120-320 px: these sizes route rotation through
    the blocked MXU path (and resize through full-size weight matrices),
    unlike the small-shape fuzz above which exercises the fallbacks."""
    rng = np.random.default_rng(7000 + case)
    h = int(rng.integers(120, 320))
    w = int(rng.integers(120, 320))
    img = make_image(h, w, seed=900 + case)
    args = []
    if rng.random() < 0.5:
        args.append(f"-w{int(rng.integers(60, 400))}")
    args.append(f"-r{int(rng.integers(1, 360))}")  # always rotate (the point)
    color = rng.integers(0, 3)
    if color == 1:
        args.append("-gray")
    elif color == 2:
        args.append("-mono")
    if rng.integers(0, 2):
        args.append("-fv" if rng.integers(0, 2) else "-fh")
    rng.shuffle(args)
    data = ppm.encode_ppm(img)
    ref_code, ref_stdout, ref_out = ref_runner.run(data, args)

    import os

    in_path = os.path.join(str(tmp_path), "m.ppm")
    with open(in_path, "wb") as f:
        f.write(data)
    our_code = cli.main(args + [in_path])
    our_stdout = capsys.readouterr().out
    our_out = None
    if os.path.exists(in_path + ".out"):
        with open(in_path + ".out", "rb") as f:
            our_out = f.read()
    assert our_code == ref_code and our_stdout == ref_stdout, (args, h, w)
    if ref_code != 0:
        return
    if not _has_float_op(args):
        assert our_out == ref_out, (args, h, w)
    elif ref_out[:2] != b"P4":
        head_r, pay_r = ref_out.split(b"\n", 3)[:3], ref_out.split(b"\n", 3)[3]
        head_o, pay_o = our_out.split(b"\n", 3)[:3], our_out.split(b"\n", 3)[3]
        assert head_r == head_o, (args, h, w)
        a = np.frombuffer(pay_r, np.uint8).astype(np.int16)
        b = np.frombuffer(pay_o, np.uint8).astype(np.int16)
        assert a.shape == b.shape and np.abs(a - b).max() <= 1, (args, h, w)
