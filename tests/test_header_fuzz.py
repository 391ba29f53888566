"""Randomized header-grammar fuzzing: Python codec vs native codec vs the
C binary three-way, over random whitespace/comment/token permutations."""

import numpy as np
import pytest

from imageprocessingtools_tpu.codec import native, ppm
from tests.conftest import make_image

_WS = [b" ", b"\t", b"\n", b"\r", b"\x0b", b"\x0c"]


def _random_sep(rng, allow_comment=True):
    parts = [_WS[rng.integers(0, len(_WS))]]
    while rng.random() < 0.4:
        if allow_comment and rng.random() < 0.3:
            parts.append(b"#" + bytes(rng.integers(32, 127, rng.integers(0, 8)).astype(np.uint8)) + b"\n")
        else:
            parts.append(_WS[rng.integers(0, len(_WS))])
    return b"".join(parts)


def _random_header(rng, w, h, maxval):
    # leading junk: comments/whitespace before magic (ref seeds current='\n')
    head = b""
    if rng.random() < 0.3:
        head += b"#lead\n"
    head += b"P6"
    head += _random_sep(rng)
    head += str(w).encode()
    head += _random_sep(rng)
    head += str(h).encode()
    head += _random_sep(rng)
    head += str(maxval).encode()
    # exactly one terminator char (possibly a comment ending in newline)
    if rng.random() < 0.2:
        head += b"#trail\n"
    else:
        head += _WS[rng.integers(0, len(_WS))]
    return head


@pytest.mark.parametrize("case", range(30))
def test_header_grammar_three_way(ref_runner, case):
    rng = np.random.default_rng(4000 + case)
    h = int(rng.integers(1, 12))
    w = int(rng.integers(1, 12))
    maxval = int(rng.choice([255, 1, 1000, 65535]))
    img = make_image(h, w, seed=case)
    data = _random_header(rng, w, h, maxval) + img.tobytes()

    # Python codec
    py_img, py_maxval = ppm.decode_ppm(data)
    np.testing.assert_array_equal(py_img, img)
    assert py_maxval == maxval

    # Native codec (if built)
    if native.available():
        nw, nh, nmv, off = native.parse_header(data)
        assert (nw, nh, nmv) == (w, h, maxval)
        np.testing.assert_array_equal(
            np.frombuffer(data[off:], np.uint8).reshape(h, w, 3), img
        )

    # C binary accepts it too (round trip through -r0 = identity copy)
    code, stdout, out = ref_runner.run(data, ["-r0"])
    assert code == 0, (stdout, data[:60])
    payload = out.split(b"\n", 3)[3].split(b"\n", 1)[1]
    np.testing.assert_array_equal(
        np.frombuffer(payload, np.uint8).reshape(h, w, 3), img
    )


@pytest.mark.parametrize("case", range(15))
def test_malformed_headers_three_way(ref_runner, case):
    """Random corruption: all three implementations must reject (the exact
    message may differ only where the reference behavior is UB-hardened)."""
    rng = np.random.default_rng(5000 + case)
    img = make_image(3, 4, seed=case)
    data = bytearray(b"P6\n4 3\n255\n" + img.tobytes())
    mode = case % 3
    if mode == 0:
        data = data[: rng.integers(1, 10)]  # truncated header
    elif mode == 1:
        data[rng.integers(0, 2)] = ord("X")  # corrupt magic
    else:
        data = data + b"\x00" * int(rng.integers(1, 5))  # trailing junk

    data = bytes(data)
    with pytest.raises(ppm.PPMError):
        ppm.decode_ppm(data)
    if native.available():
        with pytest.raises(ppm.PPMError):
            native.parse_header(data)
    code, _, _ = ref_runner.run(data, ["-r0"])
    assert code == 255
