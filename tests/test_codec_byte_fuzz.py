"""Byte-level corruption fuzzing of the codec surface.

Random mutations (bit flips, truncations, insertions, deletions) of valid
P6 files, asserting:

1. the Python codec NEVER crashes or hangs — every rejection is a clean
   PPMError (the hardened-B4 contract; the C reference has UB here);
2. the native C++ codec agrees with the Python codec case-by-case —
   same accept/reject decision, same decoded bytes on accept;
3. when our codec accepts, the C reference binary also accepts and its
   .out payload (for -fv, an exact op) is byte-identical to ours.

The mutation space deliberately includes the reference's B4 danger zones
(unterminated comments, huge digit runs, short payloads): there we only
require OUR side to fail cleanly — the C's behavior is undefined.
"""

import numpy as np
import pytest

from imageprocessingtools_tpu.codec import native, ppm
from tests.conftest import make_image

N_CASES = 300


def _mutate(rng, data: bytes) -> bytes:
    buf = bytearray(data)
    op = rng.integers(0, 5)
    if op == 0 and len(buf) > 1:          # flip random bytes
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(buf)))
            buf[i] = int(rng.integers(0, 256))
    elif op == 1 and len(buf) > 2:        # truncate
        buf = buf[: int(rng.integers(1, len(buf)))]
    elif op == 2:                         # append garbage
        buf += bytes(rng.integers(0, 256, int(rng.integers(1, 16))).astype(np.uint8))
    elif op == 3 and len(buf) > 2:        # delete a span
        i = int(rng.integers(0, len(buf) - 1))
        j = min(len(buf), i + int(rng.integers(1, 8)))
        del buf[i:j]
    else:                                 # insert bytes (incl. '#', digits)
        i = int(rng.integers(0, len(buf)))
        ins = rng.choice([b"#", b"9" * int(rng.integers(1, 15)),
                          bytes(rng.integers(0, 256, 3).astype(np.uint8))])
        buf[i:i] = ins
    return bytes(buf)


def _py_decode(data):
    try:
        img, maxval = ppm.decode_ppm(data)
        return ("ok", np.asarray(img).tobytes(), int(maxval))
    except ppm.PPMError as e:
        return ("err", str(e), None)


def _native_decode(data):
    try:
        batch, maxval = native.decode_batch([data])
        return ("ok", np.asarray(batch[0]).tobytes(), int(maxval))
    except ppm.PPMError as e:
        return ("err", str(e), None)


@pytest.mark.parametrize("batch", range(10))
def test_byte_corruption_fuzz(ref_runner, batch):
    rng = np.random.default_rng(77000 + batch)
    n_acc = 0
    for case in range(N_CASES // 10):
        h = int(rng.integers(1, 10))
        w = int(rng.integers(1, 10))
        img = make_image(h, w, seed=batch * 1000 + case)
        if case == 0:
            # One guaranteed-valid file per batch so the accept path
            # (codec agreement + C-binary comparison) always executes.
            data = ppm.encode_ppm(img)
        else:
            data = _mutate(rng, ppm.encode_ppm(img))

        py = _py_decode(data)                    # 1: must not raise non-PPMError
        if native.available():
            nat = _native_decode(data)           # 2: codecs agree
            assert nat[0] == py[0], (batch, case)
            # Same decision AND same message/bytes: rejects must carry the
            # identical reference error string on both sides.
            assert nat[1] == py[1] and nat[2] == py[2], (batch, case)

        if py[0] == "ok":                        # 3: C binary agrees on accepts
            n_acc += 1
            code, _, ref_out = ref_runner.run(data, ["-fv"])
            assert code == 0, (batch, case)
            dec, mv = ppm.decode_ppm(data)
            ours = ppm.encode_ppm(np.asarray(dec)[::-1], max_color=mv)
            assert ref_out == ours, (batch, case)
    # the unmutated case guarantees accept-path coverage every batch
    assert n_acc >= 1


def test_header_int_digit_bound():
    """Both codecs reject header-int tokens longer than 9 digit CHARS —
    leading zeros included, because the reference's 10-byte token buffer
    counts raw chars, so a 13-char all-zero run is just as much UB as a
    12-digit value (found by the byte fuzzer: the native uint32 ABI used
    to truncate a 12-digit maxval mod 2^32). The two codecs must also
    raise the SAME message (the native side must not remap its digit
    error to a positional width/height/maxval message)."""
    img = make_image(2, 2, seed=0)
    payload = img.tobytes()

    def hdr(maxval: bytes) -> bytes:
        return b"P6 2 2 " + maxval + b"\n" + payload

    ok9 = hdr(b"999999999")          # 9 chars: defined, pass-through
    dec, mv = ppm.decode_ppm(ok9)
    assert mv == 999999999
    ok0 = hdr(b"000000255")          # 9 chars with leading zeros: accepted
    assert ppm.decode_ppm(ok0)[1] == 255
    for bad in (hdr(b"999999999255"),     # 12 chars
                hdr(b"0000000000255"),    # 13 chars, small value: still UB
                b"P6 9999999999 2 255\n" + payload):   # 10-char width
        with pytest.raises(ppm.PPMError) as ei:
            ppm.decode_ppm(bad)
        py_msg = str(ei.value)
        if native.available():
            with pytest.raises(ppm.PPMError) as ein:
                native.parse_header(bad)
            assert str(ein.value) == py_msg
    if native.available():
        assert native.parse_header(ok9)[2] == 999999999
        assert native.parse_header(ok0)[2] == 255


def test_lexer_error_message_corners():
    """Positional message-mapping corners (found by the round-2 advisor):
    the native parser must keep lexer-failure messages (token error,
    unterminated comment, digit bound) at width/height/maxval positions
    instead of remapping them to positional messages, and must remap ALL
    lexer failures at the magic position to the token error, exactly as
    codec/ppm.py::_parse_header does."""
    img = make_image(2, 2, seed=1)
    payload = img.tobytes()
    cases = [
        # >9 digits at the MAGIC position: Python catches the digit-bound
        # error there and remaps to the token error.
        b"P5 " * 0 + b"1234567890 2 2 255\n" + payload,
        # digits running into an unterminated comment at the width position
        b"P6 12#no-newline",
        # >9-digit width directly at EOF
        b"P6 1234567890",
        # punctuation at the width position -> token error, not positional
        b"P6 !2 2 255\n" + payload,
        # word at the width position -> positional width message
        b"P6 abc 2 255\n" + payload,
        # unterminated comment immediately after the magic's extra char
        b"P6#no-newline",
        # unterminated comment between height and maxval
        b"P6 2 2 #oops",
    ]
    for data in cases:
        with pytest.raises(ppm.PPMError) as ei:
            ppm.decode_ppm(data)
        if native.available():
            with pytest.raises(ppm.PPMError) as ein:
                native.parse_header(data)
            assert str(ein.value) == str(ei.value), data
