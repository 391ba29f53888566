"""Native (C++) codec vs the Python codec: same grammar, same errors."""

import numpy as np
import pytest

from imageprocessingtools_tpu.codec import native, ppm
from tests.conftest import SHAPES, make_image

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native codec"
)


@pytest.mark.parametrize("shape", SHAPES)
def test_parse_header_matches(shape):
    img = make_image(*shape)
    data = ppm.encode_ppm(img)
    w, h, maxval, off = native.parse_header(data)
    assert (h, w) == img.shape[:2]
    assert maxval == 255
    assert len(data) - off == img.size


def test_parse_header_comments_and_maxval():
    img = make_image(2, 3)
    data = b"#x\nP6 # c\n3 #w\n 2\n65535\n" + img.tobytes()
    w, h, maxval, off = native.parse_header(data)
    assert (w, h, maxval) == (3, 2, 65535)
    np.testing.assert_array_equal(
        np.frombuffer(data[off:], np.uint8).reshape(2, 3, 3), img
    )


@pytest.mark.parametrize(
    "data,msg",
    [
        (b"P5\n2 2\n255\n" + b"\x00" * 12, "error. invalid file format.\n"),
        (b"P6\n2 2\n255\n" + b"\x00" * 11, "file format error\n"),  # short by 1-3: trailer check (B4)
        (b"P6\n2 2\n255\n" + b"\x00" * 8, "Error: unexpected end of file.\n"),
        (b"P6\n2 2\n255\n" + b"\x00" * 13, "file format error\n"),
        (b"\xff\xfe", "error in getting next token. wrong format.\n"),
    ],
)
def test_errors_match_python(data, msg):
    with pytest.raises(ppm.PPMError) as e1:
        ppm.decode_ppm(data)
    with pytest.raises(ppm.PPMError) as e2:
        native.parse_header(data)
    assert e1.value.message == e2.value.message == msg


def test_decode_batch():
    imgs = [make_image(9, 13, seed=s) for s in range(12)]
    buffers = [ppm.encode_ppm(im) for im in imgs]
    batch, maxval = native.decode_batch(buffers, n_threads=4)
    assert batch.shape == (12, 9, 13, 3) and maxval == 255
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(batch[i], im)


def test_decode_batch_bad_member():
    buffers = [ppm.encode_ppm(make_image(4, 4)), b"P6\n4 4\n255\n" + b"\x00" * 10]
    with pytest.raises(ppm.PPMError):
        native.decode_batch(buffers)


@pytest.mark.parametrize("width", [1, 5, 8, 13, 16, 40])
def test_pack_bits_matches_numpy(width):
    rng = np.random.default_rng(width)
    bits = rng.integers(0, 2, size=(7, width), dtype=np.uint8)
    assert native.pack_bits(bits) == np.packbits(bits, axis=1).tobytes()


def test_native_parse_file_header_matches_python(tmp_path):
    """The native prefix-mode header pass (used by serving) agrees with the
    Python parse_file_header on values AND error messages, including a
    header longer than the prefix (retry-on-straddle)."""
    import os

    import numpy as np
    import pytest

    from imageprocessingtools_tpu.codec import native, ppm
    from tests.conftest import make_image

    if not native.available():
        pytest.skip("no native toolchain")

    img = make_image(6, 5, seed=2)
    cases = {
        "plain.ppm": ppm.encode_ppm(img),
        # comment-stuffed header longer than the probe prefix
        "bigheader.ppm": b"P6\n" + (b"#" + b"x" * 200 + b"\n") * 8
                          + b"5 6 255\n" + img.tobytes(),
        "trailing.ppm": ppm.encode_ppm(img) + b"z",
        "short.ppm": ppm.encode_ppm(img)[:-7],
        "badmagic.ppm": b"P5 5 6 255\n" + img.tobytes(),
    }
    for name, data in cases.items():
        p = os.path.join(str(tmp_path), name)
        with open(p, "wb") as f:
            f.write(data)
        try:
            py = ("ok",) + tuple(ppm.parse_file_header(p, prefix_bytes=128))
        except ppm.PPMError as e:
            py = ("err", str(e))
        try:
            nat = ("ok",) + tuple(native.parse_file_header(p, prefix_bytes=128))
        except ppm.PPMError as e:
            nat = ("err", str(e))
        assert nat == py, (name, nat, py)
