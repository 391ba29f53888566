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


@pytest.mark.parametrize("file_type", [ppm.FILETYPE_PPM, ppm.FILETYPE_PGM])
@pytest.mark.parametrize("shape", [(1, 1), (5, 3), (16, 9), (31, 64)])
def test_encode_batch_files_byte_identical(tmp_path, file_type, shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    n = 6
    if file_type == ppm.FILETYPE_PPM:
        batch = rng.integers(0, 256, size=(n, *shape, 3), dtype=np.uint8)
    else:
        batch = rng.integers(0, 256, size=(n, *shape), dtype=np.uint8)
    maxvals = [255, 1, 65535, 255, 300, 7]
    paths = [str(tmp_path / f"e{i}.out") for i in range(n)]
    native.encode_batch_files(paths, batch, file_type, maxvals)
    for i, p in enumerate(paths):
        with open(p, "rb") as f:
            assert f.read() == ppm.encode_ppm(batch[i], file_type, maxvals[i])


@pytest.mark.parametrize("width", [1, 5, 8, 13, 17])
def test_encode_batch_files_p4_byte_identical(tmp_path, width):
    rng = np.random.default_rng(width)
    n, h = 4, 6
    bits = rng.integers(0, 2, size=(n, h, width), dtype=np.uint8)
    packed = np.packbits(bits, axis=2)
    paths = [str(tmp_path / f"b{i}.out") for i in range(n)]
    native.encode_batch_files(
        paths, packed, ppm.FILETYPE_PBM, [255] * n, p4_dims=(h, width))
    for i, p in enumerate(paths):
        with open(p, "rb") as f:
            assert f.read() == ppm.encode_ppm(bits[i], ppm.FILETYPE_PBM)


def test_encode_batch_files_error_surface(tmp_path):
    batch = np.zeros((2, 3, 4, 3), dtype=np.uint8)
    bad = [str(tmp_path / "ok.out"), str(tmp_path / "no_dir" / "x.out")]
    with pytest.raises(ppm.PPMError) as ei:
        native.encode_batch_files(bad, batch, ppm.FILETYPE_PPM, [255, 255])
    assert ei.value.message == "Error: unable to open file for writing\n"
    # The good file is still written (per-file isolation in the writer).
    with open(bad[0], "rb") as f:
        assert f.read() == ppm.encode_ppm(batch[0])


def test_encode_batch_files_noncontiguous_and_empty(tmp_path):
    # A strided view (every other image) must be handled via the
    # ascontiguousarray copy, and n == 0 must be a no-op.
    rng = np.random.default_rng(9)
    batch = rng.integers(0, 256, size=(6, 4, 5, 3), dtype=np.uint8)[::2]
    paths = [str(tmp_path / f"s{i}.out") for i in range(3)]
    native.encode_batch_files(paths, batch, ppm.FILETYPE_PPM, [255] * 3)
    for i, p in enumerate(paths):
        with open(p, "rb") as f:
            assert f.read() == ppm.encode_ppm(batch[i])
    native.encode_batch_files([], batch[:0], ppm.FILETYPE_PPM, [])


def test_decode_batch_files_matches_decode_batch(tmp_path):
    imgs = [make_image(11, 7, seed=s) for s in range(9)]
    paths = []
    for i, im in enumerate(imgs):
        p = tmp_path / f"f{i}.ppm"
        ppm.write_ppm(str(p), im)
        paths.append(str(p))
    batch, errs = native.decode_batch_files(paths, 11, 7, n_threads=4)
    assert not errs
    ref, _ = native.decode_batch([open(p, "rb").read() for p in paths])
    np.testing.assert_array_equal(batch, ref)


@pytest.mark.parametrize(
    "payload,kind,msg",
    [
        (b"P5\n2 2\n255\n" + b"\x00" * 12, "ppm", "error. invalid file format.\n"),
        (b"P6\n2 2\n255\n" + b"\x00" * 8, "ppm", "Error: unexpected end of file.\n"),
        (b"P6\n2 2\n255\n" + b"\x00" * 11, "ppm", "file format error\n"),
        (None, "open", "error. can not open file\n"),  # missing file
    ],
)
def test_decode_batch_files_error_surface(tmp_path, payload, kind, msg):
    good = make_image(2, 2, seed=1)
    paths = []
    for i in range(3):
        p = tmp_path / f"g{i}.ppm"
        ppm.write_ppm(str(p), good)
        paths.append(str(p))
    if payload is None:
        paths[1] = str(tmp_path / "missing.ppm")
    else:
        paths[1] = str(tmp_path / "bad.ppm")
        with open(paths[1], "wb") as f:
            f.write(payload)
    batch, errs = native.decode_batch_files(paths, 2, 2)
    assert errs == {1: (kind, msg)}
    np.testing.assert_array_equal(batch[0], good)
    np.testing.assert_array_equal(batch[2], good)


def test_decode_batch_files_dims_mismatch_is_invalid_format(tmp_path):
    # The bucket shape is the header pass's claim; a file whose header
    # disagrees decodes as corrupt, matching the serving skip-path surface.
    p = tmp_path / "other.ppm"
    ppm.write_ppm(str(p), make_image(5, 4, seed=2))
    _, errs = native.decode_batch_files([str(p)], 3, 3)
    assert errs == {0: ("ppm", "error. invalid file format.\n")}


def test_decode_batch_files_header_straddles_prefix(tmp_path):
    # A >64 KB comment run pushes the payload past the prefix read: the
    # native decoder must retry over the whole file (heap path).
    img = make_image(6, 5, seed=3)
    p = tmp_path / "bigc.ppm"
    with open(p, "wb") as f:
        f.write(b"P6\n#" + b"x" * 70000 + b"\n5 6\n255\n" + img.tobytes())
    batch, errs = native.decode_batch_files([str(p)], 6, 5)
    assert not errs
    np.testing.assert_array_equal(batch[0], img)


def test_decode_batch_files_directory_is_open_failure(tmp_path):
    _, errs = native.decode_batch_files([str(tmp_path)], 2, 2)
    assert errs == {0: ("open", "error. can not open file\n")}
