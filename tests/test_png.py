"""PNG encoder/decoder round-trip tests."""

import numpy as np

from buildingsegment_tpu.io.png import encode_png, read_png, write_png


def test_rgb_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    p = tmp_path / "t.png"
    write_png(str(p), img)
    out = read_png(str(p))
    np.testing.assert_array_equal(out, img)


def test_gray_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, size=(8, 9)).astype(np.uint8)
    p = tmp_path / "g.png"
    write_png(str(p), img)
    out = read_png(str(p))
    np.testing.assert_array_equal(out[:, :, 0], img)


def test_signature_and_chunks():
    img = np.zeros((2, 2, 3), np.uint8)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and data.endswith(
        b"IEND" + data[-4:]
    )
