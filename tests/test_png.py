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


def _filtered_png(img, filt):
    """Hand-encode a PNG whose EVERY scanline uses filter `filt`."""
    import struct
    import zlib

    h, w, c = img.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        enc = np.empty_like(line)
        for i in range(w * c):
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            cc = int(prev[i - bpp]) if i >= bpp else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = a
            elif filt == 2:
                pred = b
            elif filt == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[i] = (line[i] - pred) & 0xFF
        raw.append(filt)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(tag, payload):
        data = tag + payload
        return (
            struct.pack(">I", len(payload)) + data
            + struct.pack(">I", zlib.crc32(data))
        )

    ct = {1: 0, 3: 2}[c]
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_all_filters(tmp_path, rng):
    """Foreign PNGs use filters 1-4; decode must invert every one
    (native fast path and the numpy fallback agree by construction of
    the oracle encoder above)."""
    img = rng.integers(0, 256, size=(13, 19, 3)).astype(np.uint8)
    for filt in range(5):
        p = tmp_path / f"f{filt}.png"
        p.write_bytes(_filtered_png(img, filt))
        out = read_png(str(p))
        np.testing.assert_array_equal(out, img, err_msg=f"filter {filt}")


def test_decode_filters_python_fallback(tmp_path, rng, monkeypatch):
    """The pure-python path must match when the native lib is absent."""
    import buildingsegment_tpu.native.binding as nb

    monkeypatch.setattr(nb, "png_defilter_native", lambda *a, **k: None)
    img = rng.integers(0, 256, size=(7, 11, 3)).astype(np.uint8)
    for filt in range(5):
        p = tmp_path / f"f{filt}.png"
        p.write_bytes(_filtered_png(img, filt))
        out = read_png(str(p))
        np.testing.assert_array_equal(out, img, err_msg=f"filter {filt}")


def test_decode_foreign_png_pil(tmp_path, rng):
    """Cross-check against a PIL-encoded PNG (adaptive filter choice)."""
    try:
        from PIL import Image
    except ImportError:
        import pytest

        pytest.skip("PIL unavailable")
    img = rng.integers(0, 256, size=(33, 47, 3)).astype(np.uint8)
    p = tmp_path / "pil.png"
    Image.fromarray(img).save(str(p), optimize=True)
    out = read_png(str(p))
    np.testing.assert_array_equal(out, img)


def test_signature_and_chunks():
    img = np.zeros((2, 2, 3), np.uint8)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and data.endswith(
        b"IEND" + data[-4:]
    )
