"""Native C++ PLY codec: build, parity with the numpy codec, speed."""

import numpy as np
import pytest

from buildingsegment_tpu.io.ply import (
    HostPointCloud,
    read_ply_bytes,
    write_ply_bytes,
)
from buildingsegment_tpu.native.binding import (
    native_available,
    read_ply_native,
    write_ply_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native codec not built / no toolchain"
)


@pytest.fixture
def cloud(rng):
    pos = rng.integers(-50_000, 50_000, size=(5000, 3)).astype(np.int32)
    col = rng.integers(0, 256, size=(5000, 3)).astype(np.uint16)
    return HostPointCloud(positions=pos, colors=col)


class TestNativeParity:
    def test_binary_roundtrip_native_write_numpy_read(self, cloud, tmp_path):
        p = str(tmp_path / "n.ply")
        assert write_ply_native(cloud, p)
        rt = read_ply_bytes(open(p, "rb").read())
        np.testing.assert_array_equal(rt.positions, cloud.positions)
        np.testing.assert_array_equal(rt.colors, cloud.colors & 0xFF)

    def test_numpy_write_native_read(self, cloud, tmp_path):
        p = str(tmp_path / "np.ply")
        with open(p, "wb") as f:
            f.write(write_ply_bytes(cloud))
        rt = read_ply_native(p, position_scale=1.0)
        assert rt is not None
        np.testing.assert_array_equal(rt.positions, cloud.positions)
        np.testing.assert_array_equal(rt.colors, cloud.colors & 0xFF)

    def test_scale_truncation_matches(self, tmp_path, rng):
        # quantization semantics must match the numpy path bit-for-bit
        raw = rng.uniform(-100, 100, size=(2000, 3))
        body = "\n".join(" ".join(f"{v:.7f}" for v in r) for r in raw)
        text = (
            "ply\nformat ascii 1.0\nelement vertex 2000\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n" + body + "\n"
        ).encode()
        p = str(tmp_path / "a.ply")
        open(p, "wb").write(text)
        np_pc = read_ply_bytes(text, position_scale=1000.0)
        nat_pc = read_ply_native(p, position_scale=1000.0)
        assert nat_pc is not None
        np.testing.assert_array_equal(nat_pc.positions, np_pc.positions)

    def test_header_layout_identical(self, cloud, tmp_path):
        p = str(tmp_path / "h.ply")
        assert write_ply_native(cloud, p)
        native_head = open(p, "rb").read().split(b"end_header\n")[0]
        numpy_head = write_ply_bytes(cloud).split(b"end_header\n")[0]
        assert native_head == numpy_head

    def test_binary_bytes_identical(self, cloud, tmp_path):
        p = str(tmp_path / "b.ply")
        assert write_ply_native(cloud, p)
        assert open(p, "rb").read() == write_ply_bytes(cloud)

    def test_big_endian_read(self, tmp_path):
        import struct

        head = (
            b"ply\nformat binary_big_endian 1.0\nelement vertex 2\n"
            b"property float32 x\nproperty float32 y\nproperty float32 z\n"
            b"end_header\n"
        )
        body = struct.pack(">3f", 1.5, -2.5, 3.5) + struct.pack(
            ">3f", 100.0, 200.0, -300.0
        )
        p = str(tmp_path / "be.ply")
        open(p, "wb").write(head + body)
        pc = read_ply_native(p, position_scale=2.0)
        np.testing.assert_array_equal(
            pc.positions, [[3, -5, 7], [200, 400, -600]]
        )

    def test_unknown_property_skipped(self, tmp_path):
        text = (
            b"ply\nformat ascii 1.0\nelement vertex 1\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property float intensity\nend_header\n1 2 3 99\n"
        )
        p = str(tmp_path / "u.ply")
        open(p, "wb").write(text)
        pc = read_ply_native(p, 1.0)
        np.testing.assert_array_equal(pc.positions, [[1, 2, 3]])
        assert pc.colors is None


class TestNativeAttributes:
    """All five attribute sets stay on the native fast path."""

    def test_frameindex_extracted_natively(self, tmp_path):
        text = (
            b"ply\nformat ascii 1.0\nelement vertex 2\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property uint8 frameindex\nend_header\n"
            b"1 2 3 7\n4 5 6 9\n"
        )
        p = str(tmp_path / "fi.ply")
        open(p, "wb").write(text)
        pc = read_ply_native(p, 1.0)
        assert pc is not None
        np.testing.assert_array_equal(pc.frame_idx, [7, 9])
        assert pc.frame_idx.dtype == np.uint8

    def test_laserangle_extracted_natively(self, tmp_path):
        # float-typed laserangle rounds to int32 like the numpy parser
        text = (
            b"ply\nformat ascii 1.0\nelement vertex 2\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property float laserangle\nend_header\n"
            b"1 2 3 -4.5\n4 5 6 2.4\n"
        )
        p = str(tmp_path / "la.ply")
        open(p, "wb").write(text)
        pc = read_ply_native(p, 1.0)
        assert pc is not None
        np.testing.assert_array_equal(pc.laser_angles, [-4, 2])
        assert pc.laser_angles.dtype == np.int32

    def test_five_attr_write_bytes_identical_and_read_matches_numpy(
        self, tmp_path, rng
    ):
        n = 500
        cloud = HostPointCloud(
            positions=rng.integers(-50_000, 50_000, (n, 3)).astype(np.int32),
            colors=rng.integers(0, 256, (n, 3)).astype(np.uint16),
            reflectances=rng.integers(0, 65_536, n).astype(np.uint16),
            frame_idx=rng.integers(0, 256, n).astype(np.uint8),
            laser_angles=rng.integers(-9_000, 9_000, n).astype(np.int32),
        )
        p = str(tmp_path / "five.ply")
        assert write_ply_native(cloud, p)
        # native writer reproduces the numpy writer byte-for-byte,
        # including the reference's frameindex header(uint8)/body(uint16)
        # mismatch (tmc3/ply.cpp:134-136 vs :178-181)
        assert open(p, "rb").read() == write_ply_bytes(cloud)
        # reading such a file back follows declared header types (the
        # reference reader's semantics) — native and numpy parsers must
        # agree exactly, quirk and all
        nat = read_ply_native(p, 1.0)
        ref = read_ply_bytes(open(p, "rb").read())
        for attr in (
            "positions", "colors", "reflectances", "frame_idx",
            "laser_angles",
        ):
            a, b = getattr(nat, attr), getattr(ref, attr)
            np.testing.assert_array_equal(a, b, err_msg=attr)
            assert a.dtype == b.dtype

    def test_four_attr_binary_roundtrip_exact(self, tmp_path, rng):
        # without frameindex the wire format is self-consistent: a full
        # native write→read cycle is lossless for the other four
        n = 500
        cloud = HostPointCloud(
            positions=rng.integers(-50_000, 50_000, (n, 3)).astype(np.int32),
            colors=rng.integers(0, 256, (n, 3)).astype(np.uint16),
            reflectances=rng.integers(0, 65_536, n).astype(np.uint16),
            laser_angles=rng.integers(-9_000, 9_000, n).astype(np.int32),
        )
        p = str(tmp_path / "four.ply")
        assert write_ply_native(cloud, p)
        rt = read_ply_native(p, 1.0)
        np.testing.assert_array_equal(rt.positions, cloud.positions)
        np.testing.assert_array_equal(rt.colors, cloud.colors & 0xFF)
        np.testing.assert_array_equal(rt.reflectances, cloud.reflectances)
        np.testing.assert_array_equal(rt.laser_angles, cloud.laser_angles)


class TestNativeFallbackDiscipline:
    """The fast path must *defer*, never silently drop or misalign."""

    def test_ascii_short_line_fails_not_misaligns(self, tmp_path):
        # a record with fewer values than declared properties must be a
        # parse error (like the numpy path / the reference), never a
        # silent column shift
        text = (
            b"ply\nformat ascii 1.0\nelement vertex 3\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"end_header\n1 2 3\n4 5\n7 8 9\n"
        )
        p = str(tmp_path / "short.ply")
        open(p, "wb").write(text)
        assert read_ply_native(p, 1.0) is None

    def test_ascii_extra_tokens_ignored(self, tmp_path):
        text = (
            b"ply\nformat ascii 1.0\nelement vertex 2\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"end_header\n1 2 3 999\n4 5 6\n"
        )
        p = str(tmp_path / "extra.ply")
        open(p, "wb").write(text)
        pc = read_ply_native(p, 1.0)
        np.testing.assert_array_equal(pc.positions, [[1, 2, 3], [4, 5, 6]])

    def test_strict_mode_reraises(self, tmp_path, monkeypatch):
        # BST_NATIVE_STRICT=1 turns a native-codec crash into an error
        import buildingsegment_tpu.io.ply as plymod

        def boom(path, scale):
            raise RuntimeError("synthetic native crash")

        import buildingsegment_tpu.native.binding as binding

        monkeypatch.setattr(binding, "read_ply_native", boom)
        monkeypatch.setenv("BST_NATIVE_STRICT", "1")
        text = (
            b"ply\nformat ascii 1.0\nelement vertex 1\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"end_header\n1 2 3\n"
        )
        p = str(tmp_path / "s.ply")
        open(p, "wb").write(text)
        with pytest.raises(RuntimeError, match="native PLY codec failed"):
            plymod.read_ply(p, position_scale=1.0)

    def test_crash_falls_back_with_warning(self, tmp_path, monkeypatch):
        import buildingsegment_tpu.io.ply as plymod
        import buildingsegment_tpu.native.binding as binding

        def boom(path, scale):
            raise RuntimeError("synthetic native crash")

        monkeypatch.setattr(binding, "read_ply_native", boom)
        monkeypatch.delenv("BST_NATIVE_STRICT", raising=False)
        monkeypatch.setattr(plymod, "_warned_native", False)
        text = (
            b"ply\nformat ascii 1.0\nelement vertex 1\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"end_header\n1 2 3\n"
        )
        p = str(tmp_path / "w.ply")
        open(p, "wb").write(text)
        with pytest.warns(RuntimeWarning, match="numpy fallback"):
            pc = plymod.read_ply(p, position_scale=1.0)
        np.testing.assert_array_equal(pc.positions, [[1, 2, 3]])
