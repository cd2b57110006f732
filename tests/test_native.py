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
