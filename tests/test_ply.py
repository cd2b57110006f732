"""PLY codec tests: round trips, channel permutation, truncation.

Semantics under test are the reference's (tmc3/ply.cpp:88-504); see
docstrings in buildingsegment_tpu/io/ply.py.
"""

import numpy as np
import pytest

from buildingsegment_tpu.io.ply import (
    HostPointCloud,
    PlyError,
    read_ply_bytes,
    write_ply_bytes,
)


def _ascii_ply(lines_props, body):
    head = ["ply", "format ascii 1.0", f"element vertex {len(body)}"]
    head += [f"property {t} {n}" for t, n in lines_props]
    head += ["end_header"]
    text = "\n".join(head) + "\n"
    text += "\n".join(" ".join(str(v) for v in row) for row in body) + "\n"
    return text.encode()


class TestRead:
    def test_ascii_basic(self):
        data = _ascii_ply(
            [("float", "x"), ("float", "y"), ("float", "z")],
            [[1.0, 2.0, 3.0], [-1.5, 0.25, 10.0]],
        )
        pc = read_ply_bytes(data, position_scale=1.0)
        np.testing.assert_array_equal(
            pc.positions, [[1, 2, 3], [-1, 0, 10]]
        )  # truncation toward zero: -1.5 → -1

    def test_scale_truncates_toward_zero(self):
        # reference: atof(...)*1000 assigned to int32 truncates (ply.cpp:407)
        data = _ascii_ply(
            [("float", "x"), ("float", "y"), ("float", "z")],
            [[1.2345678, -1.2345678, 0.0009994]],
        )
        pc = read_ply_bytes(data, position_scale=1000.0)
        np.testing.assert_array_equal(pc.positions, [[1234, -1234, 0]])

    def test_color_channel_permutation(self):
        # file (r,g,b)=(10,20,30) → internal (g,b,r)=(20,30,10)
        data = _ascii_ply(
            [
                ("float", "x"),
                ("float", "y"),
                ("float", "z"),
                ("uchar", "red"),
                ("uchar", "green"),
                ("uchar", "blue"),
            ],
            [[0, 0, 0, 10, 20, 30]],
        )
        pc = read_ply_bytes(data)
        np.testing.assert_array_equal(pc.colors, [[20, 30, 10]])

    def test_binary_little_endian(self):
        head = (
            b"ply\nformat binary_little_endian 1.0\n"
            b"element vertex 2\n"
            b"property float64 x\nproperty float64 y\nproperty float64 z\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
            b"end_header\n"
        )
        import struct

        body = b""
        for p, c in [((1.5, 2.5, 3.5), (1, 2, 3)), ((-4.0, 5.0, -6.0), (7, 8, 9))]:
            body += struct.pack("<3d", *p) + bytes(c)
        pc = read_ply_bytes(head + body, position_scale=2.0)
        np.testing.assert_array_equal(pc.positions, [[3, 5, 7], [-8, 10, -12]])
        np.testing.assert_array_equal(pc.colors, [[2, 3, 1], [8, 9, 7]])

    def test_binary_big_endian(self):
        import struct

        head = (
            b"ply\nformat binary_big_endian 1.0\n"
            b"element vertex 1\n"
            b"property float32 x\nproperty float32 y\nproperty float32 z\n"
            b"end_header\n"
        )
        body = struct.pack(">3f", 1.0, 2.0, 3.0)
        pc = read_ply_bytes(head + body)
        np.testing.assert_array_equal(pc.positions, [[1, 2, 3]])

    def test_unknown_property_skipped(self):
        data = _ascii_ply(
            [
                ("float", "x"),
                ("float", "y"),
                ("float", "z"),
                ("float", "intensity"),
            ],
            [[1, 2, 3, 99]],
        )
        pc = read_ply_bytes(data)
        np.testing.assert_array_equal(pc.positions, [[1, 2, 3]])
        assert pc.colors is None

    def test_face_element_properties_ignored(self):
        data = (
            b"ply\nformat ascii 1.0\nelement vertex 1\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"element face 0\nproperty list uint8 int32 vertex_index\n"
            b"end_header\n1 2 3\n"
        )
        pc = read_ply_bytes(data)
        np.testing.assert_array_equal(pc.positions, [[1, 2, 3]])

    def test_missing_magic_raises(self):
        with pytest.raises(PlyError):
            read_ply_bytes(b"nope\n")

    def test_missing_coordinates_raises(self):
        data = _ascii_ply([("float", "x"), ("float", "y")], [[1, 2]])
        with pytest.raises(PlyError):
            read_ply_bytes(data)

    def test_reflectance_and_frameindex(self):
        data = _ascii_ply(
            [
                ("float", "x"),
                ("float", "y"),
                ("float", "z"),
                ("uint16", "refc"),
                ("uint8", "frameindex"),
            ],
            [[0, 0, 0, 777, 3]],
        )
        pc = read_ply_bytes(data)
        assert pc.reflectances[0] == 777
        assert pc.frame_idx[0] == 3


class TestWrite:
    def test_binary_header_layout(self):
        pc = HostPointCloud(
            positions=np.array([[1, 2, 3]], np.int32),
            colors=np.array([[20, 30, 10]], np.uint16),
        )
        out = write_ply_bytes(pc)
        header = out.split(b"end_header\n")[0].decode()
        assert "format binary_little_endian 1.0" in header
        assert "property float64 x" in header
        # color declaration order green/blue/red (ply.cpp:126-130)
        gi = header.index("uchar green")
        bi = header.index("uchar blue")
        ri = header.index("uchar red")
        assert gi < bi < ri
        assert "element face 0" in header
        assert "property list uint8 int32 vertex_index" in header

    def test_ascii_header_uses_float(self):
        pc = HostPointCloud(positions=np.array([[1, 2, 3]], np.int32))
        out = write_ply_bytes(pc, ascii=True).decode()
        assert "property float x" in out
        assert "1.00000 2.00000 3.00000" in out  # precision 5 (ply.cpp:142)

    def test_binary_body_roundtrip(self):
        pos = np.array([[10, 20, 30], [-5, 0, 7]], np.int32)
        col = np.array([[1, 2, 3], [4, 5, 6]], np.uint16)
        pc = HostPointCloud(positions=pos, colors=col)
        out = write_ply_bytes(pc, position_scale=1.0)
        rt = read_ply_bytes(out, position_scale=1.0)
        np.testing.assert_array_equal(rt.positions, pos)
        np.testing.assert_array_equal(rt.colors, col)

    def test_scale_offset_applied(self):
        pc = HostPointCloud(positions=np.array([[1, 2, 3]], np.int32))
        out = write_ply_bytes(pc, position_scale=2.0, position_offset=(10, 0, 0))
        rt = read_ply_bytes(out)
        np.testing.assert_array_equal(rt.positions, [[12, 4, 6]])

    def test_ascii_roundtrip_with_colors(self):
        pos = np.array([[0, 1, 2]], np.int32)
        col = np.array([[9, 8, 7]], np.uint16)
        out = write_ply_bytes(HostPointCloud(pos, col), ascii=True)
        rt = read_ply_bytes(out)
        np.testing.assert_array_equal(rt.positions, pos)
        np.testing.assert_array_equal(rt.colors, col)

    def test_empty_cloud(self):
        pc = HostPointCloud(positions=np.zeros((0, 3), np.int32))
        out = write_ply_bytes(pc)
        rt = read_ply_bytes(out)
        assert rt.count == 0


class TestLaserAngleRoundTrip:
    """laserangle is read AND written (the reference container carries
    it, tmc3/PCCPointSet.h:604-613; its writer drops it — ours doesn't,
    documented extension)."""

    def test_binary_roundtrip(self, rng):
        n = 50
        cloud = HostPointCloud(
            positions=rng.integers(-1000, 1000, size=(n, 3)).astype(np.int32),
            laser_angles=rng.integers(-90, 91, size=(n,)).astype(np.int32),
        )
        data = write_ply_bytes(cloud)
        assert b"property int32 laserangle" in data.split(b"end_header")[0]
        rt = read_ply_bytes(data)
        np.testing.assert_array_equal(rt.positions, cloud.positions)
        np.testing.assert_array_equal(rt.laser_angles, cloud.laser_angles)

    def test_ascii_roundtrip(self, rng):
        n = 20
        cloud = HostPointCloud(
            positions=rng.integers(-100, 100, size=(n, 3)).astype(np.int32),
            laser_angles=rng.integers(-90, 91, size=(n,)).astype(np.int32),
        )
        data = write_ply_bytes(cloud, ascii=True)
        rt = read_ply_bytes(data)
        np.testing.assert_array_equal(rt.laser_angles, cloud.laser_angles)


class TestVertexListProperties:
    """Vertex-element list properties are tolerated and skipped — a
    robustness extension (the reference errors out on them: its header
    parser requires exactly 3 tokens, tmc3/ply.cpp:264-268)."""

    def test_ascii_list_skipped(self):
        text = (
            b"ply\nformat ascii 1.0\nelement vertex 2\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property list uchar int vertex_samples\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
            b"end_header\n"
            b"1 2 3 2 77 88 10 20 30\n"
            b"4 5 6 0 40 50 60\n"
        )
        pc = read_ply_bytes(text)
        np.testing.assert_array_equal(pc.positions, [[1, 2, 3], [4, 5, 6]])
        # colors internal (g, b, r)
        np.testing.assert_array_equal(pc.colors, [[20, 30, 10], [50, 60, 40]])

    def test_binary_list_skipped(self):
        import struct

        head = (
            b"ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property list uchar int32 idx\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
            b"end_header\n"
        )
        row1 = struct.pack("<3f", 1, 2, 3) + struct.pack(
            "<B2i", 2, 7, 8
        ) + bytes([10, 20, 30])
        row2 = struct.pack("<3f", 4, 5, 6) + struct.pack(
            "<B", 0
        ) + bytes([40, 50, 60])
        pc = read_ply_bytes(head + row1 + row2)
        np.testing.assert_array_equal(pc.positions, [[1, 2, 3], [4, 5, 6]])
        np.testing.assert_array_equal(pc.colors, [[20, 30, 10], [50, 60, 40]])
