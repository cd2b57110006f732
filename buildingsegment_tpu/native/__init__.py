"""Native (C++) host-side components, bound via ctypes.

The reference's host-side hot paths are native C++ (the PLY stream
codec, tmc3/ply.cpp); this package provides the rebuild's equivalents
as a small shared library with a pure-numpy fallback when the library
has not been built (``make -C buildingsegment_tpu/native``).
"""

from buildingsegment_tpu.native.binding import (
    native_available,
    read_ply_native,
    write_ply_native,
)

__all__ = ["native_available", "read_ply_native", "write_ply_native"]
