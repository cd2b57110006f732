from buildingsegment_tpu.io.ply import HostPointCloud, read_ply, write_ply
from buildingsegment_tpu.io.png import write_png
from buildingsegment_tpu.io.obj import write_prism_obj

__all__ = ["HostPointCloud", "read_ply", "write_ply", "write_png", "write_prism_obj"]
