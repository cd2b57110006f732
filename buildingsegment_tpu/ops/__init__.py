from buildingsegment_tpu.ops.knn import knn, knn_window
from buildingsegment_tpu.ops.normals import estimate_normals, eigh3x3_smallest
from buildingsegment_tpu.ops.scatter import bilinear_splat

__all__ = ["knn", "knn_window", "estimate_normals", "eigh3x3_smallest", "bilinear_splat"]
