from buildingsegment_tpu.dist.mesh import make_mesh, point_sharding, replicated
from buildingsegment_tpu.dist.sharded import sharded_pipeline

__all__ = ["make_mesh", "point_sharding", "replicated", "sharded_pipeline"]
