from buildingsegment_tpu.core.pointset import PointBatch
from buildingsegment_tpu.core.morton import morton_encode, morton_argsort, morton_sort
from buildingsegment_tpu.core.quantize import (
    compute_bbox,
    dedup_quantized,
    shift_to_origin,
    quantize_positions,
)

__all__ = [
    "PointBatch",
    "morton_encode",
    "morton_argsort",
    "morton_sort",
    "compute_bbox",
    "dedup_quantized",
    "shift_to_origin",
    "quantize_positions",
]
