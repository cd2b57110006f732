from buildingsegment_tpu.seg.region_grow import segment_planes, SegmentationResult
from buildingsegment_tpu.seg.colorize import colorize_planes, msvc_rand_colors
from buildingsegment_tpu.seg.golden import golden_segment

__all__ = [
    "segment_planes",
    "SegmentationResult",
    "colorize_planes",
    "msvc_rand_colors",
    "golden_segment",
]
