from buildingsegment_tpu.utils.synthetic import make_building_cloud

__all__ = ["make_building_cloud"]
