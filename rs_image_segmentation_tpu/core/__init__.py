from rs_image_segmentation_tpu.core.types import Raster, GeoMeta
from rs_image_segmentation_tpu.core import config

__all__ = ["Raster", "GeoMeta", "config"]
