from rs_image_segmentation_tpu.io.tiff import read_tiff, write_tiff, TiffInfo
from rs_image_segmentation_tpu.io import artifacts

__all__ = ["read_tiff", "write_tiff", "TiffInfo", "artifacts"]
