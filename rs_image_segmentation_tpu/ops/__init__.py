"""Jit-able kernel library.

Every op here is a pure function over static-shape arrays, safe under
``jax.jit`` / ``shard_map``, with NumPy/sklearn-oracle unit tests in
``tests/``. Hot paths are written so XLA lowers them onto the MXU (batched
matmuls for co-occurrence/KMeans/forest) or fuses them on the VPU
(elementwise index math, stencils via ``conv_general_dilated`` /
``reduce_window``).
"""

from rs_image_segmentation_tpu.ops.normalize import (
    robust_normalize, percentile, minmax_stretch_u8, minmax01)
from rs_image_segmentation_tpu.ops.indices import (
    ndvi, evi, msavi, ndwi, mndwi, ndbi, bsi, spectral_indices)
from rs_image_segmentation_tpu.ops.stats import (
    confusion_matrix, overall_accuracy, cohen_kappa, per_class_metrics)
