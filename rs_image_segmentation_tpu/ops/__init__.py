"""Jit-able kernel library.

Every op here is a pure function over static-shape arrays, safe under
``jax.jit`` / ``shard_map``, with NumPy/sklearn-oracle unit tests in
``tests/``. Hot paths are written so XLA lowers them onto the MXU (batched
matmuls for co-occurrence/KMeans/forest) or fuses them on the VPU
(elementwise index math, stencils via ``conv_general_dilated`` /
``reduce_window``); ``pallas_kernels`` holds the explicitly-fused variants.
"""

from rs_image_segmentation_tpu.ops.normalize import (
    robust_normalize, percentile, minmax_stretch_u8, minmax01,
    quantize_levels)
from rs_image_segmentation_tpu.ops.indices import (
    ndvi, evi, msavi, ndwi, mndwi, ndbi, bsi, spectral_indices)
from rs_image_segmentation_tpu.ops.stats import (
    confusion_matrix, overall_accuracy, cohen_kappa, per_class_metrics,
    evaluate_predictions, map_clusters_to_classes)
from rs_image_segmentation_tpu.ops.stencil import (
    box_filter, gaussian_blur, gaussian_blur_u8, laplacian, sobel_xy,
    sobel_magnitude, gabor_kernel, gabor_responses, conv2d_same)
from rs_image_segmentation_tpu.ops.morphology import (
    erode, dilate, opening, closing, gradient, ellipse_element)
from rs_image_segmentation_tpu.ops.threshold import (
    otsu_threshold_u8, threshold_binary, threshold_otsu, median,
    histogram256)
from rs_image_segmentation_tpu.ops.components import (
    connected_components, connected_components_best,
    remove_small_components, fill_holes, post_process_mask)
from rs_image_segmentation_tpu.ops.texture import (
    glcm_matrices, glcm_properties, glcm_feature_maps, lbp_uniform,
    lbp_feature, windowed_entropy_u8, entropy_feature)
from rs_image_segmentation_tpu.ops.multiscale import multi_scale_features
from rs_image_segmentation_tpu.ops.resize import (
    resize_bilinear, resize_nearest, warp_affine_bilinear)
from rs_image_segmentation_tpu.ops.features_aux import (
    feature_selection_by_variance, feature_fusion_for_segmentation,
    prepare_features_for_segmentation, hierarchical_feature_fusion,
    semantic_merge_water_classes, evaluate_feature_importance_for_classes)
