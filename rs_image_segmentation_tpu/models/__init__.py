from rs_image_segmentation_tpu.models.pca import pca_fit_transform
from rs_image_segmentation_tpu.models.kmeans import kmeans_fit_predict, KMeansState
from rs_image_segmentation_tpu.models.forest import (
    FlatForest, forest_from_sklearn, forest_predict, fit_random_forest)
