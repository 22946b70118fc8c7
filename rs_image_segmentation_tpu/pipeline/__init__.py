from rs_image_segmentation_tpu.pipeline.preprocess import (
    preprocess_bands, run_preprocessing_stage)
from rs_image_segmentation_tpu.pipeline.features import (
    extract_features, hierarchical_stack, run_feature_extraction_stage)
from rs_image_segmentation_tpu.pipeline.classify import run_classification_stage
from rs_image_segmentation_tpu.pipeline.evaluate import ClassificationEvaluator
