"""Serving layer: persistent inference engine + HTTP front-end.

The reference is batch scripts only (scripts/1..4); deployment at scale
needs a long-lived process that keeps compiled programs warm and batches
concurrent requests into full device programs. ``engine.InferenceEngine``
is that process core; ``server``/``client`` expose it over HTTP with
zero third-party dependencies.
"""

from rs_image_segmentation_tpu.serving.engine import (EngineConfig,
                                                      InferenceEngine)

__all__ = ["EngineConfig", "InferenceEngine"]
