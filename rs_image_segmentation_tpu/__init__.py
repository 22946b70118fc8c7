"""TPU-native remote-sensing land-cover segmentation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the reference
four-stage Landsat TM pipeline (preprocess -> feature extraction -> classify ->
evaluate), designed TPU-first: band-stacked ``(C, H, W)`` device arrays, fused
jitted stage graphs, MXU-friendly co-occurrence / KMeans / forest kernels, and
mesh-sharded multi-scene + halo-exchange spatial parallelism.

Layering (bottom-up):
  core     - array conventions, configs, tile/halo grids
  io       - GeoTIFF / npy / pkl codecs (host side), artifact contract
  ops      - jit-able kernel library (indices, stencils, texture, CC, stats)
  models   - PCA / KMeans / random-forest (tensorized, on-device predict)
  parallel - mesh construction, sharded pipelines, halo exchange
  pipeline - the four stage graphs
  cli      - stage entry points compatible with the reference scripts/1..4
  tools    - sampling, ROI rasterization, alias patching
"""

__version__ = "0.1.0"

from rs_image_segmentation_tpu.core.types import Raster, GeoMeta  # noqa: F401
