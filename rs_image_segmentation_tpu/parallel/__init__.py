from rs_image_segmentation_tpu.parallel.mesh import (
    make_mesh, data_sharding, replicated)
from rs_image_segmentation_tpu.parallel.sharded import (
    sharded_hierarchical_stack, sharded_kmeans_fit_predict,
    sharded_forest_predict, halo_map)
