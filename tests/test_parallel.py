"""Multi-device sharding tests on the 8-virtual-CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_image_segmentation_tpu.models.kmeans import kmeans_fit_predict
from rs_image_segmentation_tpu.ops.stencil import box_filter
from rs_image_segmentation_tpu.parallel.mesh import make_mesh
from rs_image_segmentation_tpu.parallel.sharded import (
    halo_map, sharded_forest_predict, sharded_kmeans_fit_predict)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axis_names=("data",))


@pytest.fixture(scope="module")
def tile_mesh():
    return make_mesh(axis_names=("tile",))


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_halo_map_equals_monolithic_box_filter(tile_mesh, rng):
    x = jnp.asarray(rng.standard_normal((3, 64, 40)).astype(np.float32))
    ref = box_filter(x, 7)  # reflect101 border
    tiled = halo_map(lambda p: box_filter(p, 7), x, halo=3, mesh=tile_mesh)
    assert np.abs(np.asarray(ref) - np.asarray(tiled)).max() < 1e-5


def test_halo_map_small_halo_differs_only_at_seams(tile_mesh, rng):
    # sanity: with a sufficient halo, a 3x3 stencil also matches exactly
    x = jnp.asarray(rng.standard_normal((1, 64, 32)).astype(np.float32))
    ref = box_filter(x, 3)
    tiled = halo_map(lambda p: box_filter(p, 3), x, halo=1, mesh=tile_mesh)
    assert np.abs(np.asarray(ref) - np.asarray(tiled)).max() < 1e-5


def test_sharded_kmeans_matches_single_device(mesh, rng):
    centers = rng.standard_normal((4, 6)) * 6
    x = np.concatenate([centers[i] + rng.standard_normal((200, 6))
                        for i in range(4)]).astype(np.float32)
    perm = rng.permutation(len(x))
    x = x[perm]
    labels_1, state_1 = kmeans_fit_predict(jnp.asarray(x), 4, seed=3)
    labels_8, cents_8 = sharded_kmeans_fit_predict(jnp.asarray(x), 4, mesh,
                                                   seed=3)
    # same data, same seed; gumbel picks differ between global/local argmax
    # layouts only through fp ordering -> compare clustering quality
    c1 = np.asarray(state_1.centroids)
    c8 = np.asarray(cents_8)

    def inertia(c):
        d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
        return d.min(1).sum()

    assert inertia(c8) <= inertia(c1) * 1.05
    # labels must be a valid partition of all points
    l8 = np.asarray(labels_8)
    assert l8.shape == (len(x),)
    assert set(np.unique(l8)) <= set(range(4))


def test_sharded_forest_matches_single_device(mesh, rng):
    from rs_image_segmentation_tpu.models.forest import (fit_random_forest,
                                                         forest_predict)
    x = rng.standard_normal((600, 8)).astype(np.float32)
    y = (x[:, 0] + x[:, 3] > 0).astype(np.int64) + 1
    forest, depth = fit_random_forest(x, y, n_estimators=15, seed=0)
    xq = rng.standard_normal((1000, 8)).astype(np.float32)
    ref = np.asarray(forest_predict(forest, jnp.asarray(xq), depth, chunk=256))
    got = np.asarray(sharded_forest_predict(forest, jnp.asarray(xq), depth,
                                            mesh, chunk=128))
    assert np.array_equal(ref, got)


def test_sharded_feature_stack_small(mesh, rng):
    from rs_image_segmentation_tpu.core.config import (FeatureStageConfig,
                                                       GLCMConfig)
    from rs_image_segmentation_tpu.parallel.sharded import (
        sharded_hierarchical_stack)
    from rs_image_segmentation_tpu.pipeline.features import hierarchical_stack

    cfg = FeatureStageConfig(glcm=GLCMConfig(window_size=16, step_size=16,
                                             levels=8))
    scenes = jnp.asarray(rng.random((8, 7, 48, 48)).astype(np.float32))
    out = sharded_hierarchical_stack(scenes, mesh, cfg)
    assert out.shape == (8, 48, 48, 19)
    ref = hierarchical_stack(scenes[3], cfg)
    assert np.abs(np.asarray(ref) - np.asarray(out[3])).max() < 1e-4


def test_fused_stack_equals_composed(rng):
    from rs_image_segmentation_tpu.core.config import (FeatureStageConfig,
                                                       GLCMConfig)
    from rs_image_segmentation_tpu.pipeline.features import (
        hierarchical_stack, hierarchical_stack_fused)
    cfg = FeatureStageConfig(glcm=GLCMConfig(window_size=16, step_size=16,
                                             levels=8))
    b = jnp.asarray(rng.integers(0, 255, (7, 48, 48)).astype(np.float32))
    a = np.asarray(hierarchical_stack(b, cfg))
    c = np.asarray(hierarchical_stack_fused(b, cfg))
    assert np.abs(a - c).max() < 1e-6


def test_extract_features_five_bands(rng):
    """The reference accepts 5-band stacks (thermal/SWIR2 optional,
    2_feature_extraction.py:54-56)."""
    from rs_image_segmentation_tpu.core.config import (FeatureStageConfig,
                                                       GLCMConfig)
    from rs_image_segmentation_tpu.pipeline.features import extract_features
    cfg = FeatureStageConfig(glcm=GLCMConfig(window_size=16, step_size=16,
                                             levels=8))
    b = jnp.asarray(rng.integers(0, 255, (5, 48, 48)).astype(np.float32))
    feats, hier = extract_features(b, cfg)
    assert hier["all"].shape == (48, 48, 19)
    assert feats["pca_result"].shape[0] == 5


def test_extract_features_with_gabor(rng):
    from rs_image_segmentation_tpu.core.config import (FeatureStageConfig,
                                                       GLCMConfig)
    from rs_image_segmentation_tpu.pipeline.features import extract_features
    cfg = FeatureStageConfig(glcm=GLCMConfig(window_size=16, step_size=16,
                                             levels=8), include_gabor=True)
    b = jnp.asarray(rng.integers(0, 255, (7, 48, 48)).astype(np.float32))
    feats, hier = extract_features(b, cfg)
    assert len(feats["gabor_features"]) == 24
    assert hier["all"].shape == (48, 48, 19)


def test_preprocess_bands_warp_path(rng):
    """Non-identity GCP matrix exercises the f32 warp fallback."""
    from rs_image_segmentation_tpu.core.config import CalibrationConfig
    from rs_image_segmentation_tpu.pipeline.preprocess import preprocess_bands
    cal = CalibrationConfig()
    arr = rng.integers(0, 256, (7, 40, 40)).astype(np.uint8)
    out = np.asarray(preprocess_bands(arr, np.asarray(cal.gains),
                                      np.asarray(cal.biases),
                                      matrix=(1.0, 0.0, 2.0, 0.0, 1.0, -3.0)))
    assert out.shape == (7, 40, 40)
    assert out.dtype == np.uint8
    # a pure translation shifts content: compare interior
    ident = np.asarray(preprocess_bands(arr, np.asarray(cal.gains),
                                        np.asarray(cal.biases)))
    # warped output row r maps from source row r+3 approx (translation -3 in y)
    assert not np.array_equal(out, ident)


def test_composed_2d_mesh_scenes_by_tiles(rng):
    """2-D (data x tile) mesh: scenes sharded over 'data', rows over 'tile'
    — composed DP + spatial parallelism in one program."""
    import functools
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rs_image_segmentation_tpu.ops.stencil import box_filter
    from rs_image_segmentation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((2, 4), axis_names=("data", "tile"))
    scenes = jnp.asarray(rng.standard_normal((2, 3, 32, 16)).astype(np.float32))
    n = 4
    halo = 2

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("data", None, "tile", None),),
                       out_specs=P("data", None, "tile", None))
    def run(shard):  # (1, 3, 8, 16) per device
        idx = jax.lax.axis_index("tile")
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        top = jax.lax.ppermute(shard[..., -halo:, :], "tile", fwd)
        bot = jax.lax.ppermute(shard[..., :halo, :], "tile", bwd)
        top = jnp.where(idx == 0, shard[..., 1:halo + 1, :][..., ::-1, :], top)
        bot = jnp.where(idx == n - 1,
                        shard[..., -halo - 1:-1, :][..., ::-1, :], bot)
        padded = jnp.concatenate([top, shard, bot], axis=-2)
        return box_filter(padded, 5)[..., halo:-halo, :]

    dev = jax.device_put(scenes, NamedSharding(mesh, P("data", None, "tile",
                                                       None)))
    out = np.asarray(run(dev))
    ref = np.asarray(box_filter(scenes, 5))
    assert np.abs(out - ref).max() < 1e-5


def test_sharded_method_batch_rule_and_kmeans(mesh, rng):
    """shard_map'd batch-coupled programs (round 4): per-scene results
    bit-identical to the single-device batch run for both methods."""
    from rs_image_segmentation_tpu.core.config import (CalibrationConfig,
                                                       FeatureStageConfig,
                                                       GLCMConfig)
    from rs_image_segmentation_tpu.parallel.sharded import (
        sharded_method_batch)
    from rs_image_segmentation_tpu.pipeline.preprocess import (
        build_stretch_lut)
    from rs_image_segmentation_tpu.pipeline.turbo import (
        kmeans_scenes_turbo_batch, rule_based_scenes_turbo_batch)
    cal = CalibrationConfig()
    cfg = FeatureStageConfig(glcm=GLCMConfig(window_size=8, step_size=8,
                                             levels=8))
    n = 8
    scenes = rng.integers(0, 256, (n, 7, 24, 32)).astype(np.uint8)
    luts = np.stack([build_stretch_lut(s, np.asarray(cal.gains),
                                       np.asarray(cal.biases))
                     for s in scenes]).astype(np.uint8)
    sd, ld = jnp.asarray(scenes), jnp.asarray(luts)

    got = np.asarray(sharded_method_batch(sd, ld, mesh, "rule_based", cfg))
    ref = np.asarray(rule_based_scenes_turbo_batch(sd, ld, cfg))
    assert np.array_equal(got, ref)

    got = np.asarray(sharded_method_batch(sd, ld, mesh, "kmeans", cfg,
                                          n_clusters=3, fit_stride=2))
    ref = np.asarray(kmeans_scenes_turbo_batch(sd, ld, n_clusters=3,
                                               cfg=cfg, fit_stride=2))
    assert np.array_equal(got, ref)
