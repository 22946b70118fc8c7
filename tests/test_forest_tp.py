"""Forest tensor parallelism: leaf-sharded GEMM == single-device GEMM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_image_segmentation_tpu.models.forest import (_gemm_chunk, _gemm_for,
                                                     fit_random_forest,
                                                     forest_from_sklearn,
                                                     gemm_forest_proba,
                                                     gemm_forest_predict)
from rs_image_segmentation_tpu.parallel.forest_tp import (pad_gemm_leaves,
                                                          shard_gemm_forest,
                                                          tp_forest_predict,
                                                          tp_forest_proba)
from rs_image_segmentation_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def forest_and_data():
    rng = np.random.default_rng(7)
    x = rng.random((6000, 19)).astype(np.float32)
    y = rng.integers(1, 4, 6000)
    forest, depth = fit_random_forest(x[:500], y[:500], n_estimators=30,
                                      seed=3)
    gf = _gemm_for(forest, 19)
    return gf, x


def test_pad_leaves_never_fire(forest_and_data):
    gf, x = forest_and_data
    padded = pad_gemm_leaves(gf, 8)
    assert padded.path.shape[1] % 8 == 0
    ref = np.asarray(gemm_forest_proba(gf, jnp.asarray(x[:256]), 256))
    got = np.asarray(gemm_forest_proba(padded, jnp.asarray(x[:256]), 256))
    assert np.array_equal(ref, got)


def test_tp_predict_bitmatch_pure_tp(forest_and_data):
    gf, x = forest_and_data
    mesh = make_mesh((8,), axis_names=("model",))
    ref = np.asarray(gemm_forest_predict(gf, jnp.asarray(x),
                                         _gemm_chunk(gf.path.shape[1])))
    got = np.asarray(tp_forest_predict(gf, jnp.asarray(x), mesh))
    assert np.array_equal(ref, got)


def test_tp_proba_bitmatch(forest_and_data):
    """max_depth=None forests have one-hot leaf rows, so per-shard partial
    sums are small f32 integers and the psum is bit-exact."""
    gf, x = forest_and_data
    mesh = make_mesh((8,), axis_names=("model",))
    ref = np.asarray(gemm_forest_proba(gf, jnp.asarray(x),
                                       _gemm_chunk(gf.path.shape[1])))
    got = np.asarray(tp_forest_proba(gf, jnp.asarray(x), mesh))
    assert np.array_equal(ref, got)


def test_tp_dp_composed_2d_mesh(forest_and_data):
    """(data=2, model=4): pixels AND leaves sharded simultaneously."""
    gf, x = forest_and_data
    mesh = make_mesh((2, 4), axis_names=("data", "model"))
    ref = np.asarray(gemm_forest_predict(gf, jnp.asarray(x),
                                         _gemm_chunk(gf.path.shape[1])))
    got = np.asarray(tp_forest_predict(gf, jnp.asarray(x), mesh,
                                       data_axis="data"))
    assert np.array_equal(ref, got)


def test_tp_bundled_sklearn_model(forest_and_data):
    """Exact sklearn predict parity, forest sharded 8 ways (the bundled
    19-feature 100-tree model)."""
    import os
    path = "/root/reference/output/rf_samples_model.pkl"
    if not os.path.exists(path):
        pytest.skip("bundled model not available")
    import joblib
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        skl = joblib.load(path)
    forest, depth = forest_from_sklearn(skl)
    gf = _gemm_for(forest, 19)
    rng = np.random.default_rng(0)
    x = rng.random((4096, 19)).astype(np.float32)
    mesh = make_mesh((8,), axis_names=("model",))
    got = np.asarray(tp_forest_predict(gf, jnp.asarray(x), mesh))
    ref = skl.predict(x)
    assert np.array_equal(got, ref.astype(got.dtype))


def test_shard_gemm_forest_placement(forest_and_data):
    gf, x = forest_and_data
    mesh = make_mesh((8,), axis_names=("model",))
    sharded = shard_gemm_forest(gf, mesh)
    # leaf-axis tensors are physically distributed
    assert len(sharded.path.sharding.device_set) == 8
    got = np.asarray(tp_forest_predict(sharded, jnp.asarray(x[:1024]), mesh))
    ref = np.asarray(gemm_forest_predict(gf, jnp.asarray(x[:1024]), 1024))
    assert np.array_equal(ref, got)
