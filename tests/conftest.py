"""Test harness: force an 8-virtual-device CPU platform before any backend
init so multi-chip sharding paths (mesh DP, halo exchange) are testable
without TPU hardware. The environment pins JAX_PLATFORMS=axon via
sitecustomize, so the env var alone is not enough — use jax.config."""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data/raw/AA.tif"
REFERENCE_ROI = "/root/reference/output/ROI/roi_mask.npy"
REFERENCE_SAMPLES = "/root/reference/data/samples.pkl"
REFERENCE_RF_MODEL = "/root/reference/output/rf_samples_model.pkl"
REFERENCE_CLASS_MAP = "/root/reference/output/class_map.npy"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def aa_scene():
    """The bundled 600x600x7 uint8 TM scene, if present."""
    if not os.path.exists(REFERENCE_DATA):
        pytest.skip("bundled AA.tif not available")
    from rs_image_segmentation_tpu.io.tiff import read_tiff
    arr, info = read_tiff(REFERENCE_DATA)
    return arr, info
