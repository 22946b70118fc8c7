"""Multi-scale windowed statistics (reference indices.py:519-562).

Per scale s: box-mean, variance E[x^2]-E[x]^2 (clamped >= 0), std, and for
s <= entropy_max_scale the disk-entropy feature. All stencils share the
separable box conv; the entropy rides the chunked one-hot conv in
ops.texture.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from rs_image_segmentation_tpu.ops.stencil import box_filter
from rs_image_segmentation_tpu.ops.texture import entropy_feature


def multi_scale_features(band01: jnp.ndarray,
                         scales: Sequence[int] = (1, 3, 5, 7),
                         entropy_max_scale: int = 5,
                         include_entropy: bool = True
                         ) -> Dict[str, jnp.ndarray]:
    out: Dict[str, jnp.ndarray] = {}
    for s in scales:
        mean = box_filter(band01, s)
        mean_sq = box_filter(band01 * band01, s)
        variance = jnp.maximum(mean_sq - mean * mean, 0.0)
        out[f"mean_scale_{s}"] = mean
        out[f"variance_scale_{s}"] = variance
        out[f"std_dev_scale_{s}"] = jnp.sqrt(variance)
        if include_entropy and s <= entropy_max_scale:
            out[f"entropy_scale_{s}"] = entropy_feature(band01, s)
    return out
