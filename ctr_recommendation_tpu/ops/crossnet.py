"""CrossNet v2 (DCNv2): explicit bit-wise feature crossing.

    x_{l+1} = x_0 ⊙ (W_l x_l + b_l) + x_l

over the flattened field stack x_0 (B, F*E). Each layer is one MXU matmul
plus VPU elementwise work — the TPU-natural formulation (no per-pair loops).

Not in the reference (which is FiBiNET-only); included as zoo breadth beyond
BASELINE.json's five configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.ops.initializers import linear_apply, linear_init


def init(key: jax.Array, dim: int, num_layers: int = 3) -> dict:
    keys = jax.random.split(key, num_layers)
    return {"layers": [linear_init(k, dim, dim) for k in keys]}


def apply(params: dict, x0: jax.Array) -> jax.Array:
    """x0 (B, D) -> crossed features (B, D)."""
    x = x0
    for layer in params["layers"]:
        x = x0 * linear_apply(layer, x) + x
    return x
