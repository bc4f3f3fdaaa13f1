"""SENet field-wise excitation (FiBiNET).

Behavioral parity with the reference ``SENetLayer`` (model_fibinet.py:5-35):
squeeze = mean over the embedding axis, excitation = Linear(F->max(1,F//r)) +
ReLU + Linear(->F) + Sigmoid (bias kept, unlike the FiBiNET paper — the
reference keeps torch defaults), reweight = per-field scalar scale.

TPU note: F is tiny (6 for MicroLens), so this op is VPU-bound elementwise
work around two skinny matmuls; standalone it is memory-bound on reading
X (B,F,E). The fused Pallas kernel (ops/pallas/interaction.py) merges it with
the bilinear interaction so X is read from HBM once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.ops.initializers import linear_apply, linear_init


def init(
    key: jax.Array, num_fields: int, reduction: int = 2, use_bias: bool = True
) -> dict:
    reduced = max(1, num_fields // reduction)
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, num_fields, reduced, use_bias=use_bias),
        "fc2": linear_init(k2, reduced, num_fields, use_bias=use_bias),
    }


def apply(params: dict, x: jax.Array) -> jax.Array:
    """x: (B, F, E) -> reweighted (B, F, E)."""
    z = jnp.mean(x, axis=-1)  # squeeze: (B, F)
    a = jax.nn.relu(linear_apply(params["fc1"], z))
    w = jax.nn.sigmoid(linear_apply(params["fc2"], a))  # (B, F)
    return x * w[..., None]


def field_weights(params: dict, x: jax.Array) -> jax.Array:
    """The learned per-field scales alone — used by the fused kernel path."""
    z = jnp.mean(x, axis=-1)
    a = jax.nn.relu(linear_apply(params["fc1"], z))
    return jax.nn.sigmoid(linear_apply(params["fc2"], a))
