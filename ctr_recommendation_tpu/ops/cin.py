"""Compressed Interaction Network (xDeepFM).

Layer k forms all outer interactions between the previous feature maps
X^{k-1} (B, H_{k-1}, E) and the base fields X^0 (B, F, E) along the
embedding axis, then compresses with a learned (H_k, H_{k-1}, F) filter:

    X^k[b, h, e] = sum_{i, j} W^k[h, i, j] * X^{k-1}[b, i, e] * X^0[b, j, e]

The whole layer is one einsum — XLA lowers it to a batched MXU contraction
per embedding lane; no Python loops, no conv1d reshuffling (the torch
formulation uses Conv1d over an unfolded (H*F, E) tensor; on TPU the direct
contraction is the natural form). Output is the E-sum of every layer's maps,
concatenated: (B, sum_k H_k), fed to a final logit Linear.

Reference has no CIN; scope comes from BASELINE.json configs[2] (xDeepFM).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def init(key: jax.Array, num_fields: int, layer_units: Sequence[int]) -> dict:
    params: dict = {"filters": []}
    h_prev = num_fields
    keys = jax.random.split(key, len(layer_units) + 1)
    for k, h in enumerate(layer_units):
        # Glorot-uniform over the (h_prev * num_fields) fan-in.
        fan_in = h_prev * num_fields
        bound = (6.0 / (fan_in + h)) ** 0.5
        params["filters"].append(
            jax.random.uniform(
                keys[k], (h, h_prev, num_fields), minval=-bound, maxval=bound
            )
        )
        h_prev = h
    from ctr_recommendation_tpu.ops.initializers import linear_init

    params["out"] = linear_init(keys[-1], sum(layer_units), 1)
    # zero-init the auxiliary logit head: the model starts as pure DNN and
    # grows the CIN contribution (avoids the epoch-1 loss spike a hot
    # second head causes; weight grads are nonzero so it trains normally)
    params["out"]["w"] = params["out"]["w"] * 0.0
    params["out"]["b"] = params["out"]["b"] * 0.0
    return params


def apply(params: dict, x0: jax.Array) -> jax.Array:
    """x0: (B, F, E) -> CIN logit contribution (B, 1).

    The LAST layer's feature maps are only ever E-sum-pooled, so its giant
    (B, H, E) output -- and the (B, H_prev, F, E) HBM intermediate XLA
    materializes to build it, ~403 MB/pass at MicroLens shapes, the xdeepfm
    train step's dominant cost -- never needs to exist. Reassociate:

        pooled[b,h] = sum_e sum_{i,f} W[h,i,f] X[b,i,e] X0[b,f,e]
                    = sum_{i,f} W[h,i,f] * P[b,i,f],
        P[b,i,f]    = sum_e X[b,i,e] X0[b,f,e]       (a tiny (B, H_prev, F))

    Measured on the chip at full MicroLens shapes: last-layer fwd+bwd
    1.64 ms vs 3.95 ms direct (2.4x); forward alone ties. A fused Pallas
    CIN kernel was built, parity-tested, and measured SLOWER than XLA both
    ways (lane-broadcast + N=64 matmuls underutilize the MXU; see
    docs/PERFORMANCE.md) -- deleted; the algebra above is the keeper.
    Non-last layers keep the direct contraction (their outputs feed the
    next layer, and their H_prev=F intermediates are ~5x smaller).
    """
    from ctr_recommendation_tpu.ops.initializers import linear_apply

    x_prev = x0
    pooled = []
    filters = params["filters"]
    for k, w in enumerate(filters):
        if k == len(filters) - 1:
            p = jnp.einsum(
                "bie,bfe->bif", x_prev, x0, preferred_element_type=jnp.float32
            )
            pooled.append(
                jnp.einsum(
                    "bif,hif->bh", p, w, preferred_element_type=jnp.float32
                ).astype(x0.dtype)
            )
        else:
            # (B, H_prev, E) x (B, F, E) -> (B, H, E) through W (H, H_prev, F)
            x_prev = jnp.einsum(
                "bie,bje,hij->bhe", x_prev, x0, w.astype(x0.dtype),
                preferred_element_type=x0.dtype,
            )
            pooled.append(jnp.sum(x_prev, axis=-1))  # (B, H)
    feats = jnp.concatenate(pooled, axis=-1)
    return linear_apply(params["out"], feats)
