"""PNN (Product-based Neural Network, Qu et al. 2016) — inner-product variant.

Beyond the reference/BASELINE zoo, included for framework completeness.
Tower input is the concatenation of the linear signal z (the flattened
field stack) and the product signal p (all F(F-1)/2 pairwise inner
products of field embeddings), so the MLP sees both raw fields and their
second-order interactions:

    z = X.flat                      (B, F*E)
    p = { <x_i, x_j> : i < j }      (B, P)      one einsum + static gather
    logits = MLP([z ‖ p])

TPU notes: the pair products come from a single (B, F, F) Gram einsum
(MXU) and a static upper-triangle gather — no Python pair loop (the same
vectorization as ops/bilinear.py replacing model_fibinet.py:75-79's loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops import mlp as mlp_ops
from ctr_recommendation_tpu.ops.bilinear import pair_indices

SEQ_POOLING = "mean"


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    k_trunk, k_mlp = jax.random.split(key)
    f, e = fm.num_fields, cfg.embedding_dim
    num_pairs = f * (f - 1) // 2
    params = {"trunk": trunk.init(k_trunk, fm, cfg, seq_pooling=SEQ_POOLING)}
    params["mlp"], mlp_state = mlp_ops.init(
        k_mlp, f * e + num_pairs, cfg.hidden_units, out_dim=1,
        batch_norm=cfg.batch_norm,
    )
    return params, {"mlp": mlp_state}


def apply(
    params: dict,
    state: dict,
    fm: FeatureMap,
    cfg: ModelConfig,
    batch: dict[str, jax.Array],
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    compute_dtype=jnp.float32,
    lookup=None,
    weight: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    x = trunk.apply(
        params["trunk"], fm, cfg, batch,
        seq_pooling=SEQ_POOLING, train=train, rng=rng,
        compute_dtype=compute_dtype, lookup=lookup,
    )  # (B, F, E)
    b, f, _ = x.shape
    td = jnp.float32 if cfg.tower_dtype == "float32" else compute_dtype
    gram = jnp.einsum(
        "bfe,bge->bfg", x.astype(td), x.astype(td),
        preferred_element_type=jnp.float32,
    )  # (B, F, F)
    i_idx, j_idx = pair_indices(f)
    p = gram[:, np.asarray(i_idx), np.asarray(j_idx)]  # (B, P)
    h = jnp.concatenate([x.reshape(b, -1).astype(td), p.astype(td)], axis=-1)

    rng_mlp = None if rng is None else jax.random.fold_in(rng, 1)
    logits, mlp_state = mlp_ops.apply(
        params["mlp"], state["mlp"], h,
        train=train, dropout_rate=cfg.net_dropout, rng=rng_mlp, weight=weight,
    )
    return logits[..., 0].astype(jnp.float32), {"mlp": mlp_state}
