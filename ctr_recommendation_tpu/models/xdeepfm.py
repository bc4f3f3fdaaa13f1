"""xDeepFM: CIN compressed interactions alongside the DNN tower.

Scope from BASELINE.json configs[2]. Shares the embedding trunk (same
sharded tables) with FiBiNET; the head is
``logit = DNN(flatten(fields)) + CIN(fields)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops import cin as cin_ops
from ctr_recommendation_tpu.ops import mlp as mlp_ops

SEQ_POOLING = "mean"


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    k_trunk, k_cin, k_mlp = jax.random.split(key, 3)
    f, e = fm.num_fields, cfg.embedding_dim
    params = {
        "trunk": trunk.init(k_trunk, fm, cfg, seq_pooling=SEQ_POOLING),
        "cin": cin_ops.init(k_cin, f, cfg.cin_layer_units),
    }
    params["mlp"], mlp_state = mlp_ops.init(
        k_mlp, f * e, cfg.hidden_units, out_dim=1, batch_norm=cfg.batch_norm
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
    )
    b = x.shape[0]
    rng_mlp = None if rng is None else jax.random.fold_in(rng, 1)
    td = jnp.float32 if cfg.tower_dtype == "float32" else compute_dtype
    dnn_logit, mlp_state = mlp_ops.apply(
        params["mlp"], state["mlp"], x.reshape(b, -1).astype(td),
        train=train, dropout_rate=cfg.net_dropout, rng=rng_mlp, weight=weight,
    )
    cin_logit = cin_ops.apply(params["cin"], x).astype(dnn_logit.dtype)
    return (dnn_logit + cin_logit)[..., 0].astype(jnp.float32), {"mlp": mlp_state}
