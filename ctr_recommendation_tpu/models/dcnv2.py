"""DCNv2: parallel CrossNet + DNN tower over the shared embedding trunk.

Zoo breadth beyond the reference/BASELINE scope. Structure (Wang et al.
WWW'21, parallel variant): flat = flatten(fields); cross = CrossNetV2(flat);
deep = MLP(flat); logit = Linear([cross ‖ deep]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops import crossnet as cross_ops
from ctr_recommendation_tpu.ops import mlp as mlp_ops
from ctr_recommendation_tpu.ops.initializers import linear_apply, linear_init

SEQ_POOLING = "mean"
NUM_CROSS_LAYERS = 3


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    k_trunk, k_cross, k_mlp, k_out = jax.random.split(key, 4)
    f, e = fm.num_fields, cfg.embedding_dim
    in_dim = f * e
    params = {
        "trunk": trunk.init(k_trunk, fm, cfg, seq_pooling=SEQ_POOLING),
        "cross": cross_ops.init(k_cross, in_dim, NUM_CROSS_LAYERS),
    }
    # headless deep tower: the stream output IS the last hidden
    # activation (out_dim=None), matching the DCNv2 paper's deep branch
    params["mlp"], mlp_state = mlp_ops.init(
        k_mlp, in_dim, cfg.hidden_units, out_dim=None,
        batch_norm=cfg.batch_norm,
    )
    params["out"] = linear_init(k_out, in_dim + cfg.hidden_units[-1], 1)
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
    td = jnp.float32 if cfg.tower_dtype == "float32" else compute_dtype
    flat = x.reshape(b, -1).astype(td)
    crossed = cross_ops.apply(params["cross"], flat)
    rng_mlp = None if rng is None else jax.random.fold_in(rng, 1)
    deep, mlp_state = mlp_ops.apply(
        params["mlp"], state["mlp"], flat,
        train=train, dropout_rate=cfg.net_dropout, rng=rng_mlp, weight=weight,
    )
    h = jnp.concatenate([crossed, deep], axis=-1)
    logit = linear_apply(params["out"], h)[..., 0]
    return logit.astype(jnp.float32), {"mlp": mlp_state}
