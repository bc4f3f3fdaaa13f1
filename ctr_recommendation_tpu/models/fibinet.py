"""MM-FiBiNET: SENet excitation + bilinear field-pair interaction + DNN tower.

TPU-native re-design of the reference model (model_fibinet.py:91-199):
identical math — field stack [User, Like, View, ItemID, ItemImage, Hist],
SENet(r=2), shared-W bilinear over the 15 field pairs, (6+15)*E-wide concat
into a BatchNorm MLP — but vectorized pair interactions (no Python loops),
logits out (sigmoid lives at the loss/predict boundary), global-batch
BatchNorm under pjit, and an optional fused Pallas interaction kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops import bilinear as bilinear_ops
from ctr_recommendation_tpu.ops import mlp as mlp_ops
from ctr_recommendation_tpu.ops import senet as senet_ops
from ctr_recommendation_tpu.ops.interaction import senet_bilinear_concat

SEQ_POOLING = "mean"


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    k_trunk, k_senet, k_bi, k_mlp = jax.random.split(key, 4)
    f, e = fm.num_fields, cfg.embedding_dim
    params = {
        "trunk": trunk.init(k_trunk, fm, cfg, seq_pooling=SEQ_POOLING),
        "senet": senet_ops.init(k_senet, f, cfg.senet_reduction, cfg.senet_bias),
        "bilinear": bilinear_ops.init(k_bi, e, f, cfg.bilinear_type),
    }
    in_dim = (f + fm.num_pairs) * e
    params["mlp"], mlp_state = mlp_ops.init(
        k_mlp, in_dim, cfg.hidden_units, out_dim=1, batch_norm=cfg.batch_norm
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
    h = senet_bilinear_concat(
        params["senet"], params["bilinear"], x,
        bilinear_type=cfg.bilinear_type, use_pallas=cfg.use_pallas, train=train,
    )
    rng_mlp = None if rng is None else jax.random.fold_in(rng, 1)
    td = jnp.float32 if cfg.tower_dtype == "float32" else compute_dtype
    logits, mlp_state = mlp_ops.apply(
        params["mlp"], state["mlp"], h.astype(td),
        train=train, dropout_rate=cfg.net_dropout, rng=rng_mlp, weight=weight,
    )
    return logits[..., 0].astype(jnp.float32), {"mlp": mlp_state}
