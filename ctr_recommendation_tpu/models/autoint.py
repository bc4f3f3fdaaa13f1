"""AutoInt: multi-head self-attention feature interactions + logit head.

Beyond the reference/BASELINE zoo (Song et al. 2019), included for
completeness. Over the shared (B, F, E) field stack, each interacting layer
runs multi-head scaled-dot-product self-attention across the F fields (F is
tiny, so the F×F attention is a handful of small MXU matmuls) with a linear
residual and ReLU; the flattened output feeds a linear logit head, plus the
shared BatchNorm MLP as a parallel deep tower (the "AutoInt+" variant).

Config: ``autoint_num_layers`` / ``autoint_num_heads`` (head dim =
embedding_dim // heads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops import mlp as mlp_ops
from ctr_recommendation_tpu.ops.initializers import linear_apply, linear_init, xavier_normal

SEQ_POOLING = "mean"


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    e = cfg.embedding_dim
    heads = cfg.autoint_num_heads
    if e % heads:
        raise ValueError(
            f"embedding_dim {e} not divisible by autoint_num_heads {heads}"
        )
    keys = jax.random.split(key, cfg.autoint_num_layers + 3)
    params: dict = {
        "trunk": trunk.init(keys[0], fm, cfg, seq_pooling=SEQ_POOLING),
        "layers": [],
    }
    for li in range(cfg.autoint_num_layers):
        kq, kk, kv, kr = jax.random.split(keys[1 + li], 4)
        params["layers"].append(
            {
                "wq": xavier_normal(kq, (e, e)),
                "wk": xavier_normal(kk, (e, e)),
                "wv": xavier_normal(kv, (e, e)),
                "wres": xavier_normal(kr, (e, e)),
            }
        )
    params["head"] = linear_init(keys[-2], fm.num_fields * e, 1)
    params["mlp"], mlp_state = mlp_ops.init(
        keys[-1], fm.num_fields * e, cfg.hidden_units, out_dim=1,
        batch_norm=cfg.batch_norm,
    )
    return params, {"mlp": mlp_state}


def _interact(layer: dict, x: jax.Array, heads: int) -> jax.Array:
    """One AutoInt layer: (B, F, E) -> (B, F, E)."""
    b, f, e = x.shape
    d = e // heads

    def split(h):  # (B, F, E) -> (B, heads, F, d)
        return h.reshape(b, f, heads, d).transpose(0, 2, 1, 3)

    q = split(x @ layer["wq"])
    k = split(x @ layer["wk"])
    v = split(x @ layer["wv"])
    logits = jnp.einsum("bhfd,bhgd->bhfg", q, k) / jnp.sqrt(
        jnp.asarray(d, x.dtype)
    )
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhfg,bhgd->bhfd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, f, e)
    return jax.nn.relu(out + x @ layer["wres"])


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
    h = x
    for layer in params["layers"]:
        h = _interact(layer, h, cfg.autoint_num_heads)
    b = x.shape[0]
    flat = h.reshape(b, -1).astype(jnp.float32)
    attn_logit = linear_apply(params["head"], flat)[..., 0]

    rng_mlp = None if rng is None else jax.random.fold_in(rng, 1)
    td = jnp.float32 if cfg.tower_dtype == "float32" else compute_dtype
    deep, mlp_state = mlp_ops.apply(
        params["mlp"], state["mlp"], x.reshape(b, -1).astype(td),
        train=train, dropout_rate=cfg.net_dropout, rng=rng_mlp, weight=weight,
    )
    return attn_logit + deep[..., 0].astype(jnp.float32), {"mlp": mlp_state}
