"""MaskNet (parallel): instance-guided feature-wise multiplication.

Beyond the reference/BASELINE zoo — Wang et al. 2021, "MaskNet: Introducing
Feature-Wise Multiplication to CTR Ranking Models". The parallel variant:
each MaskBlock computes an instance-guided mask from the RAW flattened field
embeddings through a bottleneck MLP, multiplies it into the LayerNorm-ed
embeddings, and projects to a hidden vector; block outputs concatenate into
the logit head. Everything is (B, F*E)-wide matmuls — batched, bf16,
MXU-friendly; no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops.initializers import linear_apply, linear_init

SEQ_POOLING = "mean"

LN_EPS = 1e-5


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    f, e = fm.num_fields, cfg.embedding_dim
    d = f * e
    agg = max(1, int(cfg.masknet_agg_ratio * d))
    nb, bd = cfg.masknet_blocks, cfg.masknet_block_dim
    keys = jax.random.split(key, 2 + 3 * nb)
    params: dict = {
        "trunk": trunk.init(keys[0], fm, cfg, seq_pooling=SEQ_POOLING),
        # LayerNorm over each field embedding (affine shared across fields)
        "ln_scale": jnp.ones((e,)),
        "ln_bias": jnp.zeros((e,)),
        "blocks": [],
    }
    for i in range(nb):
        params["blocks"].append(
            {
                "mask1": linear_init(keys[1 + 3 * i], d, agg),
                "mask2": linear_init(keys[2 + 3 * i], agg, d),
                "hidden": linear_init(keys[3 + 3 * i], d, bd),
                "hln_scale": jnp.ones((bd,)),
                "hln_bias": jnp.zeros((bd,)),
            }
        )
    params["out"] = linear_init(keys[1 + 3 * nb], nb * bd, 1)
    return params, {}


def _ln(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


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
    td = jnp.float32 if cfg.tower_dtype == "float32" else compute_dtype
    b = x.shape[0]
    raw = x.reshape(b, -1).astype(td)  # mask input: RAW embeddings (paper)
    ln_emb = _ln(
        x.astype(jnp.float32),
        params["ln_scale"],
        params["ln_bias"],
    ).reshape(b, -1).astype(td)

    outs = []
    for i, blk in enumerate(params["blocks"]):
        m = linear_apply(blk["mask2"], jax.nn.relu(linear_apply(blk["mask1"], raw)))
        h = linear_apply(blk["hidden"], ln_emb * m)
        h = _ln(h.astype(jnp.float32), blk["hln_scale"], blk["hln_bias"]).astype(td)
        h = jax.nn.relu(h)
        if train and cfg.net_dropout > 0.0 and rng is not None:
            keep = 1.0 - cfg.net_dropout
            mask = jax.random.bernoulli(
                jax.random.fold_in(rng, 100 + i), keep, h.shape
            )
            h = jnp.where(mask, h / keep, 0.0)
        outs.append(h)
    logits = linear_apply(params["out"], jnp.concatenate(outs, axis=-1))
    return logits[..., 0].astype(jnp.float32), {}
