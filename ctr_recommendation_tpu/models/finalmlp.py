"""FinalMLP: dual-stream MLP with feature gating and bilinear fusion.

Scope from BASELINE.json configs[3] (FinalMLP, Mao et al. AAAI'23 —
two-stream MLP baseline with stream-specific feature selection and a
multi-head bilinear fusion head). Shares the embedding trunk.

Structure:
  flat = flatten(fields)                        (B, F*E)
  g_k  = 2 * sigmoid(MLP_gate_k(ctx_k))        stream-k feature gate
  s_k  = MLP_k(flat * g_k)                      two parallel towers
  logit = sum_h [ w1·s1 + w2·s2 + s1_h^T W_h s2_h ]   multi-head bilinear fusion
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import trunk
from ctr_recommendation_tpu.ops import mlp as mlp_ops
from ctr_recommendation_tpu.ops.initializers import linear_apply, linear_init

SEQ_POOLING = "mean"
_GATE_HIDDEN = 64


def init(key: jax.Array, fm: FeatureMap, cfg: ModelConfig) -> tuple[dict, dict]:
    keys = jax.random.split(key, 8)
    f, e = fm.num_fields, cfg.embedding_dim
    in_dim = f * e
    params: dict = {"trunk": trunk.init(keys[0], fm, cfg, seq_pooling=SEQ_POOLING)}
    state: dict = {}
    # feature-selection gates: small MLPs conditioned on the flat features
    for k, gname in ((1, "gate1"), (2, "gate2")):
        params[gname] = {
            "fc1": linear_init(keys[k], in_dim, _GATE_HIDDEN),
            "fc2": linear_init(jax.random.fold_in(keys[k], 1), _GATE_HIDDEN, in_dim),
        }
    # headless streams (out_dim=None): each stream's output is its last
    # hidden activation, as in the FinalMLP paper's dual-stream design
    params["stream1"], state["stream1"] = mlp_ops.init(
        keys[3], in_dim, cfg.finalmlp_stream1_units, out_dim=None,
        batch_norm=cfg.batch_norm,
    )
    params["stream2"], state["stream2"] = mlp_ops.init(
        keys[4], in_dim, cfg.finalmlp_stream2_units, out_dim=None,
        batch_norm=cfg.batch_norm,
    )
    d1 = cfg.finalmlp_stream1_units[-1]
    d2 = cfg.finalmlp_stream2_units[-1]
    h = cfg.finalmlp_num_heads
    if d1 % h or d2 % h:
        raise ValueError(f"stream dims ({d1},{d2}) not divisible by heads {h}")
    params["fusion"] = {
        "w1": linear_init(keys[5], d1, 1),
        "w2": linear_init(keys[6], d2, 1, use_bias=False),
        # per-head bilinear (H, d1/H, d2/H)
        "w_bi": 0.01 * jax.random.normal(keys[7], (h, d1 // h, d2 // h)),
    }
    return params, state


def _gate(params: dict, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(linear_apply(params["fc1"], x))
    return 2.0 * jax.nn.sigmoid(linear_apply(params["fc2"], h))


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
    flat = x.reshape(b, -1).astype(jnp.float32)
    r1 = None if rng is None else jax.random.fold_in(rng, 1)
    r2 = None if rng is None else jax.random.fold_in(rng, 2)
    s1, st1 = mlp_ops.apply(
        params["stream1"], state["stream1"], flat * _gate(params["gate1"], flat),
        train=train, dropout_rate=cfg.net_dropout, rng=r1, weight=weight,
    )
    s2, st2 = mlp_ops.apply(
        params["stream2"], state["stream2"], flat * _gate(params["gate2"], flat),
        train=train, dropout_rate=cfg.net_dropout, rng=r2, weight=weight,
    )
    h = cfg.finalmlp_num_heads
    s1h = s1.reshape(b, h, -1)
    s2h = s2.reshape(b, h, -1)
    bi = jnp.einsum("bhi,hij,bhj->b", s1h, params["fusion"]["w_bi"], s2h)
    logit = (
        linear_apply(params["fusion"]["w1"], s1)[..., 0]
        + linear_apply(params["fusion"]["w2"], s2)[..., 0]
        + bi
    )
    return logit, {"stream1": st1, "stream2": st2}
