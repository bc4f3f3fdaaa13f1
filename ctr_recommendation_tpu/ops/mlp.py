"""DNN tower: Linear -> BatchNorm -> ReLU -> Dropout stacks + final logit.

Parity with the reference MLP (model_fibinet.py:125-135): hidden units
(512, 256), BatchNorm1d (torch semantics: momentum 0.1, eps 1e-5, biased
variance for normalization, unbiased for the running stat), dropout 0.2,
final Linear -> 1. The reference applies sigmoid inside the model and trains
BCELoss on probabilities (train_fibinet.py:79); we return LOGITS and use
BCE-with-logits at the loss — numerically superior, identical optimum
(SURVEY §7 build step 2).

BatchNorm under data parallelism: inside pjit/GSPMD with the batch sharded on
the ``data`` mesh axis, ``jnp.mean(x, axis=0)`` is the *global* batch mean —
XLA inserts the cross-replica reduction — so this is synchronized BatchNorm
for free (SURVEY §7 hard part (b)).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.ops.initializers import linear_apply, linear_init

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


def init(
    key: jax.Array,
    in_dim: int,
    hidden_units: Sequence[int],
    out_dim: int | None = 1,
    batch_norm: bool = True,
) -> tuple[dict, dict]:
    """Returns (params, state). state holds BatchNorm running stats.

    ``out_dim=None`` builds a HEADLESS tower: apply() returns the last
    hidden activation (post BN/ReLU/dropout) with no extra Linear — the
    deep-stream shape DCNv2/FinalMLP reference architectures use."""
    params: dict = {"layers": []}
    state: dict = {"layers": []}
    dims = [in_dim, *hidden_units]
    keys = jax.random.split(key, len(hidden_units) + 1)
    for li, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        layer = {"linear": linear_init(keys[li], d_in, d_out)}
        st = {}
        if batch_norm:
            layer["bn_scale"] = jnp.ones((d_out,))
            layer["bn_bias"] = jnp.zeros((d_out,))
            st = {"bn_mean": jnp.zeros((d_out,)), "bn_var": jnp.ones((d_out,))}
        params["layers"].append(layer)
        state["layers"].append(st)
    if out_dim is not None:
        params["out"] = linear_init(keys[-1], dims[-1], out_dim)
    return params, state


def _batch_norm(layer, st, h, train: bool, weight=None):
    if train:
        # statistics always in fp32 (stable even when the tower runs bf16)
        h32 = h.astype(jnp.float32)
        if weight is not None:
            # exclude zero-weight padded rows from the batch statistics
            # (the final partial batch pads with duplicated rows; unweighted
            # mean/var would skew both the step's normalization and the
            # running stats)
            w = weight.astype(jnp.float32)[:, None]
            n_eff = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(h32 * w, axis=0) / n_eff
            var = jnp.sum(w * jnp.square(h32 - mean), axis=0) / n_eff
            unbiased = var * (n_eff / jnp.maximum(n_eff - 1.0, 1.0))
        else:
            mean = jnp.mean(h32, axis=0)
            var = jnp.var(h32, axis=0)  # biased, used for normalization
            n = h.shape[0]
            unbiased = var * (n / max(n - 1, 1))
        new_st = {
            "bn_mean": (1 - BN_MOMENTUM) * st["bn_mean"] + BN_MOMENTUM * mean,
            "bn_var": (1 - BN_MOMENTUM) * st["bn_var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = st["bn_mean"], st["bn_var"]
        new_st = st
    inv = jax.lax.rsqrt(var.astype(h.dtype) + BN_EPS)
    h = (h - mean.astype(h.dtype)) * inv
    h = h * layer["bn_scale"].astype(h.dtype) + layer["bn_bias"].astype(h.dtype)
    return h, new_st


def apply(
    params: dict,
    state: dict,
    x: jax.Array,
    *,
    train: bool = False,
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
    weight: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    """x: (B, in_dim) -> (logits (B, out_dim), new_state).

    ``weight``: optional (B,) 0/1 row mask; zero-weight (padded) rows are
    excluded from BatchNorm batch statistics."""
    h = x
    new_layers = []
    for li, (layer, st) in enumerate(zip(params["layers"], state["layers"])):
        h = linear_apply(layer["linear"], h)
        if "bn_scale" in layer:
            h, st = _batch_norm(layer, st, h, train, weight)
        h = jax.nn.relu(h)
        if train and dropout_rate > 0.0:
            if rng is None:
                raise ValueError("dropout needs an rng in train mode")
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(jax.random.fold_in(rng, li), keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
        new_layers.append(st)
    out = linear_apply(params["out"], h) if "out" in params else h
    return out, {"layers": new_layers}


def fold_batch_norm(params: dict, state: dict) -> dict:
    """Fold frozen BatchNorm stats into the preceding Linear for inference.

    y = gamma * (xW + b - mean) / sqrt(var + eps) + beta
      = x (W * g) + ((b - mean) * g + beta),  g = gamma / sqrt(var + eps)

    The folded tower is plain matmul+ReLU stacks — what the fused Pallas
    scoring kernel consumes.
    """
    folded = {"layers": []}
    if "out" in params:
        folded["out"] = params["out"]
    for layer, st in zip(params["layers"], state["layers"]):
        lin = dict(layer["linear"])
        if "bn_scale" in layer:
            g = layer["bn_scale"] / jnp.sqrt(st["bn_var"] + BN_EPS)
            lin["w"] = lin["w"] * g[None, :]
            lin["b"] = (lin.get("b", 0.0) - st["bn_mean"]) * g + layer["bn_bias"]
        folded["layers"].append({"linear": lin})
    return folded
