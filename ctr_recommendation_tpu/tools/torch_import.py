"""Import a reference-format torch checkpoint into the JAX MM-FiBiNET.

The reference trains with ``torch.save(model.state_dict())`` (DataParallel-
unwrapped, src/train_fibinet.py:97-99,148-152) and its Prediction script
reloads it stripping any ``module.`` prefixes (src/Prediction.py:72-78).
This tool maps that exact state_dict layout onto this framework's parameter
tree, so an existing reference checkpoint can be scored by the TPU stack
directly — the strongest numerical-parity evidence obtainable without the
real MicroLens data (VERDICT r3 item 8), and a practical migration path.

State_dict -> params mapping (reference names, src/model_fibinet.py:91-136):

    item_emb.weight (91718,E)    -> trunk.tables["item_id"][:91718]
    user_emb.weight (20000,E)    -> DROPPED (declared but unused in the
                                    reference forward; the user field is a
                                    zeros placeholder, model_fibinet.py:152)
    cate_emb.weight (11,E)       -> trunk.tables["likes_level"][:11]
                                    (shared by views_level, :155-156)
    mm_proj.0.{weight,bias}      -> trunk.dense[mm].proj (weight TRANSPOSED:
                                    torch Linear stores (out,in); we store
                                    (in,out) for x @ w)
    mm_proj.1.{weight,bias}      -> trunk.dense[mm].{ln_scale,ln_bias}
    senet.excitation.0.{w,b}     -> senet.fc1 (transposed)
    senet.excitation.2.{w,b}     -> senet.fc2 (transposed)
    bilinear.W (E,E)             -> bilinear.w  (NOT transposed: both sides
                                    compute v = x @ W, model_fibinet.py:72)
    bilinear.W_list.{i}          -> bilinear.w_each[i]   ("each" variant)
    mlp.0/.4 Linear              -> mlp.layers[k].linear (transposed)
    mlp.1/.5 BatchNorm1d         -> mlp.layers[k].{bn_scale,bn_bias} +
                                    model_state mlp.layers[k].{bn_mean,bn_var}
    mlp.8 Linear (256,1)         -> mlp.out (transposed)

Embedding tables here are vocab-padded to a lane multiple
(parallel/embedding.py round_up_vocab); checkpoint rows land in the prefix
and padded rows stay at their init (never addressed).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.config.schema import ExperimentConfig, FeatureType
from ctr_recommendation_tpu.features.feature_map import FeatureMap, build_feature_map
from ctr_recommendation_tpu.models.registry import get_model


def _np(t) -> np.ndarray:
    """torch tensor | array-like -> float32/int numpy without importing torch."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def strip_module_prefix(sd: dict) -> dict:
    """DataParallel checkpoints prefix every key with ``module.``
    (Prediction.py:74-78 semantics)."""
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def _set_rows(table: jax.Array, rows: np.ndarray) -> jax.Array:
    """Copy checkpoint rows into the (possibly vocab-padded) table prefix."""
    n, e = rows.shape
    if table.shape[0] < n or table.shape[1] != e:
        raise ValueError(
            f"table shape {table.shape} cannot hold checkpoint rows {rows.shape}"
        )
    return table.at[:n].set(jnp.asarray(rows, table.dtype))


def import_state_dict(
    sd: dict,
    exp: ExperimentConfig,
    fm: FeatureMap | None = None,
    *,
    strict: bool = True,
) -> tuple[dict, dict]:
    """Map a reference MM_FiBiNET state_dict onto (params, model_state).

    Starts from a fresh ``init`` (so structure/padding/dtypes are exactly
    what the Trainer/Predictor expect) and overwrites every leaf the
    checkpoint carries. ``strict`` raises on unconsumed checkpoint keys
    (other than the declared-dead ``user_emb``).
    """
    fm = fm or build_feature_map(exp.dataset)
    cfg = exp.model
    if cfg.model != "mm_fibinet":
        raise ValueError(
            f"reference checkpoints are MM_FiBiNET; experiment has {cfg.model!r}"
        )
    sd = strip_module_prefix(sd)
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    module = get_model(cfg.model)
    params, state = module.init(jax.random.key(0), fm, cfg)
    used: set[str] = {"user_emb.weight"}  # dead table, dropped by design

    def take(key: str, transpose: bool = False) -> jnp.ndarray:
        if key not in sd:
            raise KeyError(f"checkpoint missing {key!r}")
        used.add(key)
        a = _np(sd[key]).astype(np.float32)
        return jnp.asarray(a.T if transpose else a)

    e = cfg.embedding_dim
    item_rows = _np(sd["item_emb.weight"])
    if item_rows.shape[1] != e:
        raise ValueError(
            f"checkpoint embedding_dim {item_rows.shape[1]} != config {e}"
        )

    tables = dict(params["trunk"]["tables"])
    # table names follow the owning feature (features/feature_map.py):
    # item_id owns the item/sequence table, likes_level the shared cate table
    tables["item_id"] = _set_rows(tables["item_id"], item_rows)
    used.add("item_emb.weight")
    tables["likes_level"] = _set_rows(
        tables["likes_level"], _np(sd["cate_emb.weight"])
    )
    used.add("cate_emb.weight")
    params["trunk"] = dict(params["trunk"])
    params["trunk"]["tables"] = tables

    # mm projection: Linear + LayerNorm (model_fibinet.py:105-109)
    dense = dict(params["trunk"]["dense"])
    for f in fm.features_of_type(FeatureType.DENSE_EMBEDDING):
        dense[f.name] = {
            "proj": {
                "w": take("mm_proj.0.weight", transpose=True),
                "b": take("mm_proj.0.bias"),
            },
            "ln_scale": take("mm_proj.1.weight"),
            "ln_bias": take("mm_proj.1.bias"),
        }
    params["trunk"]["dense"] = dense

    params["senet"] = {
        "fc1": {
            "w": take("senet.excitation.0.weight", transpose=True),
            "b": take("senet.excitation.0.bias"),
        },
        "fc2": {
            "w": take("senet.excitation.2.weight", transpose=True),
            "b": take("senet.excitation.2.bias"),
        },
    }
    if cfg.bilinear_type == "all":
        params["bilinear"] = {"w": take("bilinear.W")}
    else:
        n = fm.num_fields - 1
        params["bilinear"] = {
            "w_each": jnp.stack([take(f"bilinear.W_list.{i}") for i in range(n)])
        }

    # MLP tower: Linear/BN1d/ReLU/Dropout x2 + head at indices 0,1,4,5,8
    # (model_fibinet.py:125-135)
    mlp = {"layers": [], "out": None}
    mstate = {"layers": []}
    torch_linear = [0, 4]
    torch_bn = [1, 5]
    for li, (tl, tb) in enumerate(zip(torch_linear, torch_bn)):
        mlp["layers"].append(
            {
                "linear": {
                    "w": take(f"mlp.{tl}.weight", transpose=True),
                    "b": take(f"mlp.{tl}.bias"),
                },
                "bn_scale": take(f"mlp.{tb}.weight"),
                "bn_bias": take(f"mlp.{tb}.bias"),
            }
        )
        mstate["layers"].append(
            {
                "bn_mean": take(f"mlp.{tb}.running_mean"),
                "bn_var": take(f"mlp.{tb}.running_var"),
            }
        )
    mlp["out"] = {
        "w": take("mlp.8.weight", transpose=True),
        "b": take("mlp.8.bias"),
    }
    params["mlp"] = mlp
    new_state = dict(state)
    new_state["mlp"] = mstate

    leftover = set(sd) - used
    if strict and leftover:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(leftover)}")
    return params, new_state


def load_checkpoint(path: str, exp: ExperimentConfig, **kw) -> tuple[dict, dict]:
    """torch.load a reference ``FiBiNET_best.pth`` and import it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_state_dict(sd, exp, **kw)
