"""Model registry — makes the config's ``model:`` key real.

The reference declares ``model: MM_FiBiNET`` in its YAML but never reads it
(fibinet_config.yaml:45; build_model ignores it, model_fibinet.py:201-202).
Here ``build_model(feature_map, model_cfg)`` dispatches on it.

Every registered model implements:
    init(key, feature_map, model_cfg)  -> (params, state)
    apply(params, state, feature_map, model_cfg, batch,
          *, train, rng, compute_dtype, lookup) -> (logits (B,), new_state)
"""

from __future__ import annotations

import types
from typing import Callable

import jax

from ctr_recommendation_tpu.config.schema import ModelConfig
from ctr_recommendation_tpu.features.feature_map import FeatureMap
from ctr_recommendation_tpu.models import (
    autoint,
    dcnv2,
    deepfm,
    din,
    dlrm,
    fibinet,
    finalmlp,
    masknet,
    pnn,
    sasrec_fibinet,
    xdeepfm,
)

_REGISTRY: dict[str, types.ModuleType] = {}


def register(name: str, module: types.ModuleType) -> None:
    _REGISTRY[name.lower()] = module


def get_model(name: str) -> types.ModuleType:
    key = name.lower()
    if key not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[key]


def available_models() -> tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


register("fibinet", fibinet)
register("mm_fibinet", fibinet)
register("xdeepfm", xdeepfm)
register("finalmlp", finalmlp)
register("sasrec_fibinet", sasrec_fibinet)
register("dcnv2", dcnv2)
register("deepfm", deepfm)
register("autoint", autoint)
register("din", din)
register("masknet", masknet)
register("pnn", pnn)
register("dlrm", dlrm)


def build_model(
    feature_map: FeatureMap, model_cfg: ModelConfig, key: jax.Array
) -> tuple[types.ModuleType, dict, dict]:
    """Factory mirroring the reference's ``build_model`` entry point
    (model_fibinet.py:201-202), returning (module, params, state)."""
    module = get_model(model_cfg.model)
    params, state = module.init(key, feature_map, model_cfg)
    return module, params, state
