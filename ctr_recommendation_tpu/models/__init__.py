from ctr_recommendation_tpu.models.registry import (
    available_models,
    build_model,
    get_model,
    register,
)

__all__ = ["available_models", "build_model", "get_model", "register"]
