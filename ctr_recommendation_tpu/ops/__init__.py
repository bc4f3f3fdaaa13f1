from ctr_recommendation_tpu.ops import (
    attention,
    bilinear,
    cin,
    initializers,
    interaction,
    mlp,
    pooling,
    senet,
)

__all__ = [
    "attention",
    "bilinear",
    "cin",
    "initializers",
    "interaction",
    "mlp",
    "pooling",
    "senet",
]
