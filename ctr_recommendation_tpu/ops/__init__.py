from ctr_recommendation_tpu.ops import (
    attention,
    bilinear,
    cin,
    crossnet,
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
    "crossnet",
    "initializers",
    "interaction",
    "mlp",
    "pooling",
    "senet",
]
