from ctr_recommendation_tpu.config.loader import (
    load_experiment,
    microlens_experiment,
    microlens_features,
)
from ctr_recommendation_tpu.config.schema import (
    DatasetConfig,
    ExperimentConfig,
    FeatureSpec,
    FeatureType,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)

__all__ = [
    "DatasetConfig",
    "ExperimentConfig",
    "FeatureSpec",
    "FeatureType",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
    "load_experiment",
    "microlens_experiment",
    "microlens_features",
]

from ctr_recommendation_tpu.config import serialize  # noqa: E402

__all__.append("serialize")
