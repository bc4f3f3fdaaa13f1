"""ctr_recommendation_tpu — a TPU-native CTR recommendation framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
``YOUNESELBOUKNIFY/Ctr_recommendation`` reference (MM-FiBiNET multimodal CTR on
MicroLens_1M), extended to a full framework: typed feature configs that drive
embedding-table construction, streaming parquet input, a model zoo (FiBiNET,
xDeepFM/CIN, FinalMLP, SASRec-style attention pooling) on a shared sharded
embedding trunk, fused Pallas TPU kernels for the interaction/scoring hot
paths, and a multi-host ``jax.sharding.Mesh`` data/model parallel runtime.

Layout:
    config/     typed experiment configuration (the honest version of
                the reference's fibinet_config.yaml — actually parsed)
    features/   feature map: field schema -> vocab sizes, pad ids, seq lens
    data/       streaming parquet reader, collator, item-embedding store
    ops/        functional building blocks (+ ops/pallas TPU kernels)
    models/     model zoo + registry
    parallel/   mesh construction, shardings, row-sharded embedding lookup
    training/   optimizers, metrics, checkpointing, train loop
    inference/  batched scoring + Kaggle submission writer
    cli/        train / predict entry points
"""

from ctr_recommendation_tpu.version import __version__


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax at package import).
    if name == "Trainer":
        from ctr_recommendation_tpu.training import Trainer

        return Trainer
    if name == "Predictor":
        from ctr_recommendation_tpu.inference import Predictor

        return Predictor
    if name == "build_model":
        from ctr_recommendation_tpu.models import build_model

        return build_model
    if name == "microlens_experiment":
        from ctr_recommendation_tpu.config import microlens_experiment

        return microlens_experiment
    raise AttributeError(name)


__all__ = [
    "Predictor",
    "Trainer",
    "__version__",
    "build_model",
    "microlens_experiment",
]
