"""Typed experiment configuration.

The reference keeps a YAML schema that nothing parses (the ``feature_cols``
block at /root/reference/config/fibinet_config.yaml:32-39 is dead
documentation, and vocab sizes 91718/20000/11 are hardcoded at
/root/reference/src/model_fibinet.py:100-102). Here the schema is the single
source of truth: the feature map, embedding tables, and input pipeline are all
constructed from these dataclasses.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Mapping, Sequence

# one-shot flag: the implicit adagrad-family table_lr_scale default is
# logged the first time it is applied (advisor round 4: the 10x change
# was otherwise invisible in run logs)
_logged_lr_scale_default = False


class FeatureType(str, enum.Enum):
    """Kind of input column.

    CATEGORICAL     integer id -> learned embedding row.
    SEQUENCE        variable-length list of integer ids (padded with
                    ``pad_id``); pooled by the model (mean / attention).
    DENSE_EMBEDDING pre-computed float vector (e.g. the frozen 128-d
                    multimodal item vectors, readme.md:67-72 of the
                    reference), optionally projected by the model.
    PLACEHOLDER     a declared field that contributes a zeros embedding —
                    reproduces the reference's "user" field which is
                    stacked as zeros (model_fibinet.py:152) while the
                    column itself is ignored.
    LABEL           the supervision column.
    META            carried through the pipeline but not fed to the model
                    (e.g. row ids).
    """

    CATEGORICAL = "categorical"
    SEQUENCE = "sequence"
    DENSE_EMBEDDING = "dense_embedding"
    PLACEHOLDER = "placeholder"
    LABEL = "label"
    META = "meta"


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
    """One input column and how the model should treat it."""

    name: str
    type: FeatureType
    # Vocab size for CATEGORICAL / SEQUENCE (rows in the embedding table).
    vocab_size: int | None = None
    # Hash trick: when set, ids are hashed ON DEVICE into [1, hash_buckets)
    # (multiplicative Knuth hash inside the jitted step) and the table gets
    # hash_buckets rows — unbounded/unknown id spaces become safe instead of
    # out-of-range (the reference KeyErrors on unseen train ids,
    # dataloader.py:104-106). pad_id is preserved exactly (never hashed).
    # vocab_size is ignored when this is set.
    hash_buckets: int | None = None
    # Share an embedding table with another feature (by that feature's name).
    # The reference shares one table between likes_level/views_level
    # (model_fibinet.py:102,155-156) and between item_id/item_seq
    # (model_fibinet.py:159,167).
    share_embedding: str | None = None
    # Padding id for SEQUENCE features; that table row is zeroed and padded
    # steps are excluded from pooling (model_fibinet.py:100,168-174).
    pad_id: int = 0
    # Max sequence length; longer sequences keep the LAST max_len entries
    # (dataloader.py:113-115).
    max_len: int | None = None
    # Dimensionality for DENSE_EMBEDDING inputs.
    dense_dim: int | None = None
    # Whether the field participates in the interaction stack.
    active: bool = True
    # Provenance tag (e.g. "item" when the value is joined from item_info).
    source: str | None = None

    def __post_init__(self) -> None:
        if self.type in (FeatureType.CATEGORICAL, FeatureType.SEQUENCE):
            if (
                self.share_embedding is None
                and not self.vocab_size
                and not self.hash_buckets
            ):
                raise ValueError(
                    f"feature {self.name!r}: {self.type.value} features need "
                    "vocab_size or hash_buckets (or share_embedding)"
                )
            if self.hash_buckets is not None and self.hash_buckets < 2:
                raise ValueError(
                    f"feature {self.name!r}: hash_buckets must be >= 2 "
                    "(row 0 is reserved for the pad id)"
                )
        if self.type == FeatureType.SEQUENCE and not self.max_len:
            raise ValueError(f"feature {self.name!r}: sequence features need max_len")
        if (
            self.type == FeatureType.SEQUENCE
            and self.hash_buckets is not None
            and self.pad_id != 0
        ):
            raise ValueError(
                f"feature {self.name!r}: hashed sequences require pad_id 0 "
                "(hashes land in [1, buckets), so only row 0 is collision-free)"
            )
        if self.type == FeatureType.DENSE_EMBEDDING and not self.dense_dim:
            raise ValueError(f"feature {self.name!r}: dense features need dense_dim")


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """Paths + schema for one dataset (dataset_config block in the YAML)."""

    dataset_id: str
    features: tuple[FeatureSpec, ...]
    label: str = "label"
    data_root: str = ""
    train_data: str = ""
    valid_data: str = ""
    test_data: str = ""
    item_info: str = ""
    # Column in item_info holding the frozen multimodal vectors.
    item_info_key: str = "item_id"
    item_info_emb_col: str = "item_emb_d128"

    def feature(self, name: str) -> FeatureSpec:
        for f in self.features:
            if f.name == name:
                return f
        raise KeyError(name)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters shared across the model zoo."""

    model: str = "mm_fibinet"
    embedding_dim: int = 128
    # Embedding-table init scale: N(0, std). None (the default) resolves
    # per model family via ``resolved_init_std``: 1.0 — torch nn.Embedding
    # parity (the reference's init, convergence-critical for reproducing its
    # logged run — SURVEY §7(c)) — for every family except those whose
    # logits are raw products of field embeddings (deepfm's FM term), which
    # saturate BCE at std 1.0 with E=128 (measured AUC 0.650 vs 0.7733,
    # docs/PERFORMANCE.md) and get the usual CTR-framework 0.01. Set
    # explicitly to override.
    embedding_init_std: float | None = None
    # FiBiNET (model_fibinet.py:114,118; reference hardcodes "all"/r=2 —
    # code wins over its YAML per SURVEY §5.6).
    bilinear_type: str = "all"  # "all" | "each"
    senet_reduction: int = 2
    senet_bias: bool = True  # reference keeps default Linear bias
    # DNN tower (model_fibinet.py:125-135).
    hidden_units: tuple[int, ...] = (512, 256)
    net_dropout: float = 0.2
    batch_norm: bool = True
    # xDeepFM CIN layer widths.
    cin_layer_units: tuple[int, ...] = (64, 64)
    # FinalMLP stream widths + fusion heads.
    finalmlp_stream1_units: tuple[int, ...] = (512, 256)
    finalmlp_stream2_units: tuple[int, ...] = (512, 256)
    finalmlp_num_heads: int = 8
    # AutoInt interacting layers (models/autoint.py).
    autoint_num_layers: int = 2
    autoint_num_heads: int = 2
    # DIN local-activation-unit hidden widths (models/din.py).
    din_att_hidden_units: tuple[int, ...] = (64, 32)
    # MaskNet parallel blocks (models/masknet.py).
    masknet_blocks: int = 4
    masknet_block_dim: int = 64
    masknet_agg_ratio: float = 2.0  # mask bottleneck = ratio * F*E
    # SASRec-style attention pooling over the click history.
    attn_num_heads: int = 2
    attn_num_layers: int = 1
    attn_dropout: float = 0.1
    # Use fused Pallas kernels for the interaction block when on TPU.
    use_pallas: bool = True
    # DNN-tower matmul precision: "compute" runs the tower in the training
    # compute dtype (bfloat16 — ~2x MXU throughput; BatchNorm statistics
    # stay fp32 either way); "float32" is exact reference parity. Default
    # flipped to "compute" after the convergence study showed identical
    # AUC/loss trajectories (benchmarks/bf16_tower_study.py, docs/
    # PERFORMANCE.md round-2 table; fp32 vs bf16 AUC within 0.007, bf16
    # slightly ahead, losses within 0.003).
    tower_dtype: str = "compute"

    def resolved_init_std(self) -> float:
        """Per-family embedding init std when not set explicitly."""
        if self.embedding_init_std is not None:
            return self.embedding_init_std
        return _FAMILY_INIT_STD.get(self.model, 1.0)


# Families whose logit is a raw product of N(0, std) field embeddings —
# torch-parity std 1.0 saturates BCE at E=128 (|FM logit| ~ sqrt(E*F^2/2));
# 0.01 measured AUC 0.650 -> 0.7733 on the synthetic zoo run
# (docs/PERFORMANCE.md model-zoo table).
_FAMILY_INIT_STD: dict[str, float] = {"deepfm": 0.01}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization / loop hyper-parameters (MM_FiBiNET_Run block)."""

    batch_size: int = 4096
    epochs: int = 40
    # torch.optim.Adam in the reference code (train_fibinet.py:78) despite
    # "adamw" in its YAML; both supported, "adam" reproduces the logged run.
    optimizer: str = "adam"  # "adam" | "adamw" | "adagrad"
    # Embedding-table update strategy: "dense" runs the tables through the
    # same optax chain as everything else (reference semantics); the sparse
    # kinds update only the rows a batch touched (training/sparse.py) —
    # O(batch ids) instead of O(vocab) HBM traffic per step.
    table_optimizer: str = "dense"  # | "adagrad" | "rowwise_adagrad" | "adam"
    # lr multiplier for the table optimizer's schedule (sparse kinds only).
    # Adagrad-family steps decay ~1/sqrt(touches), so at production touch
    # counts the tables learn slower than the Adam-driven dense params on a
    # shared lr; the standard remedy (TPU embedding-optimizer practice) is a
    # higher embedding lr. None resolves per family via
    # resolved_table_lr_scale(): 10.0 for adagrad/rowwise_adagrad, 1.0
    # otherwise — measured round 4 (docs/PERFORMANCE.md): at full MicroLens
    # scale rowwise_adagrad at shared lr plateaus at AUC 0.699 (the dense
    # tower learning alone) while scale 10 matches lazy adam (0.7742 vs
    # 0.7763) and also improves the sparse-impressions regime (0.6968 vs
    # 0.6896).
    table_lr_scale: float | None = None
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    # OneCycleLR max_lr = onecycle_peak_factor * learning_rate
    # (train_fibinet.py:83-92).
    lr_schedule: str = "onecycle"  # "onecycle" | "cosine" | "constant"
    onecycle_peak_factor: float = 10.0
    onecycle_pct_start: float = 0.3
    onecycle_div_factor: float = 25.0
    onecycle_final_div_factor: float = 1000.0
    grad_clip_norm: float = 10.0  # train_fibinet.py:119
    seed: int = 2025
    shuffle: bool = True
    monitor: str = "auc"
    monitor_mode: str = "max"
    log_every: int = 200  # console cadence, train_fibinet.py:127
    # Host-driven training (``Trainer.fit`` — the streaming / strict-items /
    # multi-host paths) groups this many batches per device dispatch: K
    # batches are stacked host-side, uploaded once, and run as one jitted
    # K-step lax.scan. Amortizes per-dispatch overhead (measured 313K ->
    # >1M ex/s on the full-scale --stream path, docs/PERFORMANCE.md round 3).
    # 1 = one dispatch per batch (round-2 behavior). fit_on_device ignores
    # this (whole epoch is already one scan).
    steps_per_dispatch: int = 8
    eval_batch_size: int = 8192
    num_eval_threshold_bins: int = 0  # 0 => exact (sort-based) AUC
    save_best_only: bool = True
    # Mirror the per-epoch metrics CSV to TensorBoard (checkpoint_dir/tb)
    # when the tensorboard package is importable; silently off otherwise.
    tensorboard: bool = True
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3
    # Full-state resume-point cadence (epochs). The best-metric EXPORT is
    # still written whenever the monitored metric improves; this only spaces
    # the preemption-recovery checkpoints. At full MicroLens scale the state
    # save costs ~4 s/epoch through this environment's D2H tunnel vs a
    # 2.3 s train epoch — raise this when epochs are that cheap. The final
    # epoch is always checkpointed.
    checkpoint_every: int = 1
    # Resume-point saves return after the synchronous device->host snapshot;
    # serialization/disk writes overlap the next epoch (orbax async). The
    # best-metric export stays synchronous (it is the serving artifact).
    async_checkpointing: bool = True
    # Mixed precision: params fp32, interaction/tower compute bf16.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # PRNG for the TRAINING rng (dropout masks): "threefry" (default,
    # bit-reproducible across backends) or "rbg" (the TPU hardware
    # bit-generator — measured -19% step time on dropout-heavy models like
    # sasrec_fibinet, 9.41 -> 7.67 ms/step at bs 4096; the dropout
    # realization changes, statistics are identical). Param INIT always
    # uses threefry so initial weights stay bit-identical either way.
    rng_impl: str = "threefry"

    def resolved_table_lr_scale(self) -> float:
        """table_lr_scale with the adagrad-family default applied (see the
        field comment). Logs once when the implicit 10x default kicks in so
        full-scale runs record the effective embedding lr."""
        if self.table_lr_scale is not None:
            return self.table_lr_scale
        if self.table_optimizer in ("adagrad", "rowwise_adagrad"):
            global _logged_lr_scale_default
            if not _logged_lr_scale_default:
                _logged_lr_scale_default = True
                print(
                    "[table_optimizer] table_lr_scale not set: applying the "
                    f"{self.table_optimizer} family default 10.0 (pass "
                    "--table-lr-scale to override)"
                )
            return 10.0
        return 1.0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. data axis shards the batch; model axis shards
    embedding-table rows (SURVEY §2.3)."""

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = all remaining devices.
    data_parallel: int = -1
    model_parallel: int = 1
    # Row-sharded lookup exchange (parallel/embedding.py): "all_to_all"
    # (capacity-bucketed id routing, the default) or "psum" (mask-gather-
    # all-reduce; latency-optimal for tiny lookups, otherwise ~2x the bytes).
    lookup_method: str = "all_to_all"
    # Send-bucket slack over the balanced n/mp ids per shard; overflow
    # falls back to psum (correct, just slower).
    lookup_capacity_factor: float = 1.25

    @property
    def axis_names(self) -> tuple[str, str]:
        return (self.data_axis, self.model_axis)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    expid: str
    dataset: DatasetConfig
    model: ModelConfig
    train: TrainConfig
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **kw: Any) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def _tupled(value: Sequence[int] | None, default: tuple[int, ...]) -> tuple[int, ...]:
    if value is None:
        return default
    return tuple(int(v) for v in value)


def model_config_from_dict(d: Mapping[str, Any]) -> ModelConfig:
    base = ModelConfig()
    return ModelConfig(
        model=str(d.get("model", base.model)).lower(),
        embedding_dim=int(d.get("embedding_dim", base.embedding_dim)),
        embedding_init_std=(
            None
            if d.get("embedding_init_std", base.embedding_init_std) is None
            else float(d["embedding_init_std"])
        ),
        bilinear_type=str(d.get("bilinear_type", base.bilinear_type)),
        senet_reduction=int(d.get("senet_reduction", base.senet_reduction)),
        senet_bias=bool(d.get("senet_bias", base.senet_bias)),
        hidden_units=_tupled(d.get("hidden_units"), base.hidden_units),
        net_dropout=float(d.get("net_dropout", base.net_dropout)),
        batch_norm=bool(d.get("batch_norm", base.batch_norm)),
        cin_layer_units=_tupled(d.get("cin_layer_units"), base.cin_layer_units),
        finalmlp_stream1_units=_tupled(
            d.get("finalmlp_stream1_units"), base.finalmlp_stream1_units
        ),
        finalmlp_stream2_units=_tupled(
            d.get("finalmlp_stream2_units"), base.finalmlp_stream2_units
        ),
        finalmlp_num_heads=int(d.get("finalmlp_num_heads", base.finalmlp_num_heads)),
        autoint_num_layers=int(d.get("autoint_num_layers", base.autoint_num_layers)),
        autoint_num_heads=int(d.get("autoint_num_heads", base.autoint_num_heads)),
        din_att_hidden_units=_tupled(
            d.get("din_att_hidden_units"), base.din_att_hidden_units
        ),
        masknet_blocks=int(d.get("masknet_blocks", base.masknet_blocks)),
        masknet_block_dim=int(d.get("masknet_block_dim", base.masknet_block_dim)),
        masknet_agg_ratio=float(d.get("masknet_agg_ratio", base.masknet_agg_ratio)),
        attn_num_heads=int(d.get("attn_num_heads", base.attn_num_heads)),
        attn_num_layers=int(d.get("attn_num_layers", base.attn_num_layers)),
        attn_dropout=float(d.get("attn_dropout", base.attn_dropout)),
        use_pallas=bool(d.get("use_pallas", base.use_pallas)),
        tower_dtype=str(d.get("tower_dtype", base.tower_dtype)),
    )


def train_config_from_dict(d: Mapping[str, Any]) -> TrainConfig:
    base = TrainConfig()
    return TrainConfig(
        batch_size=int(d.get("batch_size", base.batch_size)),
        epochs=int(d.get("epochs", base.epochs)),
        optimizer=str(d.get("optimizer", base.optimizer)).lower(),
        table_optimizer=str(d.get("table_optimizer", base.table_optimizer)).lower(),
        table_lr_scale=(
            None
            if (_tls := d.get("table_lr_scale", base.table_lr_scale)) is None
            else float(_tls)
        ),
        learning_rate=float(d.get("learning_rate", base.learning_rate)),
        weight_decay=float(d.get("weight_decay", base.weight_decay)),
        lr_schedule=str(d.get("lr_schedule", base.lr_schedule)).lower(),
        onecycle_peak_factor=float(
            d.get("onecycle_peak_factor", base.onecycle_peak_factor)
        ),
        onecycle_pct_start=float(d.get("onecycle_pct_start", base.onecycle_pct_start)),
        onecycle_div_factor=float(
            d.get("onecycle_div_factor", base.onecycle_div_factor)
        ),
        onecycle_final_div_factor=float(
            d.get("onecycle_final_div_factor", base.onecycle_final_div_factor)
        ),
        grad_clip_norm=float(d.get("grad_clip_norm", base.grad_clip_norm)),
        seed=int(d.get("seed", base.seed)),
        shuffle=bool(d.get("shuffle", base.shuffle)),
        monitor=str(d.get("monitor", base.monitor)).lower(),
        monitor_mode=str(d.get("monitor_mode", base.monitor_mode)).lower(),
        log_every=int(d.get("log_every", base.log_every)),
        steps_per_dispatch=int(
            d.get("steps_per_dispatch", base.steps_per_dispatch)
        ),
        eval_batch_size=int(d.get("eval_batch_size", base.eval_batch_size)),
        num_eval_threshold_bins=int(
            d.get("num_eval_threshold_bins", base.num_eval_threshold_bins)
        ),
        save_best_only=bool(d.get("save_best_only", base.save_best_only)),
        tensorboard=bool(d.get("tensorboard", base.tensorboard)),
        checkpoint_dir=str(d.get("checkpoint_dir", base.checkpoint_dir)),
        keep_checkpoints=int(d.get("keep_checkpoints", base.keep_checkpoints)),
        checkpoint_every=int(d.get("checkpoint_every", base.checkpoint_every)),
        async_checkpointing=bool(
            d.get("async_checkpointing", base.async_checkpointing)
        ),
        compute_dtype=str(d.get("compute_dtype", base.compute_dtype)),
        param_dtype=str(d.get("param_dtype", base.param_dtype)),
        rng_impl=str(d.get("rng_impl", base.rng_impl)).lower(),
    )
