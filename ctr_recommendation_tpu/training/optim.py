"""Optimizers + LR schedules (optax), matching the reference's training recipe.

The logged run (SURVEY §6) used torch.optim.Adam(lr, weight_decay=1e-5) —
L2-coupled decay, NOT decoupled AdamW (train_fibinet.py:78 wins over the
yaml's "adamw") — OneCycleLR(max_lr=10*lr, pct_start=0.3, div_factor=25,
final_div_factor=1000, cosine anneal) stepped per batch
(train_fibinet.py:83-92,122), and global-norm grad clipping at 10.0
(train_fibinet.py:119). All three reproduced; "adamw" (decoupled) and
"adagrad" (the classic sparse-table optimizer, BASELINE.json north star) are
also provided.
"""

from __future__ import annotations

import optax

from ctr_recommendation_tpu.config.schema import TrainConfig


def make_schedule(cfg: TrainConfig, total_steps: int) -> optax.Schedule:
    if cfg.lr_schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.lr_schedule == "cosine":
        # warmup-cosine, reusing the onecycle knobs: warm from lr/div_factor
        # to lr over pct_start of the run, cosine-decay to lr/final_div
        total = max(total_steps, 4)
        return optax.warmup_cosine_decay_schedule(
            init_value=cfg.learning_rate / cfg.onecycle_div_factor,
            peak_value=cfg.learning_rate,
            warmup_steps=max(1, int(cfg.onecycle_pct_start * total)),
            decay_steps=total,
            end_value=cfg.learning_rate / cfg.onecycle_final_div_factor,
        )
    if cfg.lr_schedule == "onecycle":
        # optax's onecycle divides by interval widths int(pct_start * T) and
        # T - that; T <= 3 makes one interval zero-width and every lr NaN —
        # silently poisoning all params on step one. Clamp so both phases
        # are non-empty (only reachable in tiny smoke runs).
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 4),
            peak_value=cfg.learning_rate * cfg.onecycle_peak_factor,
            pct_start=cfg.onecycle_pct_start,
            div_factor=cfg.onecycle_div_factor,
            final_div_factor=cfg.onecycle_final_div_factor,
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(
    cfg: TrainConfig, total_steps: int, *, sparse_tables: bool = False
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """sparse_tables=True: the embedding tables are updated by the sparse
    touched-rows path (training/sparse.py), so this chain (a) allocates no
    optimizer state for them (multi_transform + set_to_zero) and (b) omits
    the global-norm clip — the train step clips dense grads and row grads
    JOINTLY before both updates, preserving the reference's
    clip-over-all-parameters semantics (train_fibinet.py:119)."""
    schedule = make_schedule(cfg, total_steps)
    parts = []
    if not sparse_tables and cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    name = cfg.optimizer
    if name == "adam":
        # torch Adam semantics: L2 added to the gradient BEFORE the moments.
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif name == "adamw":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
    elif name == "adagrad":
        # DELIBERATELY decoupled (AdamW-style) decay: added after the rss
        # scaling so decayed weights never enter the accumulator. This
        # differs from torch.optim.Adagrad(weight_decay=...), which couples
        # L2 into the gradient — there is no reference adagrad run to
        # reproduce (the logged run is Adam), and the sparse TableOptimizer
        # mirrors this exact ordering for dense/sparse parity
        # (training/sparse.py update()).
        # initial_accumulator_value=0 (torch Adagrad's default, NOT optax's
        # 0.1): a 0.1 floor swamps CTR-scale gradients (~1e-3) and froze the
        # embedding tables — see training/sparse.py rss_init for the
        # round-3 measurement.
        parts.append(optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10))
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    parts.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*parts)
    if sparse_tables:
        tx = optax.multi_transform(
            {"dense": tx, "table": optax.set_to_zero()}, _table_labels
        )
    return tx, schedule


def _table_labels(params):
    """Label tree for multi_transform: leaves under a 'tables' key are
    handled by the sparse path, everything else by the dense chain."""
    import jax

    def label(path, _leaf):
        keys = {
            getattr(p, "key", getattr(p, "name", None)) for p in path
        }
        return "table" if "tables" in keys else "dense"

    return jax.tree_util.tree_map_with_path(label, params)
