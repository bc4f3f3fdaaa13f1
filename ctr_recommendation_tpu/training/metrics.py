"""Evaluation metrics, computed on device.

The reference pulls every valid batch to host numpy and calls sklearn
(train_fibinet.py:140-145, utils.py:18-32). Here AUC and logloss run on the
TPU over accumulated device arrays:

* ``auc``: exact tie-aware Mann-Whitney rank AUC — matches
  ``sklearn.roc_auc_score`` to float precision (SURVEY §7 hard part (e)
  requires ~1e-4 agreement so best-checkpoint selection is identical); falls
  back to 0.5 when only one class is present (utils.py:23-27 behavior).
* ``binned_auc``: O(bins) streaming histogram AUC for very large eval sets.
* ``logloss``: clipped binary cross-entropy matching sklearn's log_loss
  (utils.py:29-32; eps 1e-15).

All take an optional per-example ``weight`` so padded tail batches drop out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def auc(labels: jax.Array, scores: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    """Exact ROC AUC with average ranks for ties (weights must be 0/1)."""
    labels = labels.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    n = labels.shape[0]
    if weight is None:
        weight = jnp.ones_like(labels)
    weight = weight.astype(jnp.float32)
    # Push masked-out entries to -inf so they take the lowest ranks and get
    # zero weight in the sums.
    neg_inf = jnp.finfo(jnp.float32).min
    s = jnp.where(weight > 0, scores, neg_inf)

    order = jnp.argsort(s)
    sorted_s = s[order]
    # rank position (1-based) of each sorted element
    pos = jnp.arange(1, n + 1, dtype=jnp.float32)
    # tie groups: average rank within equal-score runs
    # segment ids increase when the score changes
    new_group = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sorted_s[1:] != sorted_s[:-1]).astype(jnp.int32)]
    )
    group = jnp.cumsum(new_group) - 1  # 0-based group index per sorted elem
    num_groups = n  # upper bound
    group_sum = jax.ops.segment_sum(pos, group, num_segments=num_groups)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(pos), group, num_segments=num_groups)
    avg_rank_per_group = group_sum / jnp.maximum(group_cnt, 1.0)
    ranks_sorted = avg_rank_per_group[group]
    ranks = jnp.zeros_like(ranks_sorted).at[order].set(ranks_sorted)

    w_pos = weight * labels
    w_neg = weight * (1.0 - labels)
    n_pos = jnp.sum(w_pos)
    n_neg = jnp.sum(w_neg)
    # With masked entries ranked lowest, their exclusion just shifts positive
    # ranks by a constant = number of masked entries *below*; correct by
    # ranking only within valid mass: subtract the masked count.
    n_masked = jnp.sum(1.0 - weight)
    rank_sum_pos = jnp.sum(w_pos * (ranks - n_masked))
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), 0.5)


@functools.partial(jax.jit, static_argnames=("num_bins",))
def binned_auc_update(
    hist_pos: jax.Array,
    hist_neg: jax.Array,
    labels: jax.Array,
    probs: jax.Array,
    weight: jax.Array | None = None,
    *,
    num_bins: int = 8192,
):
    """Accumulate score histograms for streaming AUC (probs in [0,1])."""
    labels = labels.astype(jnp.float32)
    if weight is None:
        weight = jnp.ones_like(labels)
    bins = jnp.clip((probs * num_bins).astype(jnp.int32), 0, num_bins - 1)
    hist_pos = hist_pos.at[bins].add(weight * labels)
    hist_neg = hist_neg.at[bins].add(weight * (1.0 - labels))
    return hist_pos, hist_neg


@jax.jit
def binned_auc_finalize(hist_pos: jax.Array, hist_neg: jax.Array) -> jax.Array:
    """AUC from score histograms (trapezoidal over bins; ties averaged)."""
    n_pos = jnp.sum(hist_pos)
    n_neg = jnp.sum(hist_neg)
    # P(neg < pos) + 0.5 P(neg == pos), summing over positive bins
    cum_neg_below = jnp.concatenate(
        [jnp.zeros((1,)), jnp.cumsum(hist_neg)[:-1]]
    )
    u = jnp.sum(hist_pos * (cum_neg_below + 0.5 * hist_neg))
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), 0.5)


def group_auc(labels, scores, groups) -> float:
    """gAUC: impression-weighted mean of per-group (e.g. per-user) AUC over
    groups containing both classes — the standard CTR ranking metric the
    plain AUC hides (a model can rank across users well but within users
    badly). Host-side numpy (variable group sizes are hostile to jit; eval
    runs once per epoch). Tie-aware (average ranks), sklearn-parity tested.

    Returns 0.5 when no group has both classes (global-AUC fallback parity).
    """
    import numpy as np

    labels = np.asarray(labels, np.float64)
    scores = np.asarray(scores, np.float64)
    groups = np.asarray(groups)
    order = np.argsort(groups, kind="stable")
    g, l, s = groups[order], labels[order], scores[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]]) if len(g) else np.array([], int)
    ends = np.r_[starts[1:], len(g)] if len(starts) else np.array([], int)

    def _avg_ranks(a: "np.ndarray") -> "np.ndarray":
        o = np.argsort(a, kind="mergesort")
        sa = a[o]
        ranks = np.empty(len(a))
        # average rank within runs of equal values
        boundary = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1], True])
        for i in range(len(boundary) - 1):
            lo, hi = boundary[i], boundary[i + 1]
            ranks[o[lo:hi]] = 0.5 * (lo + 1 + hi)
        return ranks

    num = 0.0
    den = 0.0
    for a, b in zip(starts, ends):
        li = l[a:b]
        n_pos = float(li.sum())
        n_neg = (b - a) - n_pos
        if n_pos == 0 or n_neg == 0:
            continue
        ranks = _avg_ranks(s[a:b])
        u = float(ranks[li > 0].sum()) - n_pos * (n_pos + 1.0) / 2.0
        num += (b - a) * (u / (n_pos * n_neg))
        den += b - a
    return num / den if den else 0.5


@jax.jit
def logloss(labels: jax.Array, probs: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    labels = labels.astype(jnp.float32)
    # eps must be representable around 1.0 in fp32: 1 - 1e-15 rounds to 1.0
    # and log(0) = -inf; 1e-7 is the float32-safe analogue of sklearn's clip.
    p = jnp.clip(probs.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    ll = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    if weight is None:
        return jnp.mean(ll)
    w = weight.astype(jnp.float32)
    return jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
