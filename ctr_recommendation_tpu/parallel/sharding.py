"""Sharding rules for the train state and batches.

Embedding tables (``params["trunk"]["tables"][*]``) are row-sharded
P(model_axis, None); every other parameter is replicated; batches are
P(data_axis) on the leading dim. Optimizer state inherits the param
shardings automatically because optax states mirror the param tree structure
(moments have the same shapes), handled by tree-mapping over matching leaves.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis))


def batch_specs(batch: dict, data_axis: str = "data") -> dict:
    return {k: P(data_axis) for k in batch}


def param_specs(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """PartitionSpec tree matching the params tree: tables row-sharded iff
    the model axis has >1 device, all else replicated."""
    shard_tables = mesh.shape[model_axis] > 1

    def walk(tree, in_tables: bool):
        if isinstance(tree, dict):
            return {
                k: walk(v, in_tables or k == "tables") for k, v in tree.items()
            }
        if isinstance(tree, (list, tuple)):
            t = [walk(v, in_tables) for v in tree]
            return type(tree)(t)
        # leaf
        if in_tables and shard_tables and hasattr(tree, "ndim") and tree.ndim == 2:
            return P(model_axis, None)
        return P()

    return walk(params, False)


def tree_shardings(spec_tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def put_global(tree: Any, shardings: Any) -> Any:
    """Place host values onto (possibly cross-process) shardings.

    Single-process: plain ``device_put``. Multi-controller: ``device_put``
    cannot target devices this process does not own, so each process
    supplies its addressable shards via ``make_array_from_callback`` —
    valid because every process holds the SAME host value (same seed/init),
    the standard multi-host initialization contract."""
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, s):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])

    return jax.tree.map(put, tree, shardings)


def opt_state_specs(opt_state: Any, params_spec_tree: Any, params: Any) -> Any:
    """Give optimizer-state subtrees that mirror the params tree (optax
    moments: Adam mu/nu, Adagrad accumulators) the param specs, and
    replicate every other leaf (step counters etc.)."""
    params_treedef = jax.tree.structure(params)

    def is_params_like(x: Any) -> bool:
        try:
            return jax.tree.structure(x) == params_treedef
        except Exception:
            return False

    def rec(node: Any) -> Any:
        if is_params_like(node):
            return params_spec_tree
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[rec(c) for c in node])
        if isinstance(node, tuple):
            return tuple(rec(c) for c in node)
        if isinstance(node, list):
            return [rec(c) for c in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return P()

    return rec(opt_state)
