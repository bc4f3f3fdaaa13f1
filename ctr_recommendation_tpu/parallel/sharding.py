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


def opt_state_specs(opt_state: Any, params_spec_tree: Any, params: Any) -> Any:
    """Give optimizer-state leaves the spec of the param they mirror (matched
    by shape identity inside tree prefixes), replicating everything else."""
    flat_params, _ = jax.tree.flatten(params)
    flat_specs, _ = jax.tree.flatten(
        params_spec_tree, is_leaf=lambda x: isinstance(x, P)
    )
    shape_to_spec: dict[tuple, Any] = {}
    for p, s in zip(flat_params, flat_specs):
        key = (p.shape, str(p.dtype))
        # only map unambiguous, sharded shapes; default replicate
        if key in shape_to_spec and shape_to_spec[key] != s:
            shape_to_spec[key] = P()
        else:
            shape_to_spec.setdefault(key, s)

    def leaf_spec(x):
        if hasattr(x, "shape"):
            return shape_to_spec.get((x.shape, str(x.dtype)), P())
        return P()

    return jax.tree.map(leaf_spec, opt_state)
