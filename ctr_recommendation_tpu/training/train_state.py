"""TrainState: params + mutable model state + optimizer state + step."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    model_state: Any  # BatchNorm running stats etc.
    opt_state: optax.OptState
    # Sparse-table optimizer state (training/sparse.py); empty dict when the
    # tables ride the dense optax chain.
    table_opt_state: Any = ()

    @classmethod
    def create(
        cls,
        params,
        model_state,
        tx: optax.GradientTransformation,
        table_opt_state: Any = (),
    ):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state,
            opt_state=tx.init(params),
            table_opt_state=table_opt_state,
        )
