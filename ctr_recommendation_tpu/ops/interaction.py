"""FiBiNET interaction block: SENet + bilinear + concat, with kernel dispatch.

``senet_bilinear_concat`` is the hot op of the FiBiNET family: given the
field stack X (B, F, E) it produces the DNN-tower input
``[SENet(X).flat ‖ Bilinear(SENet(X)).flat]`` of width (F + F(F-1)/2) * E
(model_fibinet.py:185-194). The jnp path lets XLA fuse; the Pallas path
(ops/pallas/interaction.py) keeps X resident in VMEM for the whole block so
HBM sees exactly one read of X and one write of the output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctr_recommendation_tpu.ops import bilinear as bilinear_ops
from ctr_recommendation_tpu.ops import senet as senet_ops


def senet_bilinear_concat_reference(
    senet_params: dict,
    bilinear_params: dict,
    x: jax.Array,
    *,
    bilinear_type: str = "all",
) -> jax.Array:
    """Pure-jnp reference. x (B, F, E) -> (B, (F + F(F-1)/2) * E)."""
    b = x.shape[0]
    s = senet_ops.apply(senet_params, x)
    p = bilinear_ops.apply(bilinear_params, s, bilinear_type)
    return jnp.concatenate([s.reshape(b, -1), p.reshape(b, -1)], axis=-1)


def senet_bilinear_concat(
    senet_params: dict,
    bilinear_params: dict,
    x: jax.Array,
    *,
    bilinear_type: str = "all",
    use_pallas: bool = False,
    train: bool = False,
) -> jax.Array:
    # The Pallas kernel is a serving-path win (one HBM read of X); its VJP
    # delegates to the jnp reference, which RECOMPUTES the forward — so under
    # value_and_grad the kernel would make training do the interaction forward
    # twice per step for no measured fwd win (PERFORMANCE.md microbench:
    # 1.00x vs XLA at bs 4096). Training therefore always takes the jnp path,
    # which XLA fuses once through fwd+bwd.
    if use_pallas and not train:
        from ctr_recommendation_tpu.ops.pallas.interaction import (
            fused_senet_bilinear_concat,
        )

        return fused_senet_bilinear_concat(
            senet_params, bilinear_params, x, bilinear_type=bilinear_type
        )
    return senet_bilinear_concat_reference(
        senet_params, bilinear_params, x, bilinear_type=bilinear_type
    )
