"""Microbenchmarks: Pallas kernels vs their XLA-fused jnp equivalents.

Prints one JSON line per comparison. Run on TPU; informs which path the
trunk/predictor should select per shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ctr_recommendation_tpu.utils import compilation_cache


def _value_read(x):
    """Honest completion barrier: block_until_ready can return early through
    this environment's remote tunnel; a device->host value read cannot."""
    leaf = jax.tree.leaves(x)[0]
    return float(leaf.ravel()[0])


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        _value_read(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _value_read(out)  # device programs serialize; last read bounds them all
    return (time.perf_counter() - t0) / iters


def main() -> None:
    compilation_cache.enable()
    from ctr_recommendation_tpu.ops import bilinear, interaction, mlp, senet
    from ctr_recommendation_tpu.ops.pallas.interaction import (
        fused_senet_bilinear_concat,
    )
    from ctr_recommendation_tpu.ops.pallas.scoring import fused_score

    results = []

    # (the round-1 pipelined-DMA gather kernel was retired: measured 1.03x
    # vs XLA's gather, which is already DMA-bound — see docs/PERFORMANCE.md)

    # ---- fused interaction vs jnp reference ----
    v, e, b = 91718, 128, 4096
    f = 6
    sp = senet.init(jax.random.key(2), f, 2)
    bp = bilinear.init(jax.random.key(3), e, f, "all")
    x = jax.random.normal(jax.random.key(4), (b, f, e))
    jnp_fn = jax.jit(
        lambda s_, b_, x_: interaction.senet_bilinear_concat_reference(
            s_, b_, x_, bilinear_type="all"
        )
    )
    pls_fn = jax.jit(
        lambda s_, b_, x_: fused_senet_bilinear_concat(s_, b_, x_, bilinear_type="all")
    )
    t_jnp = timeit(jnp_fn, sp, bp, x)
    t_pls = timeit(pls_fn, sp, bp, x)
    results.append(
        {
            "bench": "senet_bilinear_concat",
            "shape": f"({b},{f},{e})",
            "xla_us": round(t_jnp * 1e6, 1),
            "pallas_us": round(t_pls * 1e6, 1),
            "speedup": round(t_jnp / t_pls, 3),
        }
    )

    # bf16 input — the dtype the trunk actually feeds the eval path
    xh = x.astype(jnp.bfloat16)
    t_jnp_h = timeit(jnp_fn, sp, bp, xh)
    t_pls_h = timeit(pls_fn, sp, bp, xh)
    results.append(
        {
            "bench": "senet_bilinear_concat_bf16",
            "shape": f"({b},{f},{e})",
            "xla_us": round(t_jnp_h * 1e6, 1),
            "pallas_us": round(t_pls_h * 1e6, 1),
            "speedup": round(t_jnp_h / t_pls_h, 3),
        }
    )

    # ---- fused scoring vs unfused (interaction + folded tower) ----
    cdim = (f + f * (f - 1) // 2) * e
    mp_params, mp_state = mlp.init(jax.random.key(5), cdim, [512, 256], batch_norm=True)
    h = interaction.senet_bilinear_concat_reference(sp, bp, x, bilinear_type="all")
    _, mp_state = mlp.apply(mp_params, mp_state, h, train=True)
    folded = mlp.fold_batch_norm(mp_params, mp_state)
    empty_state = {"layers": [{} for _ in folded["layers"]]}

    def unfused(s_, b_, m_, x_):
        hh = interaction.senet_bilinear_concat_reference(s_, b_, x_, bilinear_type="all")
        logits, _ = mlp.apply(m_, empty_state, hh, train=False)
        return jax.nn.sigmoid(logits[:, 0])

    unfused_j = jax.jit(unfused)
    fused_j = jax.jit(
        lambda s_, b_, m_, x_: fused_score(s_, b_, m_, x_, bilinear_type="all")
    )
    t_unf = timeit(unfused_j, sp, bp, folded, x)
    t_fus = timeit(fused_j, sp, bp, folded, x)
    results.append(
        {
            "bench": "fused_scoring",
            "shape": f"({b},{f},{e})->probs",
            "xla_us": round(t_unf * 1e6, 1),
            "pallas_us": round(t_fus * 1e6, 1),
            "speedup": round(t_unf / t_fus, 3),
        }
    )

    for r in results:
        r["backend"] = jax.default_backend()
        print(json.dumps(r))


if __name__ == "__main__":
    main()
