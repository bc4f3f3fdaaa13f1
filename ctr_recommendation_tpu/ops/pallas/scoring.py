"""Fused batched-scoring Pallas kernel: interaction + tower in one HBM pass.

The serving hot path for the FiBiNET family (BASELINE.json: "batched scoring
p50 latency"). Per batch tile, entirely in VMEM:

    SENet -> bilinear -> concat (TB, (F+P)E)
    -> ReLU(c @ W1 + b1) -> ReLU(h1 @ W2 + b2) -> sigmoid(h2 @ w3 + b3)

The tower must be BatchNorm-folded first (ops/mlp.fold_batch_norm) so each
layer is a plain affine — inference-exact (eval-mode BN is affine). Unfused,
XLA writes the 2688-wide concat + both hidden activations to HBM; fused, HBM
sees one read of X (B,F,E) and one write of probs (B,1). Weight blocks use a
constant index map so Mosaic keeps them VMEM-resident across the grid.

VMEM budget @ TB=256, E=128, F=6 (fp32): X 0.75 MB + W1 5.25 MB + concat
2.63 MB + hiddens 0.75 MB + W_bi/W2 ~0.6 MB ≈ 10 MB < 16 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctr_recommendation_tpu.ops.bilinear import pair_indices


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    x_ref, sw1_ref, sb1_ref, sw2_ref, sb2_ref, wbi_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    out_ref, concat_ref, *, num_fields, bilinear_type,
):
    # compute dtype = x_ref's dtype (bf16 by default at serving, matching
    # the tower_dtype="compute" training/eval path); every MXU dot
    # accumulates in fp32 via preferred_element_type, and the SENet gate +
    # sigmoid head stay fp32. bf16 operands run the MXU at ~4-8x the fp32
    # rate — the fp32 kernel at MicroLens serving shapes is compute-bound
    # (26.8 GFLOP @ bs 8192, measured 177 us vs the ~270 us fp32
    # speed-of-light), so this is where the headroom is.
    cd = x_ref.dtype
    x = x_ref[:]  # (TB, F*E) — 2-D so no sublane padding of the tiny F dim
    tb = x.shape[0]
    f, e = num_fields, x.shape[1] // num_fields
    xs = [x[:, fi * e : (fi + 1) * e] for fi in range(f)]  # per-field (TB, E)
    # --- SENet (tiny: F-wide matmuls; fp32) ---
    z = jnp.stack(
        [jnp.mean(xf.astype(jnp.float32), axis=-1) for xf in xs], axis=-1
    )  # (TB, F)
    a = jnp.maximum(jnp.dot(z, sw1_ref[:], preferred_element_type=jnp.float32) + sb1_ref[:], 0.0)
    w = jax.nn.sigmoid(jnp.dot(a, sw2_ref[:], preferred_element_type=jnp.float32) + sb2_ref[:])
    s = [xs[fi] * w[:, fi : fi + 1].astype(cd) for fi in range(f)]
    # --- bilinear + concat into VMEM scratch ---
    i_idx, j_idx = pair_indices(num_fields)
    for fi in range(num_fields):
        concat_ref[:, fi * e : (fi + 1) * e] = s[fi]
    base = num_fields * e
    if bilinear_type == "all":
        v = [
            jnp.dot(s[fi], wbi_ref[:], preferred_element_type=jnp.float32).astype(cd)
            for fi in range(num_fields)
        ]
        for k, (i, j) in enumerate(zip(i_idx, j_idx)):
            concat_ref[:, base + k * e : base + (k + 1) * e] = s[int(i)] * v[int(j)]
    else:
        vs = [
            jnp.dot(s[fi], wbi_ref[fi], preferred_element_type=jnp.float32).astype(cd)
            for fi in range(num_fields - 1)
        ]
        for k, (i, j) in enumerate(zip(i_idx, j_idx)):
            concat_ref[:, base + k * e : base + (k + 1) * e] = vs[int(i)] * s[int(j)]
    # --- folded tower ---
    c = concat_ref[:]
    h1 = jnp.maximum(jnp.dot(c, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0)
    h2 = jnp.maximum(
        jnp.dot(h1.astype(cd), w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:], 0.0
    )
    logit = jnp.dot(h2.astype(cd), w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:]
    out_ref[:] = jax.nn.sigmoid(logit)


def _score_forward(
    x, sw1, sb1, sw2, sb2, wbi, w1, b1, w2, b2, w3, b3,
    *, bilinear_type, block_b, compute_dtype,
):
    """Flat-array driver over the (local) batch: pad, reshape 2-D, run the
    grid. Used both unpartitioned and as the per-shard lowering of the
    custom_partitioning wrapper (see interaction.py's note: pallas_call has
    no SPMD rule of its own)."""
    b, f, e = x.shape
    num_pairs = f * (f - 1) // 2
    cdim = (f + num_pairs) * e

    block_b = min(block_b, max(8, 1 << (b - 1).bit_length()))
    pad_b = (-b) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
    padded_b = b + pad_b
    # 2-D (B, F*E) kernel input: row-major bitcast (free), and the tiny F
    # dim never hits the sublane tile (F=6 would pad to 8 fp32 / 16 bf16
    # sublanes as a 3-D block — measured 27% slower fp32, 70% slower bf16)
    x = x.reshape(padded_b, f * e)
    h1_dim, h2_dim = w1.shape[1], w2.shape[1]

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, num_fields=f, bilinear_type=bilinear_type),
        out_shape=jax.ShapeDtypeStruct((padded_b, 1), jnp.float32),
        grid=(padded_b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, f * e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec(sw1.shape),
            const_spec(sb1.shape),
            const_spec(sw2.shape),
            const_spec(sb2.shape),
            const_spec(wbi.shape),
            const_spec(w1.shape),
            const_spec(b1.shape),
            const_spec(w2.shape),
            const_spec(b2.shape),
            const_spec(w3.shape),
            const_spec(b3.shape),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_b, cdim), jnp.dtype(compute_dtype))],
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_b * (f * e * e + cdim * h1_dim + h1_dim * h2_dim + h2_dim),
            bytes_accessed=4 * (padded_b * f * e + cdim * h1_dim + padded_b),
            transcendentals=2 * padded_b,
        ),
        interpret=_interpret(),
    )(
        x.astype(compute_dtype),
        sw1.astype(jnp.float32), sb1.astype(jnp.float32),
        sw2.astype(jnp.float32), sb2.astype(jnp.float32),
        wbi.astype(compute_dtype),
        w1.astype(compute_dtype), b1.astype(jnp.float32),
        w2.astype(compute_dtype), b2.astype(jnp.float32),
        w3.astype(compute_dtype), b3.astype(jnp.float32),
    )
    return out[:b, 0]


@functools.lru_cache(maxsize=None)
def _partitioned_score(bilinear_type: str, block_b: int, compute_dtype_name: str):
    """Batch-shard x, replicate every weight, run the kernel per shard."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    run = functools.partial(
        _score_forward,
        bilinear_type=bilinear_type,
        block_b=block_b,
        compute_dtype=jnp.dtype(compute_dtype_name),
    )

    @custom_partitioning
    def fused(*args):
        return run(*args)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        b_axis = _batch_axis(arg_shapes)
        x_sh = NamedSharding(mesh, P(b_axis, None, None))
        repl = NamedSharding(mesh, P())
        out_sh = NamedSharding(mesh, P(b_axis))
        return mesh, run, out_sh, (x_sh,) + (repl,) * 11

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes)))

    wbi_rule = "g eA eB" if bilinear_type == "each" else "eA eB"
    fused.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=(
            f"b f e, fA r, rA, rW fB, fC, {wbi_rule}, "
            "c h1, h1A, h1B h2, h2A, h2B u, uA -> b"
        ),
    )
    return fused


def fused_score(
    senet_params: dict,
    bilinear_params: dict,
    folded_mlp: dict,
    x: jax.Array,
    *,
    bilinear_type: str = "all",
    block_b: int = 512,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """x (B, F, E) -> click probabilities (B,). folded_mlp comes from
    ops.mlp.fold_batch_norm and must have exactly 2 hidden layers (the
    reference tower, model_fibinet.py:125-135). ``compute_dtype`` is the MXU
    operand dtype (weights and activations; fp32 accumulation either way) —
    serving passes bf16 when the model's tower_dtype is "compute", mirroring
    the training tower."""
    if len(folded_mlp["layers"]) != 2:
        raise ValueError("fused_score expects a 2-hidden-layer tower")
    f = x.shape[1]
    # budget-cap the tile for wide embeddings (the 512 default was tuned
    # at E=128; see interaction._vmem_block_cap for the measured OOM)
    from ctr_recommendation_tpu.ops.pallas.interaction import _vmem_block_cap

    block_b = min(block_b, _vmem_block_cap(f, x.shape[2]))
    fc1, fc2 = senet_params["fc1"], senet_params["fc2"]
    reduced = fc1["w"].shape[1]
    sb1 = fc1.get("b", jnp.zeros((reduced,)))
    sb2 = fc2.get("b", jnp.zeros((f,)))
    wbi = bilinear_params["w"] if bilinear_type == "all" else bilinear_params["w_each"]
    l1 = folded_mlp["layers"][0]["linear"]
    l2 = folded_mlp["layers"][1]["linear"]
    l3 = folded_mlp["out"]
    return _partitioned_score(bilinear_type, block_b, jnp.dtype(compute_dtype).name)(
        x, fc1["w"], sb1, fc2["w"], sb2, wbi,
        l1["w"], l1["b"], l2["w"], l2["b"], l3["w"], l3["b"],
    )
