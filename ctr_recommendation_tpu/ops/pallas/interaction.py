"""Fused SENet + bilinear + concat Pallas TPU kernel.

Computes the whole FiBiNET interaction block for a batch tile while the field
stack stays resident in VMEM:

    z = mean_E(X); w = sigmoid(relu(z@W1+b1)@W2+b2); S = X * w
    V = S @ W  (or per-field W_i);  P_k = S[i_k] * V[j_k]
    out = [S.flat ‖ P.flat]   (B, (F + F(F-1)/2) * E)

Unfused, XLA materializes S (B,F,E), V (B,F,E) and P (B,P,E) in HBM between
ops; fused, HBM traffic is one read of X and one write of out — the block is
bandwidth-bound at E=128/F=6 (the only matmul is the (B·F,E)x(E,E)
projection), so this ~2.5x HBM traffic cut is the win.

Forward AND backward run in Pallas (``jax.custom_vjp``): the backward
kernel recomputes the cheap intermediates (SENet gate, projections) from x
in VMEM and produces dx plus per-tile partial weight gradients accumulated
across the sequential batch grid — HBM traffic is one read of g and x and
one write of dx, instead of the unfused VJP's materialized S/V/dS/dV
round-trips. Under a sharded jit the weight-grad partials are psum'd over
the batch axis inside the custom_partitioning lowering. On non-TPU backends
the kernels run in interpreter mode so CPU tests exercise the same code
path.

Multi-device: a ``pallas_call`` has no built-in SPMD partitioning rule, so
the kernel is wrapped in ``jax.experimental.custom_partitioning`` — the
batch grid is embarrassingly parallel, so under a sharded jit each device
runs the kernel on its local batch shard (weights forced replicated, x
forced batch-sharded; the partitioner inserts any needed reshards). This is
what lets ``use_pallas`` survive a dp>1 mesh instead of silently degrading
(VERDICT r2 item 2).

Reference behavior being fused: model_fibinet.py:24-35 (SENet), :60-89
(bilinear), :191-194 (concat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctr_recommendation_tpu.ops.bilinear import pair_indices

_LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel_all(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w_ref, out_ref, *, num_fields):
    """bilinear_type="all" tile kernel. x_ref: (TB, F*E) — 2-D layout so the
    tiny F dim never hits the sublane tile (the 3-D (TB, F, E) block padded
    F=6 to 8 fp32 / 16 bf16 sublanes; measured in the scoring kernel:
    27%/70% slower — same trick here, docs/PERFORMANCE.md round 2). Operand
    dtype = x's dtype (bf16 at serving); accumulation fp32 via
    preferred_element_type; SENet gate and sigmoid stay fp32."""
    cd = x_ref.dtype
    x = x_ref[:]  # (TB, F*E)
    e = x.shape[1] // num_fields
    xs = [x[:, fi * e : (fi + 1) * e] for fi in range(num_fields)]
    # --- SENet (fp32) ---
    z = jnp.stack(
        [jnp.mean(xf.astype(jnp.float32), axis=-1) for xf in xs], axis=-1
    )  # (TB, F)
    a = jnp.maximum(
        jnp.dot(z, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0
    )
    w = jax.nn.sigmoid(
        jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    )  # (TB, F)
    s = [xs[fi] * w[:, fi : fi + 1].astype(cd) for fi in range(num_fields)]
    # --- bilinear projection: per-field (TB, E) @ (E, E) MXU dots ---
    v = [
        jnp.dot(s[fi], w_ref[:], preferred_element_type=jnp.float32).astype(cd)
        for fi in range(num_fields)
    ]
    # --- concat [S.flat || pairs] via static per-field column writes ---
    for f in range(num_fields):
        out_ref[:, f * e : (f + 1) * e] = s[f].astype(jnp.float32)
    i_idx, j_idx = pair_indices(num_fields)
    base = num_fields * e
    for k, (i, j) in enumerate(zip(i_idx, j_idx)):
        out_ref[:, base + k * e : base + (k + 1) * e] = (
            s[int(i)] * v[int(j)]
        ).astype(jnp.float32)


def _kernel_each(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w_ref, out_ref, *, num_fields):
    """bilinear_type="each": w_ref is (F-1, E, E); v_i = s_i @ W_i."""
    cd = x_ref.dtype
    x = x_ref[:]  # (TB, F*E)
    e = x.shape[1] // num_fields
    xs = [x[:, fi * e : (fi + 1) * e] for fi in range(num_fields)]
    z = jnp.stack(
        [jnp.mean(xf.astype(jnp.float32), axis=-1) for xf in xs], axis=-1
    )
    a = jnp.maximum(
        jnp.dot(z, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0
    )
    w = jax.nn.sigmoid(
        jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    )
    s = [xs[fi] * w[:, fi : fi + 1].astype(cd) for fi in range(num_fields)]
    for f in range(num_fields):
        out_ref[:, f * e : (f + 1) * e] = s[f].astype(jnp.float32)
    v = [
        jnp.dot(s[f], w_ref[f], preferred_element_type=jnp.float32).astype(cd)
        for f in range(num_fields - 1)
    ]
    i_idx, j_idx = pair_indices(num_fields)
    base = num_fields * e
    for k, (i, j) in enumerate(zip(i_idx, j_idx)):
        out_ref[:, base + k * e : base + (k + 1) * e] = (
            v[int(i)] * s[int(j)]
        ).astype(jnp.float32)


def _pallas_forward(x, w1, b1, w2, b2, w_bi, *, bilinear_type, block_b):
    """Flat-array kernel driver: pads the (local) batch to a block multiple
    and runs the grid. Called both unpartitioned and as the per-shard
    lowering of the custom_partitioning wrapper below."""
    b, f, e = x.shape
    num_pairs = f * (f - 1) // 2
    out_dim = (f + num_pairs) * e

    block_b = min(block_b, max(8, 1 << (b - 1).bit_length()))
    pad_b = (-b) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
    padded_b = b + pad_b
    # 2-D (B, F*E) kernel input: free row-major bitcast; see _kernel_all
    x = x.reshape(padded_b, f * e)
    # MXU operand dtype follows x (bf16 on the serving/eval path; fp32
    # accumulation inside the kernel either way)
    cd = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32

    kernel = _kernel_all if bilinear_type == "all" else _kernel_each

    grid = (padded_b // block_b,)
    out = pl.pallas_call(
        functools.partial(kernel, num_fields=f),
        out_shape=jax.ShapeDtypeStruct((padded_b, out_dim), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, f * e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0,) * 2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0,) * 2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                w_bi.shape, lambda i: (0,) * w_bi.ndim, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_b * f * e * e,
            bytes_accessed=4 * padded_b * (f * e + out_dim),
            transcendentals=padded_b * f,
        ),
        interpret=_interpret(),
    )(
        x.astype(cd),
        w1.astype(jnp.float32),
        b1.astype(jnp.float32),
        w2.astype(jnp.float32),
        b2.astype(jnp.float32),
        w_bi.astype(cd),
    )
    return out[:b] if pad_b else out


@functools.lru_cache(maxsize=None)
def _partitioned_forward(bilinear_type: str, block_b: int):
    """custom_partitioning wrapper: batch-shard x, replicate weights, run
    the kernel per shard. Cached per (bilinear_type, block_b) so the
    partitioning rule registers once."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    run = functools.partial(
        _pallas_forward, bilinear_type=bilinear_type, block_b=block_b
    )

    @custom_partitioning
    def fused(x, w1, b1, w2, b2, w_bi):
        return run(x, w1, b1, w2, b2, w_bi)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        b_axis = _batch_axis(arg_shapes)
        x_sh = NamedSharding(mesh, P(b_axis, None, None))
        repl = NamedSharding(mesh, P())
        out_sh = NamedSharding(mesh, P(b_axis, None))
        return mesh, run, out_sh, (x_sh, repl, repl, repl, repl, repl)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes), None))

    # Shardy rule: only the batch factor is shared between x and the output;
    # every weight dim gets its own factor (they are forced replicated in
    # partition() regardless of what propagation suggests).
    wbi_rule = "g eA eB" if bilinear_type == "each" else "eA eB"
    fused.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=f"b f e, fW r, rB, rW fO, fB, {wbi_rule} -> b o",
    )
    return fused


def _forward(senet_params, bilinear_params, x, *, bilinear_type, block_b):
    f = x.shape[1]
    w_bi = (
        bilinear_params["w"] if bilinear_type == "all" else bilinear_params["w_each"]
    )
    fc1, fc2 = senet_params["fc1"], senet_params["fc2"]
    reduced = fc1["w"].shape[1]
    b1 = fc1.get("b", jnp.zeros((reduced,)))
    b2 = fc2.get("b", jnp.zeros((f,)))
    return _partitioned_forward(bilinear_type, block_b)(
        x, fc1["w"], b1, fc2["w"], b2, w_bi
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused(senet_params, bilinear_params, x, bilinear_type, block_b):
    return _forward(
        senet_params, bilinear_params, x, bilinear_type=bilinear_type, block_b=block_b
    )


def _fused_fwd(senet_params, bilinear_params, x, bilinear_type, block_b):
    out = _forward(
        senet_params, bilinear_params, x, bilinear_type=bilinear_type, block_b=block_b
    )
    return out, (senet_params, bilinear_params, x)


def _bwd_kernel(
    g_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw_ref,
    *, num_fields, bilinear_type,
):
    """Backward tile kernel: recompute z/a/w/s/v from the x tile (cheap —
    the senet matmuls are skinny and the projections are the same (TB,E)x
    (E,E) MXU dots as the forward), then run the hand-derived VJP of

        s_f = x_f * sigmoid(relu(mean(x)@W1+b1)@W2+b2)_f
        "all":  p_k = s_{i_k} * (s_{j_k} @ W)
        "each": p_k = (s_{i_k} @ W_{i_k}) * s_{j_k}
        out    = [s.flat || p.flat]

    entirely in VMEM. dx is written per tile; the (tiny) weight gradients
    are accumulated across the sequential batch grid into replicated output
    blocks (zeroed at step 0). All grad math is fp32; the (E,E) dots take
    operands in x's dtype (bf16 at serving-style compute) with fp32
    accumulation, matching the forward kernel's precision contract.

    Reference gradient being fused: the autograd of model_fibinet.py:24-35
    (SENet) + :60-89 (bilinear) + :191-194 (concat).
    """
    step = pl.program_id(0)
    f32 = jnp.float32
    cd = x_ref.dtype
    fnum = num_fields
    x = x_ref[:]  # (TB, F*E)
    g = g_ref[:].astype(f32)  # (TB, (F+P)*E)
    e = x.shape[1] // fnum
    xs = [x[:, fi * e : (fi + 1) * e].astype(f32) for fi in range(fnum)]
    # --- recompute forward intermediates ---
    z = jnp.stack([jnp.mean(xf, axis=-1) for xf in xs], axis=-1)  # (TB,F)
    h1 = jnp.dot(z, w1_ref[:], preferred_element_type=f32) + b1_ref[:]
    a = jnp.maximum(h1, 0.0)
    h2 = jnp.dot(a, w2_ref[:], preferred_element_type=f32) + b2_ref[:]
    w = jax.nn.sigmoid(h2)  # (TB,F) gate
    s = [xs[fi] * w[:, fi : fi + 1] for fi in range(fnum)]
    bdims = (((0,), (0,)), ((), ()))  # contract over the batch dim
    cdims = (((1,), (1,)), ((), ()))  # x @ W^T
    if bilinear_type == "all":
        v = [
            jnp.dot(s[fi].astype(cd), w_ref[:], preferred_element_type=f32)
            for fi in range(fnum)
        ]
    else:
        v = [
            jnp.dot(s[fi].astype(cd), w_ref[fi], preferred_element_type=f32)
            for fi in range(fnum - 1)
        ]
    # --- pair backward ---
    i_idx, j_idx = pair_indices(fnum)
    base = fnum * e
    ds = [g[:, fi * e : (fi + 1) * e] for fi in range(fnum)]
    dv = [jnp.zeros_like(s[0]) for _ in range(fnum)]
    for k, (i, j) in enumerate(zip(i_idx, j_idx)):
        i, j = int(i), int(j)
        gp = g[:, base + k * e : base + (k + 1) * e]
        if bilinear_type == "all":
            ds[i] = ds[i] + gp * v[j]  # p_k = s_i * v_j
            dv[j] = dv[j] + gp * s[i]
        else:
            dv[i] = dv[i] + gp * s[j]  # p_k = v_i * s_j
            ds[j] = ds[j] + gp * v[i]
    # --- projection backward: dW += s^T dv ; ds += dv @ W^T ---
    if bilinear_type == "all":
        dw_t = None
        for fi in range(fnum):
            t = jax.lax.dot_general(
                s[fi].astype(cd), dv[fi].astype(cd), bdims,
                preferred_element_type=f32,
            )
            dw_t = t if dw_t is None else dw_t + t
            ds[fi] = ds[fi] + jax.lax.dot_general(
                dv[fi].astype(cd), w_ref[:].astype(cd), cdims,
                preferred_element_type=f32,
            )
    else:
        dw_each = []
        for fi in range(fnum - 1):
            dw_each.append(
                jax.lax.dot_general(
                    s[fi].astype(cd), dv[fi].astype(cd), bdims,
                    preferred_element_type=f32,
                )
            )
            ds[fi] = ds[fi] + jax.lax.dot_general(
                dv[fi].astype(cd), w_ref[fi].astype(cd), cdims,
                preferred_element_type=f32,
            )
    # --- gate backward: s_f = x_f * w_f ---
    dwgate = jnp.stack(
        [jnp.sum(ds[fi] * xs[fi], axis=-1) for fi in range(fnum)], axis=-1
    )  # (TB,F)
    dh2 = dwgate * w * (1.0 - w)
    dw2_t = jax.lax.dot_general(a, dh2, bdims, preferred_element_type=f32)
    db2_t = jnp.sum(dh2, axis=0, keepdims=True)
    da = jax.lax.dot_general(dh2, w2_ref[:], cdims, preferred_element_type=f32)
    dh1 = da * (h1 > 0.0)
    dw1_t = jax.lax.dot_general(z, dh1, bdims, preferred_element_type=f32)
    db1_t = jnp.sum(dh1, axis=0, keepdims=True)
    dz = jax.lax.dot_general(dh1, w1_ref[:], cdims, preferred_element_type=f32)
    inv_e = 1.0 / e
    for fi in range(fnum):
        dx_ref[:, fi * e : (fi + 1) * e] = (
            ds[fi] * w[:, fi : fi + 1] + dz[:, fi : fi + 1] * inv_e
        )
    # --- accumulate weight grads across the sequential grid ---
    @pl.when(step == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw1_ref[:] += dw1_t
    db1_ref[:] += db1_t
    dw2_ref[:] += dw2_t
    db2_ref[:] += db2_t
    if bilinear_type == "all":
        dw_ref[:] += dw_t
    else:
        for fi in range(fnum - 1):
            dw_ref[fi] += dw_each[fi]


def _pallas_backward(g, x, w1, b1, w2, b2, w_bi, *, bilinear_type, block_b):
    """Kernel driver for the backward: pads the (local) batch, runs the
    grid, returns (dx, dw1, db1, dw2, db2, dw_bi) with dx in x's dtype and
    weight grads fp32 (the params are fp32 master copies)."""
    b, f, e = x.shape
    num_pairs = f * (f - 1) // 2
    out_dim = (f + num_pairs) * e
    # smaller default tile than the forward: the bwd holds g (out_dim wide)
    # plus several (TB, E) per-field intermediates in VMEM (budget-capped
    # at half the forward's so wide-E configs compile, see _vmem_block_cap)
    block_b = min(
        block_b, 256, _vmem_block_cap(f, e, 4 << 20),
        max(8, 1 << (b - 1).bit_length()),
    )
    pad_b = (-b) % block_b
    if pad_b:
        # zero pad rows contribute exactly zero to every gradient output
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad_b), (0, 0)))
    padded_b = b + pad_b
    x2 = x.reshape(padded_b, f * e)
    cd = x2.dtype if x2.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    r = w1.shape[1]

    grid = (padded_b // block_b,)
    repl = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_fields=f, bilinear_type=bilinear_type
        ),
        out_shape=(
            jax.ShapeDtypeStruct((padded_b, f * e), jnp.float32),  # dx
            jax.ShapeDtypeStruct((f, r), jnp.float32),  # dw1
            jax.ShapeDtypeStruct((1, r), jnp.float32),  # db1
            jax.ShapeDtypeStruct((r, f), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, f), jnp.float32),  # db2
            jax.ShapeDtypeStruct(w_bi.shape, jnp.float32),  # dw_bi
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_b, f * e), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            repl(w1.shape),
            repl(b1.shape),
            repl(w2.shape),
            repl(b2.shape),
            repl(w_bi.shape),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_b, f * e), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            repl((f, r)),
            repl((1, r)),
            repl((r, f)),
            repl((1, f)),
            repl(w_bi.shape),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * padded_b * f * e * e,
            bytes_accessed=4 * padded_b * (out_dim + 2 * f * e),
            transcendentals=padded_b * f,
        ),
        interpret=_interpret(),
    )(
        g,
        x2.astype(cd),
        w1.astype(jnp.float32),
        b1.astype(jnp.float32),
        w2.astype(jnp.float32),
        b2.astype(jnp.float32),
        w_bi.astype(cd),
    )
    dx, dw1, db1, dw2, db2, dw = outs
    dx = dx[:b] if pad_b else dx
    return (
        dx.reshape(b, f, e).astype(x.dtype),
        dw1, db1[0], dw2, db2[0], dw,
    )


@functools.lru_cache(maxsize=None)
def _partitioned_backward(bilinear_type: str, block_b: int):
    """custom_partitioning wrapper for the backward: g/x batch-sharded, dx
    batch-sharded, weight grads computed as per-shard partials by the kernel
    and all-reduced over the batch axis INSIDE the lowering (collectives are
    legal in a custom_partitioning per-shard function)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    run = functools.partial(
        _pallas_backward, bilinear_type=bilinear_type, block_b=block_b
    )

    @custom_partitioning
    def bwd(g, x, w1, b1, w2, b2, w_bi):
        return run(g, x, w1, b1, w2, b2, w_bi)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        b_axis = _batch_axis(arg_shapes)
        repl = NamedSharding(mesh, P())

        def lower(g, x, w1, b1, w2, b2, w_bi):
            dx, dw1, db1, dw2, db2, dw = run(g, x, w1, b1, w2, b2, w_bi)
            if b_axis is not None:
                dw1, db1, dw2, db2, dw = jax.lax.psum(
                    (dw1, db1, dw2, db2, dw), b_axis
                )
            return dx, dw1, db1, dw2, db2, dw

        arg_sh = (
            NamedSharding(mesh, P(b_axis, None)),
            NamedSharding(mesh, P(b_axis, None, None)),
            repl, repl, repl, repl, repl,
        )
        out_sh = (
            NamedSharding(mesh, P(b_axis, None, None)),
            repl, repl, repl, repl, repl,
        )
        return mesh, lower, out_sh, arg_sh

    def infer_sharding(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P

        b_axis = _batch_axis(arg_shapes)
        repl = NamedSharding(mesh, P())
        return (
            NamedSharding(mesh, P(b_axis, None, None)),
            repl, repl, repl, repl, repl,
        )

    wbi_rule = "gw eA eB" if bilinear_type == "each" else "eA eB"
    bwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=(
            f"b o, b f e, fA rA, rB, rC fC, fD, {wbi_rule} -> "
            f"b f e, fA rA, rB, rC fC, fD, {wbi_rule}"
        ),
    )
    return bwd


def _fused_bwd(bilinear_type, block_b, residuals, g):
    senet_params, bilinear_params, x = residuals
    f = x.shape[1]
    w_bi = (
        bilinear_params["w"] if bilinear_type == "all" else bilinear_params["w_each"]
    )
    fc1, fc2 = senet_params["fc1"], senet_params["fc2"]
    reduced = fc1["w"].shape[1]
    b1 = fc1.get("b", jnp.zeros((reduced,)))
    b2 = fc2.get("b", jnp.zeros((f,)))
    dx, dw1, db1, dw2, db2, dw = _partitioned_backward(bilinear_type, block_b)(
        g, x, fc1["w"], b1, fc2["w"], b2, w_bi
    )
    dsenet = {"fc1": {"w": dw1}, "fc2": {"w": dw2}}
    if "b" in fc1:
        dsenet["fc1"]["b"] = db1
    if "b" in fc2:
        dsenet["fc2"]["b"] = db2
    dbil = {"w": dw} if bilinear_type == "all" else {"w_each": dw}
    return dsenet, dbil, dx


_fused.defvjp(_fused_fwd, _fused_bwd)


def _vmem_block_cap(f: int, e: int, budget_bytes: int = 8 << 20) -> int:
    """Largest power-of-two batch tile whose fp32 in+out rows fit the
    scoped-vmem budget. The 512 default was tuned at E=128 (7.1 MB); at
    E=256 the same tile is 21 MB and Mosaic OOMs the 16 MB scoped limit
    (measured) — the cap keeps the kernel usable at any embedding width."""
    out_dim = (f + f * (f - 1) // 2) * e
    per_row = 4 * (f * e + out_dim)
    cap = max(8, budget_bytes // per_row)
    return 1 << (cap.bit_length() - 1)


def fused_senet_bilinear_concat(
    senet_params: dict,
    bilinear_params: dict,
    x: jax.Array,
    *,
    bilinear_type: str = "all",
    block_b: int = 512,
) -> jax.Array:
    """Drop-in replacement for the jnp reference path (same numerics)."""
    b, f, e = x.shape
    block_b = min(
        block_b, _vmem_block_cap(f, e), max(8, 1 << (b - 1).bit_length())
    )
    return _fused(senet_params, bilinear_params, x, bilinear_type, block_b)
