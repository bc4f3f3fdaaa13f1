"""Fused SASRec transformer-encoder Pallas TPU kernel (fwd + bwd).

The jnp encoder (ops/attention.py encode) is a chain of ~20 elementwise/
small-matmul passes over the (B, S, E) history activations; the round-3
trace showed sasrec_fibinet's step as "a flat profile of HBM-bound
elementwise passes with no single hot op" (docs/PERFORMANCE.md). At S=20,
E=128 one layer's weights (~0.65 MB) plus a batch tile of activations fit
VMEM comfortably, so the whole encoder — pos-emb add, N pre-LN blocks
(MHSA + FFN), pad zeroing — runs here as ONE kernel: HBM traffic drops to
a single read of the sequence embeddings + mask and a single write of the
encoded history (forward), and one read of (g, x, mask) + one write of dx
(backward), instead of one round trip per pass.

Layout: activations live as 2-D (TB*S, E) — the row-major bitcast of
(TB, S, E) — so every matmul is a well-shaped (rows, E) x (E, K) MXU dot
and the tiny S never hits the sublane tile (the same 2-D trick as
ops/pallas/interaction.py). Attention operates per head on (TB, S, D)
views with batched dot_generals (S=20: the logits matmuls are small, but
all the FLOPs are in qkv/proj/FFN which stay MXU-shaped). LayerNorm,
softmax and all gradient accumulation run fp32; matmul operands follow
x's dtype (bf16 on the train path) with fp32 accumulation
(preferred_element_type), matching interaction.py's precision contract.

Dropout (attn_dropout on the two residual branches) runs IN-kernel from
the TPU PRNG (pltpu.prng_seed folded with the batch-tile index), with the
backward reseeding identically and redrawing the same masks — same
statistics as the jnp path's jax.random.bernoulli, different realization
(the rng_impl="rbg" precedent, docs/PERFORMANCE.md round 4). With
dropout_rate=0 (eval and parity tests) forward/backward match the jnp
path to float tolerance.

Backward follows the interaction.py playbook: hand-derived VJP
(jax.custom_vjp), recompute every intermediate from the x tile in VMEM,
per-tile dx plus weight-gradient partials accumulated across the
sequential batch grid; under a sharded jit the weight partials are psum'd
over the batch axis inside the custom_partitioning lowering, keeping the
kernel alive at dp>1.

Reference scope being accelerated: BASELINE.json configs[4] (SASRec-style
attention pooling); the jnp fallback ops/attention.py:77-113 is the
numerics oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9
_EPS = 1e-6


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_fwd(h, scale, bias):
    """fp32 LayerNorm; returns (out, xhat, rstd) for the backward."""
    m = jnp.mean(h, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(h - m), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(v + _EPS)
    xhat = (h - m) * r
    return xhat * scale + bias, xhat, r


def _ln_bwd(g, xhat, r, scale):
    """dx for y = xhat*scale+bias; also returns (dscale, dbias)."""
    dxhat = g * scale
    mdx = jnp.mean(dxhat, axis=-1, keepdims=True)
    mdxx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = r * (dxhat - mdx - xhat * mdxx)
    return dx, jnp.sum(g * xhat, axis=0), jnp.sum(g, axis=0)


def _bdot(a, b, transpose_b=False):
    """Batched (TB, M, K) x (TB, K, N) fp32 dot (attention's small matmuls)."""
    if transpose_b:
        dn = (((2,), (2,)), ((0,), (0,)))
    else:
        dn = (((2,), (1,)), ((0,), (0,)))
    return jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32)


def _attn_fwd(qkv, padk, *, tb, s, e, h):
    """qkv (N, 3E) fp32 -> (attention out (N, E), per-head softmax list).

    padk: (TB, 1, S) True at padded key positions.
    """
    d = e // h
    inv = 1.0 / (d**0.5)
    outs = []
    ps = []
    for hi in range(h):
        q = qkv[:, hi * d : (hi + 1) * d].reshape(tb, s, d)
        k = qkv[:, e + hi * d : e + (hi + 1) * d].reshape(tb, s, d)
        v = qkv[:, 2 * e + hi * d : 2 * e + (hi + 1) * d].reshape(tb, s, d)
        logits = _bdot(q, k, transpose_b=True) * inv + padk  # (TB, S, S)
        p = jax.nn.softmax(logits, axis=-1)
        outs.append(_bdot(p, v).reshape(tb * s, d))  # (N, D)
        ps.append(p)
    return jnp.concatenate(outs, axis=-1), ps


def _attn_bwd(dao, qkv, ps, *, tb, s, e, h):
    """VJP of _attn_fwd: returns dqkv (N, 3E) fp32."""
    d = e // h
    inv = 1.0 / (d**0.5)
    parts_q, parts_k, parts_v = [], [], []
    for hi in range(h):
        q = qkv[:, hi * d : (hi + 1) * d].reshape(tb, s, d)
        k = qkv[:, e + hi * d : e + (hi + 1) * d].reshape(tb, s, d)
        v = qkv[:, 2 * e + hi * d : 2 * e + (hi + 1) * d].reshape(tb, s, d)
        p = ps[hi]
        g = dao[:, hi * d : (hi + 1) * d].reshape(tb, s, d)
        dp = _bdot(g, v, transpose_b=True)  # (TB, S, S)
        # dv[k] = sum_q p[q,k] * g[q]  ->  p^T @ g  (transpose batch matmul)
        dv = jax.lax.dot_general(
            p, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dlog = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # masked keys have p == 0 -> dlog == 0 there already
        dlog = dlog * inv
        dq = _bdot(dlog, k)  # (TB, S, D)
        dk = jax.lax.dot_general(
            dlog, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        parts_q.append(dq.reshape(tb * s, d))
        parts_k.append(dk.reshape(tb * s, d))
        parts_v.append(dv.reshape(tb * s, d))
    return jnp.concatenate(parts_q + parts_k + parts_v, axis=-1)


def _dropout_mask(shape, rate):
    """Keep mask drawn from the in-kernel TPU PRNG (caller seeds)."""
    bits = pltpu.prng_random_bits(shape)
    # uint32 -> uniform [0, 1): use the top 24 bits
    u = (bits >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32)


def _layer_weights(refs, li):
    """Slice layer li's weight block out of the stacked (L, ...) refs."""
    (qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b,
     ffn1_w, ffn1_b, ffn2_w, ffn2_b, ln2_s, ln2_b) = refs
    return dict(
        qkv_w=qkv_w[li], qkv_b=qkv_b[li], proj_w=proj_w[li],
        proj_b=proj_b[li], ln1_s=ln1_s[li], ln1_b=ln1_b[li],
        ffn1_w=ffn1_w[li], ffn1_b=ffn1_b[li], ffn2_w=ffn2_w[li],
        ffn2_b=ffn2_b[li], ln2_s=ln2_s[li], ln2_b=ln2_b[li],
    )


def _dot(a, b, cd):
    """(N, K) x (K, M) MXU dot, operands in cd, fp32 accumulation."""
    return jnp.dot(a.astype(cd), b.astype(cd), preferred_element_type=jnp.float32)


def _encode_layers(
    x, amask, w_refs, *, tb, s, e, h, layers, rate, train, cd,
    keep_intermediates=False,
):
    """Shared forward walk (fp32 stream). amask: (TB, S) additive key mask
    (-1e9 at padded keys, 0 elsewhere) — kept 2-D because a (N, 1) pad
    column reshaped to (TB, 1, S) forces a catastrophic Mosaic relayout
    (measured: 29.6 MB scoped-vmem OOM); x arrives with pad rows already
    zeroed (the wrapper re-zeroes the output, and row-local ops cannot
    leak a pad row into a real row once attention keys are masked).

    Returns (h_out, saved) where saved holds per-layer recompute residues
    when keep_intermediates (backward pass) is on. Dropout masks are drawn
    IN ORDER (2 per layer) — caller must have seeded the PRNG.
    """
    padk = amask[:, None, :]  # (TB, 1, S), added to attention logits
    hcur = x
    saved = []
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for li in range(layers):
        w = _layer_weights(w_refs, li)
        res: dict = {}
        hn1, xhat1, r1 = _ln_fwd(hcur, w["ln1_s"], w["ln1_b"])
        qkv = _dot(hn1, w["qkv_w"], cd) + w["qkv_b"]
        ao, ps = _attn_fwd(qkv, padk, tb=tb, s=s, e=e, h=h)
        a1 = _dot(ao, w["proj_w"], cd) + w["proj_b"]
        if train and rate > 0.0:
            m_a = _dropout_mask(a1.shape, rate)
            a1 = a1 * m_a * inv_keep
        else:
            m_a = None
        h1 = hcur + a1
        hn2, xhat2, r2 = _ln_fwd(h1, w["ln2_s"], w["ln2_b"])
        z1 = _dot(hn2, w["ffn1_w"], cd) + w["ffn1_b"]
        f1 = jnp.maximum(z1, 0.0)
        f2 = _dot(f1, w["ffn2_w"], cd) + w["ffn2_b"]
        if train and rate > 0.0:
            m_f = _dropout_mask(f2.shape, rate)
            f2 = f2 * m_f * inv_keep
        else:
            m_f = None
        hcur = h1 + f2
        if keep_intermediates:
            # minimal residue set: the big (N, 3E)/(N, 4E) intermediates
            # (qkv, f1, ao) are RECOMPUTED in the backward from these —
            # one extra matmul each, ~1% of the backward FLOPs — so the
            # per-layer live set stays small enough for 64-row tiles
            # inside the 16 MB scoped-vmem budget
            res.update(
                xhat1=xhat1, r1=r1, ps=ps, m_a=m_a,
                xhat2=xhat2, r2=r2, m_f=m_f,
            )
            saved.append(res)
    return hcur, saved


def _fwd_kernel(
    seed_ref, x_ref, amask_ref, *w_refs_and_out,
    tb, s, e, h, layers, rate, train,
):
    w_refs = [r[:] for r in w_refs_and_out[:-1]]
    out_ref = w_refs_and_out[-1]
    cd = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32), pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)  # (N, E): pos-embedded, pads zeroed
    amask = amask_ref[:].astype(jnp.float32)  # (TB, S) additive key mask
    out, _ = _encode_layers(
        x, amask, w_refs, tb=tb, s=s, e=e, h=h, layers=layers,
        rate=rate, train=train, cd=cd,
    )
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(
    seed_ref, g_ref, x_ref, amask_ref, *refs,
    tb, s, e, h, layers, rate, train,
):
    """Recompute the forward walk from the x tile, then reverse it.

    Outputs: dx tile + stacked per-layer weight grads + dpos handled by the
    caller (dx is pre-pos-add, so dpos = sum over rows of dx per position,
    computed outside on the (B, S, E) dx — a cheap reduction)."""
    w_refs = [r[:] for r in refs[:12]]
    (dx_ref, dqkv_w_ref, dqkv_b_ref, dproj_w_ref, dproj_b_ref,
     dln1_s_ref, dln1_b_ref, dffn1_w_ref, dffn1_b_ref, dffn2_w_ref,
     dffn2_b_ref, dln2_s_ref, dln2_b_ref) = refs[12:]
    step = pl.program_id(0)
    cd = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32), step)
    x = x_ref[:].astype(jnp.float32)
    amask = amask_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    _, saved = _encode_layers(
        x, amask, w_refs, tb=tb, s=s, e=e, h=h, layers=layers,
        rate=rate, train=train, cd=cd, keep_intermediates=True,
    )

    @pl.when(step == 0)
    def _():
        for r in (dqkv_w_ref, dqkv_b_ref, dproj_w_ref, dproj_b_ref,
                  dln1_s_ref, dln1_b_ref, dffn1_w_ref, dffn1_b_ref,
                  dffn2_w_ref, dffn2_b_ref, dln2_s_ref, dln2_b_ref):
            r[:] = jnp.zeros_like(r)

    tdims = (((0,), (0,)), ((), ()))  # a^T @ b over rows
    cdims = (((1,), (1,)), ((), ()))  # g @ W^T
    dh = g
    for li in reversed(range(layers)):
        w = _layer_weights(w_refs, li)
        res = saved[li]
        # --- FFN branch (f1 recomputed from the saved LN residue) ---
        hn2 = res["xhat2"] * w["ln2_s"] + w["ln2_b"]
        f1 = jnp.maximum(_dot(hn2, w["ffn1_w"], cd) + w["ffn1_b"], 0.0)
        df2 = dh
        if res["m_f"] is not None:
            df2 = df2 * res["m_f"] * inv_keep
        dffn2_w_ref[li] += jax.lax.dot_general(
            f1.astype(cd), df2.astype(cd), tdims,
            preferred_element_type=jnp.float32,
        )
        dffn2_b_ref[li] += jnp.sum(df2, axis=0)
        df1 = jax.lax.dot_general(
            df2.astype(cd), w["ffn2_w"].astype(cd), cdims,
            preferred_element_type=jnp.float32,
        )
        dz1 = df1 * (f1 > 0.0)
        dffn1_w_ref[li] += jax.lax.dot_general(
            hn2.astype(cd), dz1.astype(cd), tdims,
            preferred_element_type=jnp.float32,
        )
        dffn1_b_ref[li] += jnp.sum(dz1, axis=0)
        dhn2 = jax.lax.dot_general(
            dz1.astype(cd), w["ffn1_w"].astype(cd), cdims,
            preferred_element_type=jnp.float32,
        )
        dx2, ds2, db2 = _ln_bwd(dhn2, res["xhat2"], res["r2"], w["ln2_s"])
        dln2_s_ref[li] += ds2
        dln2_b_ref[li] += db2
        dh1 = dh + dx2
        # --- attention branch (qkv/ao recomputed from the LN residue) ---
        hn1 = res["xhat1"] * w["ln1_s"] + w["ln1_b"]
        qkv = _dot(hn1, w["qkv_w"], cd) + w["qkv_b"]
        d_head = e // h
        ao = jnp.concatenate(
            [
                _bdot(
                    res["ps"][hi],
                    qkv[:, 2 * e + hi * d_head : 2 * e + (hi + 1) * d_head]
                    .reshape(tb, s, d_head),
                ).reshape(tb * s, d_head)
                for hi in range(h)
            ],
            axis=-1,
        )
        da1 = dh1
        if res["m_a"] is not None:
            da1 = da1 * res["m_a"] * inv_keep
        dproj_w_ref[li] += jax.lax.dot_general(
            ao.astype(cd), da1.astype(cd), tdims,
            preferred_element_type=jnp.float32,
        )
        dproj_b_ref[li] += jnp.sum(da1, axis=0)
        dao = jax.lax.dot_general(
            da1.astype(cd), w["proj_w"].astype(cd), cdims,
            preferred_element_type=jnp.float32,
        )
        dqkv = _attn_bwd(
            dao, qkv, res["ps"], tb=tb, s=s, e=e, h=h
        )
        dqkv_w_ref[li] += jax.lax.dot_general(
            hn1.astype(cd),
            dqkv.astype(cd), tdims, preferred_element_type=jnp.float32,
        )
        dqkv_b_ref[li] += jnp.sum(dqkv, axis=0)
        dhn1 = jax.lax.dot_general(
            dqkv.astype(cd), w["qkv_w"].astype(cd), cdims,
            preferred_element_type=jnp.float32,
        )
        dx1, ds1, db1 = _ln_bwd(dhn1, res["xhat1"], res["r1"], w["ln1_s"])
        dln1_s_ref[li] += ds1
        dln1_b_ref[li] += db1
        dh = dh1 + dx1
    # pad-position grads are zeroed OUTSIDE by the wrapper's re-masking
    dx_ref[:] = dh.astype(dx_ref.dtype)


def _stack_weights(params):
    blocks = params["blocks"]
    return (
        jnp.stack([b["qkv"]["w"] for b in blocks]),
        jnp.stack([b["qkv"]["b"] for b in blocks]),
        jnp.stack([b["proj"]["w"] for b in blocks]),
        jnp.stack([b["proj"]["b"] for b in blocks]),
        jnp.stack([b["ln1_scale"] for b in blocks]),
        jnp.stack([b["ln1_bias"] for b in blocks]),
        jnp.stack([b["ffn1"]["w"] for b in blocks]),
        jnp.stack([b["ffn1"]["b"] for b in blocks]),
        jnp.stack([b["ffn2"]["w"] for b in blocks]),
        jnp.stack([b["ffn2"]["b"] for b in blocks]),
        jnp.stack([b["ln2_scale"] for b in blocks]),
        jnp.stack([b["ln2_bias"] for b in blocks]),
    )


def _repl_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


def _pallas_encode_fwd(
    x, amask, seed, weights, *, s, e, h, layers, rate, train, block_b
):
    """x: (B, S*E) pos-embedded, pad-zeroed stream in compute dtype;
    amask: (B, S) additive key mask (-1e9 at pads)."""
    b = x.shape[0]
    block_b = min(block_b, max(8, 1 << (b - 1).bit_length()))
    pad_b = (-b) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
        amask = jnp.pad(amask, ((0, pad_b), (0, 0)), constant_values=_NEG_INF)
    padded_b = b + pad_b
    n = block_b * s
    x2 = x.reshape(padded_b * s, e)
    grid = (padded_b // block_b,)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, tb=block_b, s=s, e=e, h=h, layers=layers,
            rate=rate, train=train,
        ),
        out_shape=jax.ShapeDtypeStruct((padded_b * s, e), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec((n, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[_repl_spec(w.shape) for w in weights],
        ],
        out_specs=pl.BlockSpec((n, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_b * s * layers * (e * 3 * e + e * e + 8 * e * e + 2 * s * e),
            bytes_accessed=4 * padded_b * s * e * 2,
            transcendentals=padded_b * s * layers * (s + e),
        ),
        interpret=_interpret(),
    )(seed, x2, amask, *weights)
    out = out.reshape(padded_b, s * e)
    return out[:b] if pad_b else out


def _pallas_encode_bwd(
    g, x, amask, seed, weights, *, s, e, h, layers, rate, train, block_b
):
    b = x.shape[0]
    # the backward tile's live set is the layer walk's transients plus
    # the trimmed residues (xhat/softmax/masks only — qkv/f1/ao are
    # recomputed); 128 rows OOM'd the 16MB scoped-vmem budget before the
    # trim (26.8M measured) — 64 rows fits with headroom for L=2
    block_b = min(block_b, 64, max(8, 1 << (b - 1).bit_length()))
    pad_b = (-b) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
        g = jnp.pad(g, ((0, pad_b), (0, 0)))
        amask = jnp.pad(amask, ((0, pad_b), (0, 0)), constant_values=_NEG_INF)
    padded_b = b + pad_b
    n = block_b * s
    x2 = x.reshape(padded_b * s, e)
    g2 = g.reshape(padded_b * s, e)
    grid = (padded_b // block_b,)
    w_shapes = [w.shape for w in weights]
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, tb=block_b, s=s, e=e, h=h, layers=layers,
            rate=rate, train=train,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((padded_b * s, e), x.dtype),  # dx
            *[jax.ShapeDtypeStruct(ws, jnp.float32) for ws in w_shapes],
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((n, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[_repl_spec(ws) for ws in w_shapes],
        ],
        out_specs=(
            pl.BlockSpec((n, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[_repl_spec(ws) for ws in w_shapes],
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * padded_b * s * layers * (e * 3 * e + e * e + 8 * e * e + 2 * s * e),
            bytes_accessed=4 * padded_b * s * e * 3,
            transcendentals=2 * padded_b * s * layers * (s + e),
        ),
        interpret=_interpret(),
    )(seed, g2, x2, amask, *weights)
    dx = outs[0].reshape(padded_b, s * e)
    dx = dx[:b] if pad_b else dx
    return dx, outs[1:]


_W_RANKS = (3, 2, 3, 2, 2, 2, 3, 2, 3, 2, 2, 2)  # stacked (L, ...) weights


def _weight_rules(prefix=""):
    """Shardy factor strings for the 12 stacked weights — every dim gets
    its own factor (they are forced replicated in partition() anyway)."""
    out = []
    for i, r in enumerate(_W_RANKS):
        tag = chr(ord("A") + i)
        out.append(" ".join(f"{prefix}w{tag}{d}" for d in range(r)))
    return out


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(s, e, h, layers, rate, train, block_b):
    """custom_partitioning wrapper: x/amask batch-sharded, weights + seed
    replicated, kernel runs per shard (the batch grid is embarrassingly
    parallel) — keeps use_pallas alive under dp>1 instead of silently
    degrading (the interaction.py pattern, VERDICT r2 item 2)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def run(x, amask, seed, *weights):
        return _pallas_encode_fwd(
            x, amask, seed, weights, s=s, e=e, h=h, layers=layers,
            rate=rate, train=train, block_b=block_b,
        )

    @custom_partitioning
    def fwd(x, amask, seed, *weights):
        return run(x, amask, seed, *weights)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        b_axis = _batch_axis(arg_shapes)
        repl = NamedSharding(mesh, P())
        arg_sh = (
            NamedSharding(mesh, P(b_axis, None)),
            NamedSharding(mesh, P(b_axis, None)),
            repl,
            *([repl] * 12),
        )
        return mesh, run, NamedSharding(mesh, P(b_axis, None)), arg_sh

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes), None))

    rules = ["b xe", "b sm", "sd"] + _weight_rules()
    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=f"{', '.join(rules)} -> b xe",
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(s, e, h, layers, rate, train, block_b):
    """Backward wrapper: g/x/amask batch-sharded, dx batch-sharded, the 12
    weight-grad partials psum'd over the batch axis INSIDE the lowering."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def run(g, x, amask, seed, *weights):
        dx, dws = _pallas_encode_bwd(
            g, x, amask, seed, weights, s=s, e=e, h=h, layers=layers,
            rate=rate, train=train, block_b=block_b,
        )
        return (dx, *dws)

    @custom_partitioning
    def bwd(g, x, amask, seed, *weights):
        return run(g, x, amask, seed, *weights)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        b_axis = _batch_axis(arg_shapes)
        repl = NamedSharding(mesh, P())

        def lower(g, x, amask, seed, *weights):
            outs = run(g, x, amask, seed, *weights)
            if b_axis is not None:
                dws = jax.lax.psum(outs[1:], b_axis)
                outs = (outs[0], *dws)
            return outs

        batch2 = NamedSharding(mesh, P(b_axis, None))
        arg_sh = (batch2, batch2, batch2, repl, *([repl] * 12))
        out_sh = (batch2, *([repl] * 12))
        return mesh, lower, out_sh, arg_sh

    def infer_sharding(mesh, arg_shapes, result_shape):
        b_axis = _batch_axis(arg_shapes)
        return (
            NamedSharding(mesh, P(b_axis, None)),
            *([NamedSharding(mesh, P())] * 12),
        )

    rules = ["b xe", "b xe", "b sm", "sd"] + _weight_rules()
    # weight-grad outputs reuse the weight inputs' factors (same shapes)
    out_rules = ["b xe"] + _weight_rules()
    bwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=f"{', '.join(rules)} -> {', '.join(out_rules)}",
    )
    return bwd


def _seed_from_rng(rng):
    """Dropout seed carried as float32 (exact for 24-bit values) so the
    custom_vjp can return a plain zeros cotangent for it — an int32 seed
    would demand a float0 tangent."""
    if rng is None:
        return jnp.zeros((1,), jnp.float32)
    return jax.random.randint(rng, (1,), 0, 1 << 24).astype(jnp.float32)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10)
)
def _fused(x, amask, seed, weights, s, e, h, layers, rate, train, block_b):
    return _partitioned_fwd(s, e, h, layers, rate, train, block_b)(
        x, amask, seed, *weights
    )


def _fused_fwd(x, amask, seed, weights, s, e, h, layers, rate, train, block_b):
    out = _partitioned_fwd(s, e, h, layers, rate, train, block_b)(
        x, amask, seed, *weights
    )
    return out, (x, amask, seed, weights)


def _fused_bwd(s, e, h, layers, rate, train, block_b, residuals, g):
    x, amask, seed, weights = residuals
    outs = _partitioned_bwd(s, e, h, layers, rate, train, block_b)(
        g, x, amask, seed, *weights
    )
    dx, dweights = outs[0], outs[1:]
    return dx, jnp.zeros_like(amask), jnp.zeros_like(seed), tuple(dweights)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_encode(
    params: dict,
    seq_emb: jax.Array,
    seq_ids: jax.Array,
    *,
    num_heads: int,
    pad_id: int = 0,
    train: bool = False,
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
    block_b: int = 128,
) -> jax.Array:
    """Drop-in fused replacement for ops/attention.encode.

    seq_emb (B, S, E), seq_ids (B, S) -> encoded (B, S, E). Differentiable
    w.r.t. seq_emb and every encoder weight (pos_emb included). With
    dropout off, numerics match the jnp path to float tolerance; with
    dropout on, masks come from the in-kernel TPU PRNG (same Bernoulli
    statistics, different realization than jax.random — documented above).
    """
    b, s, e = seq_emb.shape
    pad = (seq_ids == pad_id)
    # pos-emb add + pad zeroing OUTSIDE the kernel: dpos/dseq_emb mask
    # gradients fall out of autodiff of these two cheap fusable ops, and
    # the kernel never touches a (N, 1) pad column (see _encode_layers)
    x = seq_emb + params["pos_emb"][:s].astype(seq_emb.dtype)
    x = jnp.where(pad[..., None], jnp.zeros((), x.dtype), x)
    amask = jnp.where(pad, jnp.float32(_NEG_INF), jnp.float32(0.0))
    weights = _stack_weights(params)
    # dropout is active only when an rng is supplied — the jnp reference
    # encode skips dropout entirely at rng=None even in train mode, and
    # the constant-seed alternative would reuse one mask every step
    drop_on = train and dropout_rate > 0.0 and rng is not None
    seed = _seed_from_rng(rng if drop_on else None)
    rate = float(dropout_rate) if drop_on else 0.0
    if rate > 0.0:
        # dropout masks are regenerated in the backward by reseeding per
        # grid step — forward and backward must therefore run the SAME
        # tiling, i.e. the backward's 64-row cap applies to both
        block_b = min(block_b, 64)
    out = _fused(
        x.reshape(b, s * e), amask, seed, weights,
        s, e, num_heads, len(params["blocks"]), rate, train, block_b,
    )
    out = out.reshape(b, s, e)
    # re-zero pad rows: in-kernel they carry layer garbage that attention
    # masking keeps out of every real row (reference parity restored here)
    return jnp.where(pad[..., None], jnp.zeros((), out.dtype), out)
