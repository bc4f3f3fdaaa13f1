"""Is the table-grad scatter-add byte-bound or row-bound?

The train step's hottest op is the embedding-table gradient scatter
(docs/PERFORMANCE.md §3: ~0.8-1.0 ms of the ~3 ms step at MicroLens shapes).
Round-3 measurements concluded v5e serializes scatter rows at ~12 ns/row; if
that is actually a BYTE limit (~40 GB/s effective), emitting the cotangent in
bf16 would halve the scatter's traffic and ~2x the step's hottest op. This
microbench answers the question directly by scattering the same id stream at
fp32, bf16 row widths, and at E=64 fp32 (half the bytes, same row count):

* byte-bound  -> bf16@128 ~= fp32@64 ~= fp32@128 / 2
* row-bound   -> all three roughly equal

Run on the chip; prints one JSON line per variant.
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
    leaf = jax.tree.leaves(x)[0]
    return float(leaf.ravel()[0].astype(jnp.float32))


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        _value_read(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _value_read(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    compilation_cache.enable()
    v, e = 91776, 128
    n = 86016  # 4096 * 21: the MicroLens step's flat id count
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 91718, size=(n,), dtype=np.int32))

    results = []

    def bench(tag, dtype, width, loop_iters=50):
        upd = jnp.asarray(rng.normal(size=(n, width)), dtype=dtype)
        base = jnp.zeros((v, width), dtype)

        @jax.jit
        def run(base, ids, upd):
            # in-program loop (vary data per iter so XLA can't hoist): the
            # per-dispatch tunnel RTT would otherwise dominate
            def body(acc, i):
                return acc.at[ids].add(upd + i.astype(dtype)), None

            acc, _ = jax.lax.scan(
                body, base, jnp.arange(loop_iters, dtype=jnp.int32)
            )
            return acc

        t = timeit(run, base, ids, upd, iters=5) / loop_iters
        row = {
            "variant": tag,
            "us": round(t * 1e6, 1),
            "ns_per_row": round(t * 1e9 / n, 2),
            "gb_per_s": round(n * width * jnp.dtype(dtype).itemsize / t / 1e9, 1),
        }
        results.append(row)
        print(json.dumps(row))

    bench("scatter_add_f32_e128", jnp.float32, 128)
    bench("scatter_add_bf16_e128", jnp.bfloat16, 128)
    bench("scatter_add_f32_e64", jnp.float32, 64)
    bench("scatter_add_f32_e256", jnp.float32, 256)

    f32 = next(r for r in results if r["variant"] == "scatter_add_f32_e128")
    bf16 = next(r for r in results if r["variant"] == "scatter_add_bf16_e128")
    verdict = "byte-bound" if bf16["us"] < 0.7 * f32["us"] else "row-bound"
    print(json.dumps({"verdict": verdict, "bf16_speedup": round(f32["us"] / bf16["us"], 2)}))


if __name__ == "__main__":
    main()
