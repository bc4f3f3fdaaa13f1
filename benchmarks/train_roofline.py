"""Train-step roofline: per-op device-time breakdown of the on-device epoch.

Profiles the SAME jitted epoch scan bench.py times (flagship MM-FiBiNET,
full MicroLens shapes: E=128, vocab 91718, bs 4096, 40 steps) with
jax.profiler, then aggregates device-track op durations into a
per-step table (op -> us/step -> % of step). This is the committed
evidence for how close the train step is to its achievable ceiling:
the scatter/gather rows are bandwidth-bound (no MXU FLOPs), the matmul
rows are MXU-bound, and everything else is fusion overhead.

Usage:
  python benchmarks/train_roofline.py [--table-optimizer rowwise_adagrad]
      [--steps 40] [--out benchmarks/roofline_r4.json]

Numbers land in docs/PERFORMANCE.md ("Train-step roofline" section).
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify(op: str) -> str:
    """Coarse hardware-unit class for an XLA/Pallas op name."""
    n = op.lower()
    if "scatter" in n:
        return "scatter (HBM, serial rows)"
    if "gather" in n or "dynamic-slice" in n or "dynamic_slice" in n:
        return "gather/slice (HBM bw)"
    if any(k in n for k in ("dot", "conv", "einsum", "matmul")):
        return "matmul (MXU)"
    if "custom-call" in n or "custom_call" in n or "pallas" in n:
        return "pallas kernel"
    if any(k in n for k in ("sort", "unique", "cumsum", "reduce-window")):
        return "sort/unique"
    if any(k in n for k in ("all-reduce", "all-gather", "all-to-all",
                            "collective", "reduce-scatter")):
        return "collective (ICI)"
    if "copy" in n or "transpose" in n or "bitcast" in n or "reshape" in n:
        return "layout/copy"
    if "fusion" in n or "loop" in n:
        return "fusion (VPU/elementwise)"
    return "other"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--table-optimizer", default="rowwise_adagrad",
                   help="dense | adagrad | rowwise_adagrad | adam")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctr_recommendation_tpu.utils import compilation_cache

    compilation_cache.enable()

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.training import Trainer
    from ctr_recommendation_tpu.data.synthetic import fake_batch as _fake_batch
    from benchmarks.analyze_trace import load_events

    on_tpu = jax.default_backend() == "tpu"
    exp = microlens_experiment(data_root="", use_pallas=on_tpu)
    exp = exp.replace(
        train=dataclasses.replace(
            exp.train,
            batch_size=args.batch_size,
            checkpoint_dir=os.path.join(tempfile.gettempdir(), "roofline_ckpt"),
            table_optimizer=args.table_optimizer,
        )
    )

    n_rows = args.batch_size * args.steps
    trainer = Trainer(exp, steps_per_epoch=args.steps, log_fn=lambda s: None)
    raw = _fake_batch(np.random.default_rng(0), n_rows, 91718, 20, 128)

    class _Split:
        columns = raw
        num_rows = n_rows

    data = trainer._upload_split(_Split())
    epoch_fn = trainer._build_train_epoch(args.steps, args.batch_size)
    key = jax.random.key(0)
    perm = jax.random.permutation(jax.random.key(1), n_rows)

    # compile + warm (device->host value read = honest completion barrier
    # through this environment's tunnel; see bench.py note)
    for _ in range(2):
        trainer.state, losses = epoch_fn(
            trainer.state, data, perm, trainer._mm_tables, key
        )
        float(jnp.sum(losses))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        trainer.state, losses = epoch_fn(
            trainer.state, data, perm, trainer._mm_tables, key
        )
        float(jnp.sum(losses))
        times.append(time.perf_counter() - t0)
    wall_epoch_s = float(np.median(times))
    wall_step_us = wall_epoch_s / args.steps * 1e6

    trace_dir = tempfile.mkdtemp(prefix="roofline_trace_")
    jax.profiler.start_trace(trace_dir)
    trainer.state, losses = epoch_fn(
        trainer.state, data, perm, trainer._mm_tables, key
    )
    float(jnp.sum(losses))
    jax.profiler.stop_trace()

    events = load_events(trace_dir)
    # Keep only LEAF device ops: XProf tags real HLO ops with an
    # ``hlo_category`` arg; container spans (the jit module, while loops,
    # the "0" track) lack it and would double-count their children. The
    # while loop itself is kept out of the totals but reported as the
    # authoritative per-step device time.
    by_name: dict[str, float] = collections.defaultdict(float)
    calls: dict[str, int] = collections.defaultdict(int)
    meta: dict[str, tuple] = {}
    total_us = 0.0
    loop_us = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category")
        if cat is None:
            continue
        name = e.get("name", "?")
        if cat == "while" or name.startswith("while"):
            loop_us += float(e["dur"])
            continue
        by_name[name] += float(e["dur"])
        calls[name] += 1
        meta[name] = (
            str(cat),
            str(a.get("source", ""))[-60:],
            str(a.get("long_name", ""))[:120],
        )
        total_us += float(e["dur"])

    rows = []
    by_class: dict[str, float] = collections.defaultdict(float)
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1]):
        cat, source, long_name = meta[name]
        cls = classify(name + " " + cat + " " + long_name)
        by_class[cls] += dur
        rows.append({
            "op": name,
            "class": cls,
            "hlo_category": cat,
            "source": source,
            "long_name": long_name,
            "us_per_step": dur / args.steps,
            "pct_of_device": 100.0 * dur / max(total_us, 1e-9),
            "calls_per_step": calls[name] / args.steps,
        })

    device_step_us = total_us / args.steps
    loop_step_us = loop_us / args.steps
    print(
        f"[roofline] table_optimizer={args.table_optimizer} bs="
        f"{args.batch_size} steps={args.steps}"
    )
    print(
        f"[roofline] wall {wall_step_us:.0f} us/step "
        f"({n_rows / wall_epoch_s:,.0f} ex/s); while-loop span "
        f"{loop_step_us:.0f} us/step; leaf-op sum {device_step_us:.0f} "
        f"us/step ({100 * device_step_us / wall_step_us:.0f}% of wall)"
    )
    print(f"{'us/step':>9} {'%dev':>6} {'calls':>6}  class / op")
    for r in rows[: args.top]:
        print(
            f"{r['us_per_step']:9.1f} {r['pct_of_device']:6.2f} "
            f"{r['calls_per_step']:6.1f}  [{r['class']}] {r['op'][:40]} "
            f"{r['source'][-45:]}"
        )
    print("\nper-class totals:")
    for cls, dur in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(
            f"{dur / args.steps:9.1f} {100 * dur / total_us:6.2f}"
            f"         {cls}"
        )

    if args.out:
        payload = {
            "config": {
                "table_optimizer": args.table_optimizer,
                "batch_size": args.batch_size,
                "steps": args.steps,
                "backend": jax.default_backend(),
            },
            "wall_us_per_step": wall_step_us,
            "while_us_per_step": loop_step_us,
            "device_us_per_step": device_step_us,
            "examples_per_sec": n_rows / wall_epoch_s,
            "ops": rows[:50],
            "class_us_per_step": {
                k: v / args.steps for k, v in by_class.items()
            },
        }
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"[roofline] wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
