"""Serving latency: device-only per-batch sweep + closed-loop load test.

bench.py reports the reference workload's batch (8192). Real serving picks a
batch for its latency SLO, so this sweep reports the fused-scoring path's
device-only latency per batch size. Methodology: run one-program lax.scans
of k and 2k batches and take (T(2k) - T(k)) / k — the dispatch/tunnel floor
cancels in the difference (subtracting a separately-measured floor proved
too noisy for sub-100us batches on the shared tunnel).

``--closed-loop`` (VERDICT r3 item 7) instead drives the REAL serving stack
— ScoringService.score() -> MicroBatcher linger/coalesce -> RequestCollator
bucket padding -> Predictor — with N concurrent in-process client threads,
each submitting ``rows-per-request`` rows back-to-back, and reports offered
load, achieved rows/s, end-to-end p50/p99 request latency, and the
coalescing rate (requests per device dispatch) per concurrency level.
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


def closed_loop(clients_list, rows_per_request, seconds, max_wait_ms) -> None:
    """Concurrent-client load test against the full ScoringService path."""
    import threading

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.inference import Predictor
    from ctr_recommendation_tpu.models import build_model
    from ctr_recommendation_tpu.serving.server import ScoringService

    from ctr_recommendation_tpu.data import ItemStore

    on_tpu = jax.default_backend() == "tpu"
    exp = microlens_experiment(data_root="", use_pallas=on_tpu)
    fm = build_feature_map(exp.dataset)
    _, params, state = build_model(fm, exp.model, jax.random.key(0))
    # requests carry ids only; the server-side device join needs an item
    # table — synthesize the full-vocab one (unit-norm rows, real shapes)
    srng = np.random.default_rng(0)
    emb = srng.normal(size=(91_718, 128)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store = ItemStore(emb, np.ones(91_718, bool))
    pred = Predictor(exp, params, state, fold_bn=True, item_store=store)

    def predictor(batch):
        return pred._score(pred.params, pred.model_state, pred._mm_tables, batch)

    for n_clients in clients_list:
        svc = ScoringService(
            predictor, fm, model_name="bench",
            buckets=(16, 64, 256, 1024, 4096), max_wait_ms=max_wait_ms,
        )
        svc.warmup()
        latencies: list[float] = []
        errors: list[Exception] = []
        lock = threading.Lock()
        stop_at = time.monotonic() + seconds

        def client(cid: int):
            rng = np.random.default_rng(cid)
            while time.monotonic() < stop_at:
                rows = [
                    {
                        "item_id": int(rng.integers(1, 91718)),
                        "likes_level": int(rng.integers(0, 11)),
                        "views_level": int(rng.integers(0, 11)),
                        "item_seq": rng.integers(
                            1, 91718, size=int(rng.integers(0, 20))
                        ).tolist(),
                    }
                    for _ in range(rows_per_request)
                ]
                t0 = time.monotonic()
                try:
                    svc.score(rows)
                except Exception as e:  # noqa: BLE001 - recorded for report
                    with lock:
                        errors.append(e)
                    return
                with lock:
                    latencies.append(time.monotonic() - t0)

        threads = [
            threading.Thread(target=client, args=(c,)) for c in range(n_clients)
        ]
        t_start = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t_start
        stats = svc.stats()
        svc.close()
        if errors:
            raise errors[0]
        lat = np.asarray(latencies)
        print(
            json.dumps(
                {
                    "clients": n_clients,
                    "rows_per_request": rows_per_request,
                    "requests": len(lat),
                    "achieved_rows_per_sec": round(
                        stats["rows_scored"] / wall, 1
                    ),
                    "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
                    "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
                    "requests_per_dispatch": round(
                        stats["requests_served"]
                        / max(stats["batches_dispatched"], 1),
                        2,
                    ),
                    "coalesced_batches": stats["coalesced_batches"],
                    "batches_dispatched": stats["batches_dispatched"],
                }
            )
        )


def main() -> None:
    compilation_cache.enable()

    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--closed-loop", action="store_true")
    p.add_argument("--clients", default="1,4,16,64",
                   help="comma-separated concurrency levels (closed loop)")
    p.add_argument("--rows-per-request", type=int, default=8)
    p.add_argument("--seconds", type=float, default=5.0,
                   help="measurement window per concurrency level")
    p.add_argument("--max-wait-ms", type=float, default=2.0)
    args = p.parse_args()
    if args.closed_loop:
        closed_loop(
            [int(c) for c in args.clients.split(",")],
            args.rows_per_request, args.seconds, args.max_wait_ms,
        )
        return

    from ctr_recommendation_tpu.data.synthetic import fake_batch as _fake_batch
    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.inference import Predictor
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.models import build_model

    on_tpu = jax.default_backend() == "tpu"
    exp = microlens_experiment(data_root="", use_pallas=on_tpu)
    fm = build_feature_map(exp.dataset)
    _, params, state = build_model(fm, exp.model, jax.random.key(0))
    pred = Predictor(exp, params, state, fold_bn=True)

    def score(batch):
        return pred._score(pred.params, pred.model_state, pred._mm_tables, batch)

    rng = np.random.default_rng(0)
    for bs in (256, 1024, 4096, 8192):
        k = max(8, 65536 // bs)
        big = _fake_batch(rng, bs * k, 91718, 20, 128, with_label=False)
        big = jax.device_put(big)

        def make_scan(n_iters):
            @jax.jit
            def score_all(data):
                def body(_, i):
                    # wrap so n_iters > k reuses batches without new data
                    j = jax.lax.rem(i, jnp.int32(k))
                    b = {
                        kk: jax.lax.dynamic_slice_in_dim(v, j * bs, bs)
                        for kk, v in data.items()
                    }
                    return None, score(b)[0]

                _, first = jax.lax.scan(
                    body, None, jnp.arange(n_iters, dtype=jnp.int32)
                )
                return jnp.sum(first)

            return score_all

        def timed(fn, reps=5):
            float(fn(big))  # compile/warm
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(fn(big))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t1 = timed(make_scan(k))
        t2 = timed(make_scan(2 * k))
        dev_ms = max(t2 - t1, 1e-9) / k * 1e3
        print(
            json.dumps(
                {
                    "batch": bs,
                    "device_ms_per_batch": round(dev_ms, 4),
                    "rows_per_sec": round(bs / (dev_ms / 1e3), 1),
                }
            )
        )


if __name__ == "__main__":
    main()
