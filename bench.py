"""Benchmark harness — prints ONE JSON line.

Headline metric: END-TO-END submission throughput (rows/s) on the flagship
MM-FiBiNET at full MicroLens size (E=128, item vocab 91718) — parquet test
split from disk, device item join, bulk scoring, prediction CSV + zip on
disk — the same work the reference's logged 163K rows/s includes
(BASELINE.md; Notebooks/train_predict_kaggle.ipynb cell 7: 47x8192 rows in
2.36 s with its per-batch pandas join). Round 3's headline was the
device-resident scoring scan alone, the most flattering pairing (VERDICT r3
weak #4); that number still appears as ``device_bulk_rows_per_sec`` in
extra, with train-step throughput and scoring latency.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_INFER_ROWS_PER_SEC = 163_000.0

# bf16 MXU peak per chip kind (TFLOP/s), for the MFU lines (VERDICT r2
# item 8). Matmul-only accounting: embedding gathers/scatters are
# bandwidth-bound and carry no MXU FLOPs.
_PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v5": 459.0,  # v5p
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
    "TPU v6e": 918.0,
}


def _flops_per_row_eval(f: int = 6, e: int = 128,
                        hidden=(512, 256), mm_in: int = 128) -> float:
    """Matmul FLOPs per scored example for the MM-FiBiNET serving forward:
    mm projection + bilinear field projection + folded tower."""
    cdim = (f + f * (f - 1) // 2) * e
    macs = mm_in * e            # dense mm projection (128 -> E)
    macs += f * e * e           # bilinear "all": (B*F, E) @ (E, E)
    dims = [cdim, *hidden, 1]
    macs += sum(a * b for a, b in zip(dims[:-1], dims[1:]))  # tower
    return 2.0 * macs


def main() -> None:
    import dataclasses

    from ctr_recommendation_tpu.utils import compilation_cache

    compilation_cache.enable()

    from ctr_recommendation_tpu.config import microlens_experiment
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.models import build_model
    from ctr_recommendation_tpu.training import Trainer
    from ctr_recommendation_tpu.data.synthetic import fake_batch as _fake_batch

    on_tpu = jax.default_backend() == "tpu"
    exp = microlens_experiment(data_root="", use_pallas=on_tpu)
    fm = build_feature_map(exp.dataset)
    cfg = exp.model
    module, params, state = build_model(fm, cfg, jax.random.key(0))

    rng = np.random.default_rng(0)
    eval_bs = 8192

    # the real serving path: BatchNorm-folded tower + fused Pallas scoring
    # kernel when on TPU (inference/predictor.py)
    from ctr_recommendation_tpu.inference import Predictor

    pred = Predictor(exp, params, state, fold_bn=True)

    def score(batch):
        return pred._score(pred.params, pred.model_state, pred._mm_tables, batch)

    batch = _fake_batch(rng, eval_bs, 91718, 20, 128, with_label=False)
    batch = jax.device_put(batch)
    # warmup / compile (device->host value read = honest completion barrier)
    float(score(batch)[0])

    # --- single-batch dispatch latency (includes host->device round trip;
    # through this environment's tunnel that round trip dominates). True
    # median of per-iteration times, not a mean (one tunnel hiccup would
    # skew a mean arbitrarily) ---
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(score(batch)[0])
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat)) * 1e3

    # --- bulk scoring throughput: the reference's exact workload shape
    # (47x8192-row batches, Prediction.py:97) scored as ONE device program
    # (a lax.scan over batches — the framework's real batch-eval path) ---
    n_batches = 47
    big = _fake_batch(rng, eval_bs * n_batches, 91718, 20, 128, with_label=False)
    big = jax.device_put(big)

    def make_scan(n_iters):
        @jax.jit
        def score_all(data):
            def body(_, i):
                j = jax.lax.rem(i, jnp.int32(n_batches))
                b = {
                    k: jax.lax.dynamic_slice_in_dim(v, j * eval_bs, eval_bs)
                    for k, v in data.items()
                }
                return None, score(b)

            _, probs = jax.lax.scan(
                body, None, jnp.arange(n_iters, dtype=jnp.int32)
            )
            return probs.reshape(-1)

        return score_all

    score_all = make_scan(n_batches)
    float(score_all(big)[0])  # compile
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(score_all(big)[0])
        reps.append(time.perf_counter() - t0)
    infer_rows_per_sec = eval_bs * n_batches / float(np.median(reps))

    # --- device-only per-batch scoring latency (VERDICT r1 item 9):
    # scoring_batch_ms above is dominated by this environment's tunnel RTT.
    # Measured as (T(2x47 batches) - T(47 batches)) / 47 — the dispatch/
    # tunnel floor cancels in the difference (more robust than subtracting a
    # separately-measured trivial-dispatch floor; see
    # benchmarks/serving_latency_sweep.py for the per-batch-size table). ---
    score_all2 = make_scan(2 * n_batches)
    float(score_all2(big)[0])  # compile
    reps2 = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(score_all2(big)[0])
        reps2.append(time.perf_counter() - t0)
    device_scoring_ms = (
        max(float(np.median(reps2)) - float(np.median(reps)), 1e-9)
        / n_batches
        * 1e3
    )

    # --- e2e train throughput: on-device epoch scan over distinct batches ---
    train_bs = 4096
    n_steps = 40
    n_rows = train_bs * n_steps
    trainer = Trainer(
        exp.replace(
            train=dataclasses.replace(
                exp.train, batch_size=train_bs, checkpoint_dir="/tmp/bench_ckpt"
            )
        ),
        steps_per_epoch=n_steps,
        log_fn=lambda s: None,
    )
    raw = _fake_batch(rng, n_rows, 91718, 20, 128)

    class _Split:
        columns = raw
        num_rows = n_rows

    data = trainer._upload_split(_Split())
    epoch_fn = trainer._build_train_epoch(n_steps, train_bs)
    key = jax.random.key(0)
    perm = jax.random.permutation(jax.random.key(1), n_rows)
    # NOTE: block_until_ready can return early through this environment's
    # remote-execution tunnel; a device->host VALUE read is the only honest
    # barrier (it is what the real training loop does via float(loss)).
    for _ in range(2):  # compile + warm
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
    train_rows_per_sec = n_rows / float(np.median(times))

    # --- same epoch with sparse (touched-rows) table updates ---
    trainer_s = Trainer(
        exp.replace(
            train=dataclasses.replace(
                exp.train, batch_size=train_bs, checkpoint_dir="/tmp/bench_ckpt_s",
                table_optimizer="rowwise_adagrad",
            )
        ),
        steps_per_epoch=n_steps,
        log_fn=lambda s: None,
    )
    data_s = trainer_s._upload_split(_Split())
    epoch_fn_s = trainer_s._build_train_epoch(n_steps, train_bs)
    for _ in range(2):
        trainer_s.state, losses = epoch_fn_s(
            trainer_s.state, data_s, perm, trainer_s._mm_tables, key
        )
        float(jnp.sum(losses))
    times_s = []
    for _ in range(3):
        t0 = time.perf_counter()
        trainer_s.state, losses = epoch_fn_s(
            trainer_s.state, data_s, perm, trainer_s._mm_tables, key
        )
        float(jnp.sum(losses))
        times_s.append(time.perf_counter() - t0)
    train_rows_per_sec_sparse = n_rows / float(np.median(times_s))

    # --- END-TO-END submission pipeline (the headline): parquet from disk
    # -> device join -> bulk scoring -> prediction CSV + submission zip.
    # Same reference workload size (47 x 8192 = 385,024 test rows,
    # Prediction.py:97) and same included work as the 163K rows/s baseline.
    import os

    from ctr_recommendation_tpu.data import ItemStore, write_synthetic_dataset

    e2e_root = "/tmp/bench_e2e_data"
    test_path = os.path.join(e2e_root, "test.parquet")
    if not os.path.exists(test_path):
        # test_frac sized so the test split is the reference's 385,024 rows
        write_synthetic_dataset(
            e2e_root, num_rows=427_805, valid_frac=0.05, test_frac=0.9,
            num_items=91_717, max_len=20, mm_dim=128, seed=3,
        )
    store = ItemStore.from_parquet(os.path.join(e2e_root, "item_info.parquet"))
    pred_e2e = Predictor(exp, params, state, fold_bn=True, item_store=store)
    out_dir = "/tmp/bench_e2e_out"

    from ctr_recommendation_tpu.inference import run_submission_pipeline

    def run_e2e():
        # the predict CLI's default path (inference/pipeline.py): record-
        # batch decode -> wire-packed single-buffer upload -> fused scoring
        # scan -> incremental native CSV -> zip, all overlapped
        written, _csv, _zip = run_submission_pipeline(
            test_path, pred_e2e, out_dir, batch_size=eval_bs
        )
        return written

    n_test = run_e2e()  # warm (compile + page cache)
    # median of 5 with spread reported in extra: the transfer link is
    # shared, and a single hiccup would otherwise swing the headline
    e2e_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_e2e()
        e2e_times.append(time.perf_counter() - t0)
    e2e_rows_per_sec = n_test / float(np.median(e2e_times))
    e2e_spread = {
        "e2e_runs_s": [round(t, 3) for t in sorted(e2e_times)],
        "e2e_best_rows_per_sec": round(n_test / min(e2e_times), 1),
    }

    # --- serving: closed-loop single-request latency on the online request
    # shape (serving/collator.py), client-supplied item_emb_d128 dense ---
    from ctr_recommendation_tpu.serving.collator import RequestCollator

    collator = RequestCollator(fm)
    req_rows = 256
    rows = [
        {
            "likes_level": int(rng.integers(0, 11)),
            "views_level": int(rng.integers(0, 11)),
            "item_id": int(rng.integers(1, 91718)),
            "item_seq": rng.integers(1, 91718, size=10).tolist(),
            "item_emb_d128": rng.standard_normal(128).astype(np.float32),
        }
        for _ in range(req_rows)
    ]
    sbatch, _n_valid = collator.collate(rows)
    float(pred_e2e(sbatch)[0])  # compile + warm
    serve_lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        float(pred_e2e(sbatch)[0])
        serve_lat.append(time.perf_counter() - t0)
    serving_p50_ms = float(np.percentile(serve_lat, 50)) * 1e3
    serving_p99_ms = float(np.percentile(serve_lat, 99)) * 1e3

    # --- MFU (matmul-only FLOPs / measured device time / chip bf16 peak).
    # Scoring: per-row eval matmuls over the measured device-only batch
    # latency. Train: fwd + backward ~= 3x the eval matmuls per example
    # (each matmul's backward is two same-size matmuls); the embedding
    # scatter/gather traffic that actually bounds the step carries no MXU
    # FLOPs, so these percentages are honest lower-is-expected numbers for
    # a memory-bound CTR model, NOT a kernel-quality score.
    chip = jax.devices()[0].device_kind
    peak = _PEAK_BF16_TFLOPS.get(chip)
    fr = _flops_per_row_eval()
    mfu_scoring = (
        fr * eval_bs / (device_scoring_ms * 1e-3) / (peak * 1e12)
        if peak
        else None
    )
    mfu_train = (
        3.0 * fr * train_rows_per_sec / (peak * 1e12) if peak else None
    )

    print(
        json.dumps(
            {
                "metric": "e2e_submission_rows_per_sec",
                "value": round(e2e_rows_per_sec, 1),
                "unit": "rows/s",
                "vs_baseline": round(e2e_rows_per_sec / BASELINE_INFER_ROWS_PER_SEC, 3),
                "extra": {
                    "backend": jax.default_backend(),
                    "chip": chip,
                    "e2e_test_rows": n_test,
                    "device_bulk_rows_per_sec": round(infer_rows_per_sec, 1),
                    "scoring_batch_ms": round(p50_ms, 3),
                    "device_scoring_ms": round(device_scoring_ms, 3),
                    "train_examples_per_sec": round(train_rows_per_sec, 1),
                    "train_examples_per_sec_sparse_tables": round(
                        train_rows_per_sec_sparse, 1
                    ),
                    "eval_batch": eval_bs,
                    "train_batch": train_bs,
                    **e2e_spread,
                    "serving_request_rows": req_rows,
                    "serving_p50_ms": round(serving_p50_ms, 2),
                    "serving_p99_ms": round(serving_p99_ms, 2),
                    "peak_bf16_tflops": peak,
                    "mfu_scoring_pct": (
                        round(100 * mfu_scoring, 2) if mfu_scoring else None
                    ),
                    "mfu_train_pct": (
                        round(100 * mfu_train, 2) if mfu_train else None
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
