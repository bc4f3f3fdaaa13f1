"""Device-only serving latency across batch sizes.

bench.py reports the reference workload's batch (8192). Real serving picks a
batch for its latency SLO, so this sweep reports the fused-scoring path's
device-only latency per batch size. Methodology: run one-program lax.scans
of k and 2k batches and take (T(2k) - T(k)) / k — the dispatch/tunnel floor
cancels in the difference (subtracting a separately-measured floor proved
too noisy for sub-100us batches on the shared tunnel).
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


def main() -> None:
    compilation_cache.enable()

    from __graft_entry__ import _fake_batch
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
