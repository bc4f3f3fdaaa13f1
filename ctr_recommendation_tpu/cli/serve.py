"""Serve CLI — online scoring over HTTP.

The reference has no online path at all (its only inference is the offline
submission script, src/Prediction.py); this stands up the same checkpoint as
a latency-oriented service: BN-folded (optionally fused-Pallas) Predictor,
fixed-bucket request collation, dynamic micro-batching across concurrent
clients. See ctr_recommendation_tpu/serving/.

    ctr-serve --data-root data/MicroLens_1M_x1 --checkpoint-dir checkpoints \
              --port 8080
    curl -s localhost:8080/v1/score -d '{"rows": [{"item_id": 7,
        "likes_level": 3, "views_level": 2, "item_seq": [5, 9, 12]}]}'
"""

from __future__ import annotations

import argparse


def build_service(args):
    from ctr_recommendation_tpu.utils import compilation_cache

    compilation_cache.enable()

    import dataclasses
    import os

    from ctr_recommendation_tpu.config import microlens_experiment, serialize
    from ctr_recommendation_tpu.config.schema import MeshConfig
    from ctr_recommendation_tpu.data import ItemStore
    from ctr_recommendation_tpu.features import build_feature_map
    from ctr_recommendation_tpu.inference import Predictor
    from ctr_recommendation_tpu.serving import ScoringService
    from ctr_recommendation_tpu.training import Trainer

    exp_json = os.path.join(args.checkpoint_dir, "experiment.json")
    if os.path.exists(exp_json):
        # self-describing checkpoint (same contract as cli/predict.py)
        exp = serialize.load(exp_json)
        root = args.data_root
        exp = exp.replace(
            dataset=dataclasses.replace(
                exp.dataset,
                data_root=root,
                item_info=os.path.join(root, "item_info.parquet"),
            ),
            train=dataclasses.replace(exp.train, checkpoint_dir=args.checkpoint_dir),
            mesh=MeshConfig(),  # serving ignores the training mesh
        )
    else:
        exp = microlens_experiment(
            data_root=args.data_root,
            model=args.model,
            checkpoint_dir=args.checkpoint_dir,
        )

    store = ItemStore.from_parquet(
        exp.dataset.item_info,
        id_col=exp.dataset.item_info_key,
        emb_col=exp.dataset.item_info_emb_col,
    )
    trainer = Trainer(exp, steps_per_epoch=1, log_fn=print)
    trainer.load_best()
    pred = Predictor(
        exp, trainer.state.params, trainer.state.model_state, item_store=store
    )
    buckets = tuple(int(b) for b in args.buckets.split(",")) if args.buckets else None
    service = ScoringService(
        pred,
        build_feature_map(exp.dataset),
        model_name=exp.model.model,
        buckets=buckets,
        max_wait_ms=args.max_wait_ms,
    )
    return service


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Online CTR scoring over HTTP")
    p.add_argument("--data-root", required=True,
                   help="directory holding item_info.parquet (the item join)")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--model", default="mm_fibinet",
                   help="fallback when the checkpoint has no experiment.json")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--buckets", default=None,
                   help="comma-separated batch buckets (default 16..8192)")
    p.add_argument("--max-wait-ms", type=float, default=2.0,
                   help="micro-batcher linger before dispatching a partial batch")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip pre-compiling every bucket shape at startup")
    args = p.parse_args(argv)

    from ctr_recommendation_tpu.serving import make_http_server

    service = build_service(args)
    if not args.no_warmup:
        print(f"[serve] warming {len(service.collator.buckets)} bucket shapes…")
        service.warmup()
    server = make_http_server(service, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(f"[serve] {service.model_name} listening on http://{host}:{port} "
          f"(buckets={list(service.collator.buckets)}, "
          f"max_wait={args.max_wait_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.server_close()
        service.close()
        print(f"[serve] stats: {service.stats()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
