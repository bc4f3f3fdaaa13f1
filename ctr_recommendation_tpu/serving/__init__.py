"""Online serving: request collation, dynamic micro-batching, HTTP server.

The reference ships only offline batch scoring (src/Prediction.py — a
DataLoader loop writing a Kaggle CSV). A production CTR system also needs an
ONLINE path: score a handful of candidate items for one user within a few
milliseconds. This package provides that on top of the same Predictor the
batch path uses, designed for how TPUs are actually served:

* requests are collated to a FIXED menu of batch-size buckets so XLA compiles
  each shape exactly once (dynamic shapes would recompile per request);
* concurrent requests are coalesced by a micro-batcher into one device
  dispatch (the chip's 256-row scoring latency is ~70 us device-side — the
  win is amortizing the dispatch, not the math);
* the HTTP front end is stdlib-only (no framework dependency to pin).
"""

from ctr_recommendation_tpu.serving.collator import RequestCollator
from ctr_recommendation_tpu.serving.server import (
    MicroBatcher,
    ScoringService,
    make_http_server,
)

__all__ = [
    "RequestCollator",
    "MicroBatcher",
    "ScoringService",
    "make_http_server",
]
