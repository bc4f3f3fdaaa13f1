"""MicroBatcher / RequestCollator request-isolation and validation tests.

Round-3 advisor findings: coalescing must not contaminate independent
requests (one malformed chunk failing innocent neighbors; a client-dense
chunk 400-ing a server-join chunk via the all-or-none rule), ids of
non-hashed tables must be range-checked (XLA gather clamps OOB ids — HTTP
200 with silently wrong scores), non-dict rows must 400 instead of dropping
the connection, and close() must not strand late submitters.
"""

import dataclasses
import threading
import time

import numpy as np
import pytest

from ctr_recommendation_tpu.config.schema import (
    DatasetConfig,
    FeatureSpec,
    FeatureType,
)
from ctr_recommendation_tpu.features import build_feature_map
from ctr_recommendation_tpu.serving.collator import RequestCollator
from ctr_recommendation_tpu.serving.server import MicroBatcher


class FakePredictor:
    """Deterministic predictor double: prob = item_id / 1000, with an
    optional dwell to emulate device dispatch time."""

    def __init__(self, delay_s: float = 0.0):
        self.delay_s = delay_s
        self.calls = 0

    def __call__(self, batch):
        self.calls += 1
        if self.delay_s:
            time.sleep(self.delay_s)
        return batch["item_id"].astype(np.float32) / 1000.0


@pytest.fixture
def collator(tiny_feature_map):
    return RequestCollator(tiny_feature_map, buckets=(4, 16, 64))


def test_collate_rejects_out_of_range_categorical(collator):
    # tiny fixture: item vocab 200, cate vocab 11 (non-hashed tables)
    with pytest.raises(ValueError, match="item_id.*outside"):
        collator.collate([{"item_id": 200}])
    with pytest.raises(ValueError, match="likes_level.*outside"):
        collator.collate([{"item_id": 3, "likes_level": 11}])
    with pytest.raises(ValueError, match="item_id.*outside"):
        collator.collate([{"item_id": -1}])


def test_collate_rejects_out_of_range_sequence_id(collator):
    with pytest.raises(ValueError, match="item_seq.*outside"):
        collator.collate([{"item_id": 3, "item_seq": [1, 2, 999]}])


def test_collate_rejects_non_dict_row(collator):
    with pytest.raises(ValueError, match="row 1: expected an object"):
        collator.collate([{"item_id": 3}, 7])


def test_hashed_table_accepts_any_id():
    """Hashed tables hash raw ids on device — no range check applies."""
    ds = DatasetConfig(
        dataset_id="hashed",
        features=(
            FeatureSpec(
                name="item_id",
                type=FeatureType.CATEGORICAL,
                hash_buckets=64,
            ),
            FeatureSpec(name="label", type=FeatureType.LABEL),
        ),
        data_root="",
        label="label",
    )
    c = RequestCollator(build_feature_map(ds), buckets=(4,))
    batch, n = c.collate([{"item_id": 10**12}])
    # wrapped to the uint32 bit pattern the device hash reads
    expect = np.int64(10**12).astype(np.uint32).astype(np.int32)
    assert n == 1 and batch["item_id"][0] == expect


def test_dispatch_isolates_malformed_chunk(collator):
    """A bad request coalesced with good ones fails alone."""
    mb = MicroBatcher(FakePredictor(), collator, max_wait_ms=50.0)
    try:
        results: dict[str, object] = {}

        def call(name, rows):
            try:
                results[name] = mb.submit(rows)
            except Exception as e:  # noqa: BLE001 - recording for asserts
                results[name] = e

        threads = [
            threading.Thread(target=call, args=("good", [{"item_id": 5}])),
            threading.Thread(target=call, args=("bad", [{"item_id": 9999}])),
            threading.Thread(target=call, args=("good2", [{"item_id": 7}])),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert isinstance(results["bad"], ValueError)
        assert results["good"] == pytest.approx([0.005])
        assert results["good2"] == pytest.approx([0.007])
    finally:
        mb.close()


def test_dispatch_groups_by_dense_signature(collator, tiny_feature_map):
    """One request shipping item_emb_d128 and one relying on the server
    join must both succeed even when they co-arrive (grouped dispatches)."""
    mm_dim = next(
        f.dense_dim
        for f in tiny_feature_map.features
        if f.type == FeatureType.DENSE_EMBEDDING
    )
    mb = MicroBatcher(FakePredictor(delay_s=0.01), collator, max_wait_ms=60.0)
    try:
        results: dict[str, object] = {}

        def call(name, rows):
            try:
                results[name] = mb.submit(rows)
            except Exception as e:  # noqa: BLE001
                results[name] = e

        with_dense = [{"item_id": 5, "item_emb_d128": [0.0] * mm_dim}]
        without = [{"item_id": 7}]
        threads = [
            threading.Thread(target=call, args=("dense", with_dense)),
            threading.Thread(target=call, args=("join", without)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results["dense"] == pytest.approx([0.005])
        assert results["join"] == pytest.approx([0.007])
    finally:
        mb.close()


def test_close_drains_stragglers(collator):
    """A submit racing close() must error out, not block forever."""
    from concurrent.futures import Future

    mb = MicroBatcher(FakePredictor(), collator, max_wait_ms=1.0)
    mb.close()
    fut: Future = Future()
    mb._queue.put(([{"item_id": 1}], fut))  # simulate the lost race
    mb.close()  # idempotent; drains the stranded item
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=1)


def test_http_400_on_non_dict_rows(tiny_feature_map):
    """End-to-end: {"rows": [1, 2]} gets a JSON 400, not a dropped
    connection (AttributeError escaping the handler)."""
    import json
    import threading as _threading
    import urllib.request

    from ctr_recommendation_tpu.serving.server import (
        ScoringService,
        make_http_server,
    )

    svc = ScoringService(
        FakePredictor(),
        tiny_feature_map,
        model_name="fake",
        buckets=(4,),
        max_wait_ms=1.0,
    )
    server = make_http_server(svc, port=0)
    t = _threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/score",
            data=json.dumps({"rows": [1, 2]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=5)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "expected an object" in json.loads(e.read())["error"]
        # and a well-formed request still works
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/score",
            data=json.dumps({"rows": [{"item_id": 5}]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=5) as resp:
            assert json.loads(resp.read())["probs"] == pytest.approx([0.005])
    finally:
        server.shutdown()
        svc.close()


def test_warmup_compiles_dense_variant(collator, tiny_feature_map):
    """warmup() must touch both batch structures per bucket: with and
    without client-supplied dense columns."""
    from ctr_recommendation_tpu.serving.server import ScoringService

    seen: list[frozenset] = []

    def spy(batch):
        seen.append(frozenset(k for k in batch if k != "__weight__"))
        return np.zeros(len(batch["item_id"]), np.float32)

    svc = ScoringService(
        spy, tiny_feature_map, model_name="fake", buckets=(4, 16), max_wait_ms=1.0
    )
    try:
        svc.warmup()
    finally:
        svc.close()
    with_dense = [s for s in seen if "item_emb_d128" in s]
    without = [s for s in seen if "item_emb_d128" not in s]
    assert len(with_dense) == 2 and len(without) == 2  # one per bucket
