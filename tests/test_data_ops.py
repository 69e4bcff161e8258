"""Tests for the training-data operators: dedup suite, similarity search,
text analysis, multimodal plumbing, kNN."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark, docs):
    from osmi_water_spark.operators.dedup import exact_dedup

    out = exact_dedup(docs).cache()
    total = out.agg(F.sum("n_docs")).first()[0]
    assert total == docs.count()
    assert out.filter(F.col("keep_id").isNull()).count() == 0


def test_minhash_finds_near_dups(spark):
    from osmi_water_spark.operators.dedup import minhash_near_dups

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    rows = [
        (1, base), (2, base + "extra tail words here"),  # near-dup pair
        (3, "completely different content about spark shuffles and joins " * 5),
        (4, base.replace("fox", "cat")),  # still similar
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.a, r.b) for r in minhash_near_dups(df, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_minhash_deterministic(spark):
    from osmi_water_spark.operators.dedup import minhash_signature

    s1 = minhash_signature("hello world foo bar baz qux")
    s2 = minhash_signature("hello world foo bar baz qux")
    assert (s1 == s2).all()


def test_simhash_near_dups(spark):
    from osmi_water_spark.operators.dedup import simhash_near_dups

    base = " ".join(f"word{i}" for i in range(60))
    rows = [
        (1, base),
        (2, base.replace("word7", "changed")),  # one token differs
        (3, " ".join(f"other{i}" for i in range(60))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.a, r.b): r.hamming for r in simhash_near_dups(df, max_hamming=12).collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_embedding_near_dups(spark):
    from osmi_water_spark.operators.dedup import embedding_near_dups

    rs = np.random.RandomState(7)
    v = rs.randn(64)
    rows = [
        (1, (v / np.linalg.norm(v)).tolist()),
        (2, ((v + 0.01 * rs.randn(64)) / np.linalg.norm(v)).tolist()),
        (3, rs.randn(64).tolist()),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r.a, r.b) for r in embedding_near_dups(df, threshold=0.99).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_cosine_topk_matches_numpy(spark, emb):
    from osmi_water_spark.operators.similarity import cosine_topk_bruteforce

    queries = emb.filter(F.col("vec_id") < 3)
    got = cosine_topk_bruteforce(emb, queries, k=4).collect()
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.vstack([r.embedding for r in rows]).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in range(3):
        qv = m[ids == qid][0]
        cos = m @ qv
        order = sorted(zip(-cos, ids), key=lambda t: (t[0], t[1]))
        want = [int(i) for c, i in order if i != qid][:4]
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid]
        assert mine == want, f"query {qid}"


def test_cosine_ivf_recall(spark, emb):
    from osmi_water_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(emb, queries, k=3).collect()
    approx = cosine_topk_ivf(emb, queries, k=3, bits=6, probe_flips=2).collect()
    e = {(r.query_id, r.neighbor_id) for r in exact}
    a = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(e & a) / len(e)
    # testdata embeddings are near-uniform-random (top cosine ~0.33) — the
    # worst case for LSH; multiprobe at 2 flips scans ~1/3 of buckets
    assert recall >= 0.4, f"IVF recall too low: {recall}"


def test_text_stats(spark):
    from osmi_water_spark.operators.text import text_stats

    df = spark.createDataFrame(
        [(1, "the cat and the dog. both fine!"), (2, "der hund und die katze und so")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text_stats(df).collect()}
    assert got[1].n_tokens == 7 and got[1].n_punct == 2
    assert got[1].lang_guess == "en" and got[2].lang_guess == "de"
    assert 0 <= got[1].quality <= 100
    assert len(got[1].fp) == 16


def test_knn_exact_and_cells(spark):
    from osmi_water_spark.operators.knn import knn_join_cells, knn_join_exact

    pts = spark.createDataFrame(
        [(i, float(i) * 0.001, 0.0) for i in range(20)], "point_id long, lon double, lat double"
    )
    nbr = spark.createDataFrame(
        [(100 + i, float(i) * 0.001 + 0.0004, 0.0) for i in range(20)],
        "neighbor_id long, lon double, lat double",
    )
    exact = knn_join_exact(pts, nbr, k=2).collect()
    by_pt = {}
    for r in exact:
        by_pt.setdefault(r.point_id, []).append((r.rank, r.neighbor_id))
    # nearest neighbor of point i is 100+i (0.0004 away)
    for i in range(20):
        assert sorted(by_pt[i])[0][1] == 100 + i
    # cell variant at fine res agrees on rank-1 (all points within one ring)
    cells = knn_join_cells(pts, nbr, k=1, res=12, ring=1).collect()
    for r in cells:
        assert r.neighbor_id == 100 + r.point_id


def test_multimodal_plumbing(spark):
    from osmi_water_spark.operators.multimodal import (
        decode_stub,
        fake_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, 30)
    feats = fake_features(media).collect()
    assert len(feats) == 30
    assert all(len(r.features) == 16 for r in feats)
    # deterministic
    feats2 = fake_features(media).collect()
    assert {r.media_id: r.features for r in feats} == {r.media_id: r.features for r in feats2}
    frames = frame_sample_plan(media)
    assert frames.count() > 0
    with pytest.raises(NotImplementedError):
        decode_stub(media)
