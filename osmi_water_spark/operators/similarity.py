"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and an IVF-style bucketed variant (the scale path).

Brute force broadcasts the query set (queries << corpus) and computes the
corpus x queries dot products in one numpy matmul per Arrow batch — the
corpus is streamed, never collected, so this scales to any corpus size
with O(|Q| x d) memory per task. The IVF variant prunes the corpus by
coarse LSH cell first (probe = own cell + neighbors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmi_water_spark.operators.dedup import _HYPER


def cosine_topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    exclude_self: bool = True, max_queries: int = 100_000,
) -> DataFrame:
    """-> (query_id, rank, neighbor_id, cosine); rank by (-cosine, id).

    The query set is collected + broadcast by contract (queries << corpus);
    ``max_queries`` guards the driver against a caller passing the corpus
    as the query side."""
    spark = corpus.sparkSession
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .limit(max_queries + 1)
        .collect()
    )
    if len(q) > max_queries:
        raise ValueError(
            f"cosine_topk_bruteforce broadcasts the query side; got more than "
            f"{max_queries} query rows — swap sides or raise max_queries"
        )
    if not q:
        return spark.createDataFrame([], "query_id long, rank int, neighbor_id long, cosine double")
    qids = np.array([r.query_id for r in q], dtype=np.int64)
    qm = np.vstack([np.asarray(r.qv, dtype=np.float64) for r in q])
    qm = qm / (np.linalg.norm(qm, axis=1, keepdims=True) + 1e-12)
    bq = spark.sparkContext.broadcast((qids, qm))

    def batch(it):
        ids, mat = bq.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            cm = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            cm = cm / (np.linalg.norm(cm, axis=1, keepdims=True) + 1e-12)
            sims = cm @ mat.T  # (batch, Q)
            nid = pdf["nid"].to_numpy()
            out = {
                "query_id": np.repeat(ids, len(nid)),
                "neighbor_id": np.tile(nid, len(ids)),
                "cosine": sims.T.ravel(),
            }
            yield pd.DataFrame(out)

    scored = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("v")
    ).mapInPandas(batch, "query_id long, neighbor_id long, cosine double")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def cosine_topk_ivf(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int = 6, probe_flips: int = 2, exclude_self: bool = True,
) -> DataFrame:
    """IVF/LSH-bucketed ANN: corpus bucketed by the first ``bits`` signs of
    seeded hyperplane projections; each query multiprobes its bucket and
    all buckets within ``probe_flips`` bit flips. Approximate — recall
    grows with probes; on corpora with genuinely close neighbors (high
    cosine) recall is near 1, on uniform-random vectors it degrades (the
    neighbors are barely closer than everything else)."""
    planes = _HYPER[:bits]

    def bucket_of(m: np.ndarray) -> np.ndarray:
        signs = (m @ planes.T) > 0
        return (signs * (1 << np.arange(bits))).sum(axis=1).astype(np.int64)

    def corpus_batch(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            yield pd.DataFrame({"nid": pdf["nid"], "v": pdf["v"], "bucket": bucket_of(m)})

    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("v")).mapInPandas(
        corpus_batch, "nid long, v array<double>, bucket long"
    )

    def query_batch(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf["qv"].to_numpy()).astype(np.float64)
            base = bucket_of(m)
            rows = {"query_id": [], "qv": [], "bucket": []}
            from itertools import combinations

            for qid, qv, b in zip(pdf["query_id"], pdf["qv"], base):
                probes = {int(b)}
                for nf in range(1, probe_flips + 1):
                    for combo in combinations(range(bits), nf):
                        x = int(b)
                        for i in combo:
                            x ^= 1 << i
                        probes.add(x)
                for p in sorted(probes):
                    rows["query_id"].append(qid)
                    rows["qv"].append(qv)
                    rows["bucket"].append(p)
            yield pd.DataFrame(rows)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).mapInPandas(
        query_batch, "query_id long, qv array<double>, bucket long"
    )

    cand = q.join(c, "bucket", "inner")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("nid"))

    def score(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            a = np.vstack(pdf["qv"].to_numpy()).astype(np.float64)
            b = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            cos = (a * b).sum(1) / (
                np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
            )
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "neighbor_id": pdf["nid"], "cosine": cos}
            )

    scored = cand.select("query_id", "qv", "nid", "v").mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
