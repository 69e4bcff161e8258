"""Generate tests/fixtures/emb_skew.parquet — a deterministic SKEWED
embedding corpus for the ``embedding_near_dups_capped`` oracle entry.

The driver-generated embeddings tables are too uniform for the skew
branches: at sf0.01 the largest 16-bit hyperplane bucket holds 2 vectors,
so ``max_bucket`` can never bind there (measured round 5). This corpus is
built so the star-cap and salt-replication branches of
``operators/dedup.embedding_near_dups`` actually execute under the oracle
gate (VERDICT.md r4 next #7, the same treatment minhash got with
``minhash_near_dups_capped``):

  - one 24-vector tight cluster (base + small noise) -> a single over-cap
    bucket that the cap collapses to a (min-id, other) star;
  - one 3-vector cluster -> a second over-cap bucket;
  - 73 background vectors -> singleton/small buckets.

The fixture is INPUT DATA shared by both sides — the oracle itself is
DuckDB SQL (testdata_queries.SQL_EMB_NEAR_DUPS_CAPPED) that independently
recomputes bucket assignment, bucket sizes, the star cap, and the exact
cosine verify in DOUBLE. Because the two engines may sum dot products in
different orders, generation ASSERTS numeric margins: every hyperplane dot
is bounded away from 0 and every candidate cosine away from the threshold,
so a last-ulp summation difference can never flip a decision. It also
asserts the cap BINDS: >=1 over-cap bucket, and the capped pair set
genuinely differs from the uncapped one.
"""

from __future__ import annotations

import os
import sys
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmi_water_spark.operators.dedup import _HYPER  # noqa: E402

SEED = 777
THRESHOLD = 0.8
CAP = 2
DIM = 64


def make_corpus() -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(SEED)
    u = rs.randn(DIM)
    big = u[None, :] + 0.05 * rs.randn(24, DIM)  # tight cluster, one bucket
    v = rs.randn(DIM)
    mid = v[None, :] + 0.05 * rs.randn(3, DIM)  # second over-cap bucket
    bg = rs.randn(73, DIM)
    m = np.vstack([big, mid, bg]).astype(np.float32).astype(np.float64)
    ids = np.arange(m.shape[0], dtype=np.int64)
    return ids, m


def buckets_of(m: np.ndarray) -> np.ndarray:
    signs = (m @ _HYPER.T) > 0
    return (signs * (1 << np.arange(16))).sum(axis=1).astype(np.int32)


def pair_sets(ids, m, bucket, cap):
    """(uncapped qualifying pairs, capped qualifying pairs, n_overcap,
    min |cosine - THRESHOLD| over candidates) with the engine's semantics."""
    by = {}
    for i, b in enumerate(bucket):
        by.setdefault(int(b), []).append(i)

    def cos(i, j):
        return float(
            m[i] @ m[j]
            / (np.linalg.norm(m[i]) * np.linalg.norm(m[j]) + 1e-12)
        )

    uncapped, capped = set(), set()
    n_overcap, margin = 0, np.inf
    for idxs in by.values():
        idxs = sorted(idxs, key=lambda i: ids[i])
        all_pairs = list(combinations(idxs, 2))
        over = len(idxs) > cap
        if over:
            n_overcap += 1
        star = [(idxs[0], o) for o in idxs[1:]]
        for i, j in all_pairs:
            c = cos(i, j)
            margin = min(margin, abs(c - THRESHOLD))
            if c >= THRESHOLD:
                uncapped.add((int(ids[i]), int(ids[j])))
        for i, j in star if over else all_pairs:
            if cos(i, j) >= THRESHOLD:
                capped.add((int(ids[i]), int(ids[j])))
    return uncapped, capped, n_overcap, margin


def main() -> None:
    ids, m = make_corpus()
    # decision-margin guards (see module docstring)
    hyper_margin = float(np.abs(m @ _HYPER.T).min())
    assert hyper_margin > 1e-6, f"hyperplane dot too close to 0: {hyper_margin}"
    bucket = buckets_of(m)
    # the two clusters each land in ONE bucket (noise small enough)
    assert len(set(bucket[:24].tolist())) == 1, "big cluster split across buckets"
    assert len(set(bucket[24:27].tolist())) == 1, "mid cluster split across buckets"
    uncapped, capped, n_overcap, margin = pair_sets(ids, m, bucket, CAP)
    assert margin > 1e-6, f"cosine too close to threshold: {margin}"
    assert n_overcap >= 2, f"cap={CAP} starred only {n_overcap} buckets"
    assert capped != uncapped, "cap did not change the output pair set"
    assert len(capped) >= 10, f"too few capped pairs to be a real check: {len(capped)}"

    fdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures",
    )
    os.makedirs(fdir, exist_ok=True)
    out = os.path.join(fdir, "emb_skew.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in m], pa.list_(pa.float32())
            ),
        }),
        out,
    )
    print(
        f"emb_skew: {len(ids)} vectors -> {out}; over-cap buckets={n_overcap}, "
        f"uncapped pairs={len(uncapped)}, capped pairs={len(capped)}, "
        f"min decision margin={margin:.3e}, min |hyper dot|={hyper_margin:.3e}"
    )


if __name__ == "__main__":
    main()
