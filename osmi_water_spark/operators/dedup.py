"""Deduplication operators for the training-data pipeline: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Plan shape (the part that matters at 100 TB): signatures are computed in
one Arrow-batched pass (numpy per batch, no per-row Python); candidate
generation is an equi-join on (band, band_hash) bucket keys — never an
all-pairs comparison; verification touches only bucket-collision pairs.
All hashing is explicitly seeded -> byte-stable across runs, partitions,
and cluster sizes.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MERSENNE = (1 << 61) - 1
_NUM_PERM = 64
_SEED = 42
_rs = np.random.RandomState(_SEED)
_A = _rs.randint(1, _MERSENNE, size=_NUM_PERM, dtype=np.int64)
_B = _rs.randint(0, _MERSENNE, size=_NUM_PERM, dtype=np.int64)
_TOKEN_RE = re.compile(r"\W+")


# ---------------- exact ----------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: (text_hash, n_docs, keep_id=min id).
    One shuffle on the 128-bit content hash; map-side partial agg free."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


# ---------------- shingles + minhash ----------------


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.array(
        sorted({zlib.crc32(g.encode()) for g in grams}), dtype=np.int64
    )


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    h = _shingle_hashes(text, n)
    if h.size == 0:
        return np.zeros(_NUM_PERM, dtype=np.int64)
    # (a*x + b) mod p for all perms at once: (P, S) matrix min over shingles
    vals = (np.multiply.outer(_A, h) + _B[:, None]) % _MERSENNE
    return vals.min(axis=1)


# flat-array permutation work is chunked so each (64, S) int64 intermediate
# stays ~8 MB: small enough to be L3-resident AND to be served from reused
# heap pages after the first iteration. Big fresh allocations are poison in
# this sandbox — first-touch page faults cost 100-400x normal (measured:
# one 133 MB numpy op = 16 s cold in a fresh pyspark worker, 0.04 s warm),
# and they're a real (if smaller) cost on any machine.
_PERM_CHUNK = 16_384


def minhash_signatures_batch(texts, n: int = 3) -> np.ndarray:
    """Whole-batch minhash: shingle-hash every doc, concatenate into ONE
    flat array, run the 64 permutations as a single (chunked) vectorized
    pass, and segment-min back per doc with np.minimum.reduceat — instead
    of one tiny numpy call per document (whose fixed overhead dominated at
    scale). Bit-identical to minhash_signature per doc (same hashes, same
    int64 wrap arithmetic, min is order-independent)."""
    per_doc = [_shingle_hashes(t or "", n) for t in texts]
    lengths = np.array([h.size for h in per_doc], dtype=np.int64)
    out = np.zeros((len(per_doc), _NUM_PERM), dtype=np.int64)
    nonempty = np.flatnonzero(lengths > 0)
    if nonempty.size == 0:
        return out
    flat = np.concatenate([per_doc[i] for i in nonempty])
    starts = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(lengths[nonempty][:-1], out=starts[1:])
    # chunk along the shingle axis on doc boundaries
    mins = np.empty((nonempty.size, _NUM_PERM), dtype=np.int64)
    doc_lo = 0
    while doc_lo < nonempty.size:
        doc_hi = doc_lo + 1
        while (
            doc_hi < nonempty.size
            and starts[doc_hi] - starts[doc_lo] < _PERM_CHUNK
        ):
            doc_hi += 1
        lo = starts[doc_lo]
        hi = starts[doc_hi] if doc_hi < nonempty.size else flat.size
        vals = (np.multiply.outer(_A, flat[lo:hi]) + _B[:, None]) % _MERSENNE
        seg = starts[doc_lo:doc_hi] - lo
        mins[doc_lo:doc_hi] = np.minimum.reduceat(vals, seg, axis=1).T
        doc_lo = doc_hi
    out[nonempty] = mins
    return out


@pandas_udf(T.ArrayType(T.LongType()))
def minhash_udf(text: pd.Series) -> pd.Series:
    sigs = minhash_signatures_batch(text.tolist())
    return pd.Series(list(sigs.tolist()))


def minhash_bands(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bands: int = 16, rows: int = 4,
) -> DataFrame:
    """doc -> (doc_id, band, band_hash) bucket rows (LSH banding)."""
    assert bands * rows == _NUM_PERM
    sig = docs.select(F.col(id_col).alias("doc_id"), minhash_udf(F.col(text_col)).alias("sig"))
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1).cast("string") for r in range(rows)])).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))


def lsh_candidate_pairs(
    bucketed: DataFrame, salt: int = 1, max_bucket: int | None = None
) -> DataFrame:
    """Bucket self-join -> distinct candidate pairs (a < b). The join key is
    (band, band_hash) so hot buckets are the only skew surface.

    Skew controls for dup-heavy corpora (where one bucket can hold millions
    of docs and the naive self-join is O(n^2) in ONE task):

    * ``salt`` > 1 spreads each bucket's pair work over ``salt`` shuffle
      partitions (left side keeps its hash-salt, right side replicates to
      every salt) — exact, same pairs, k-way parallel hot buckets.
    * ``max_bucket`` caps the quadratic blow-up itself: buckets larger than
      the cap emit a STAR (min-id representative paired with every other
      member, n-1 pairs) instead of all n(n-1)/2 pairs. Connectivity for
      near-dup clustering is preserved (every member still links to the
      representative); only redundant intra-cluster edges are dropped.
      Over-cap buckets are all-same-signature groups, i.e. near-certain
      duplicate clusters — the exact-verify stage still gates each kept edge.

    The bucket rows are repartitioned ONCE up front: every branch below
    (sizes agg, small/big splits, both self-join sides) then reads the same
    reused Exchange instead of re-running the signature UDF per reference —
    and a single-partition input (one small parquet file) stops serializing
    the whole signature pass onto one core.
    """
    b = bucketed.repartition("band", "band_hash")
    if max_bucket is not None:
        sizes = b.groupBy("band", "band_hash").agg(F.count("*").alias("bsz"))
        b = b.join(sizes, ["band", "band_hash"], "inner")
        small = b.filter(F.col("bsz") <= max_bucket).drop("bsz")
        big = b.filter(F.col("bsz") > max_bucket).drop("bsz")
        reps = big.groupBy("band", "band_hash").agg(F.min("doc_id").alias("a"))
        star = (
            big.join(reps, ["band", "band_hash"], "inner")
            .filter(F.col("doc_id") != F.col("a"))
            .select("a", F.col("doc_id").alias("b"))
        )
    else:
        small, star = b, None

    l = small.select("band", "band_hash", F.col("doc_id").alias("a"))
    r = small.select("band", "band_hash", F.col("doc_id").alias("b"))
    keys = ["band", "band_hash"]
    if salt > 1:
        l = l.withColumn("salt", F.pmod(F.hash("a"), F.lit(salt)))
        r = r.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        keys = keys + ["salt"]
    pairs = (
        l.join(r, keys, "inner")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


_VERIFY_SCHEMA = "a long, b long, jaccard double"


def verify_jaccard(pairs: DataFrame, docs: DataFrame, text_col="text", id_col="doc_id",
                   n: int = 3, threshold: float = 0.7) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs only (join back the two
    texts, one Arrow pass)."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
    joined = (
        pairs.join(d.withColumnRenamed("doc_id", "a").withColumnRenamed("t", "ta"), "a")
        .join(d.withColumnRenamed("doc_id", "b").withColumnRenamed("t", "tb"), "b")
    )

    def batch(it):
        for pdf in it:
            # candidates repeat texts heavily (one doc pairs with many) —
            # shingle each distinct text once per batch
            cache: dict[str, frozenset] = {}

            def sh(t):
                key = t or ""
                r = cache.get(key)
                if r is None:
                    r = frozenset(_shingle_hashes(key, n))
                    cache[key] = r
                return r

            out = {"a": [], "b": [], "jaccard": []}
            for a, b, ta, tb in zip(pdf["a"], pdf["b"], pdf["ta"], pdf["tb"]):
                sa, sb = sh(ta), sh(tb)
                j = len(sa & sb) / len(sa | sb) if (sa or sb) else 0.0
                out["a"].append(a)
                out["b"].append(b)
                out["jaccard"].append(j)
            yield pd.DataFrame(out)

    return joined.mapInPandas(batch, _VERIFY_SCHEMA).filter(F.col("jaccard") >= threshold)


def minhash_near_dups(
    docs: DataFrame, threshold: float = 0.7,
    salt: int = 1, max_bucket: int | None = None, **kw,
) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle -> minhash -> band -> bucket-join
    -> exact-verify. ``salt``/``max_bucket`` are the hot-bucket controls
    (see lsh_candidate_pairs)."""
    pairs = lsh_candidate_pairs(minhash_bands(docs, **kw), salt=salt, max_bucket=max_bucket)
    return verify_jaccard(pairs, docs, threshold=threshold, **{k: v for k, v in kw.items() if k in ("text_col", "id_col")})


# ---------------- simhash ----------------


def _token_hash(t: str, _cache: dict = {}) -> int:  # noqa: B006 (intentional)
    h = _cache.get(t)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        if len(_cache) < 1_000_000:  # bounded per-worker memo
            _cache[t] = h
    return h


def simhash64(text: str) -> int:
    toks = [t for t in _TOKEN_RE.split((text or "").lower()) if t]
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in toks:
        h = np.uint64(_token_hash(t))
        bits = (h >> shifts) & np.uint64(1)
        acc += 2 * bits.astype(np.int64) - 1
    out = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return out - (1 << 64) if out >= (1 << 63) else out  # signed 64


def simhash_batch(texts) -> np.ndarray:
    """Whole-batch simhash: hash each distinct token once (memoized), expand
    all token occurrences of the batch into ONE (T, 64) sign matrix, and
    segment-sum per doc with np.add.reduceat — no per-document numpy calls.
    Bit-identical to simhash64 (the +-1 sums are exact integers, order-
    independent)."""
    flat: list[int] = []
    offsets = [0]
    for s in texts:
        toks = [t for t in _TOKEN_RE.split((s or "").lower()) if t]
        flat.extend(_token_hash(t) for t in toks)
        offsets.append(len(flat))
    out = np.zeros(len(texts), dtype=np.int64)
    if not flat:
        return out
    h = np.array(flat, dtype=np.uint64)
    lengths = np.diff(np.array(offsets, dtype=np.int64))
    nonempty = np.flatnonzero(lengths > 0)
    starts = np.array(offsets, dtype=np.int64)[nonempty]
    ends = starts + lengths[nonempty]
    shifts = np.arange(64, dtype=np.uint64)
    # chunk the (T, 64) sign expansion on doc boundaries (~16k tokens ->
    # ~8 MB intermediates): keeps the working set cache-resident and on
    # reused heap pages (see _PERM_CHUNK note on first-touch fault cost)
    acc = np.empty((nonempty.size, 64), dtype=np.int64)
    doc_lo = 0
    while doc_lo < nonempty.size:
        doc_hi = doc_lo + 1
        while doc_hi < nonempty.size and ends[doc_hi - 1] - starts[doc_lo] < 16_384:
            doc_hi += 1
        lo, hi = starts[doc_lo], ends[doc_hi - 1]
        contrib = (
            2 * ((h[lo:hi, None] >> shifts) & np.uint64(1)).astype(np.int64) - 1
        )
        acc[doc_lo:doc_hi] = np.add.reduceat(contrib, starts[doc_lo:doc_hi] - lo, axis=0)
        doc_lo = doc_hi
    packed = ((acc > 0).astype(np.uint64) << shifts).sum(axis=1)
    out[nonempty] = packed.view(np.int64)  # two's-complement reinterpret
    return out


@pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return pd.Series(simhash_batch(text.tolist()))


def simhash_candidates(docs: DataFrame, text_col="text", id_col="doc_id",
                       chunks: int = 4) -> DataFrame:
    """Candidate pairs sharing any 16-bit simhash chunk (classic 64/4 split:
    catches all pairs with hamming distance <= 3)."""
    sh = docs.select(F.col(id_col).alias("doc_id"), simhash_udf(F.col(text_col)).alias("sh"))
    w = 64 // chunks
    chunk_cols = [
        F.struct(F.lit(c).alias("chunk"),
                 F.shiftrightunsigned("sh", c * w).bitwiseAND(F.lit((1 << w) - 1)).alias("val"))
        for c in range(chunks)
    ]
    b = sh.select("doc_id", "sh", F.explode(F.array(*chunk_cols)).alias("cc")).select(
        "doc_id", "sh", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val")
    )
    # one shared Exchange: the simhash UDF runs once (in parallel even off a
    # single-partition file); both self-join sides reuse it
    b = b.repartition("chunk", "val")
    l = b.select("chunk", "val", F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    r = b.select("chunk", "val", F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    pairs = (
        l.join(r, ["chunk", "val"], "inner").filter(F.col("a") < F.col("b"))
        .select("a", "b", "sha", "shb").distinct()
    )
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return pairs.select("a", "b", hamming.alias("hamming"))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    return simhash_candidates(docs, **kw).filter(F.col("hamming") <= max_hamming)


# ---------------- embedding cosine near-dup ----------------

_HYPER = np.random.RandomState(_SEED + 1).randn(16, 64)


@pandas_udf(T.IntegerType())
def hyperplane_bucket(emb: pd.Series) -> pd.Series:
    """16-bit random-hyperplane LSH bucket (seeded) for 64-dim embeddings."""
    m = np.vstack(emb.to_numpy())
    signs = (m @ _HYPER.T) > 0
    return pd.Series((signs * (1 << np.arange(16))).sum(axis=1).astype(np.int32))


def embedding_near_dups(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, salt: int = 1, max_bucket: int | None = None,
) -> DataFrame:
    """Cosine near-dups via hyperplane-LSH buckets + in-bucket exact cosine.
    The bucket join replaces the O(N^2) comparison; recall tunable by bits.
    ``salt`` spreads a hot bucket's pair work k ways (exact); ``max_bucket``
    switches over-cap buckets to a min-id star (connectivity-preserving cap
    on the quadratic pair count — a dup-heavy corpus collapses into few
    buckets, and emitting every intra-cluster edge is pointless)."""
    b = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
        hyperplane_bucket(F.col(vec_col)).alias("bucket"),
    ).repartition("bucket")  # shared Exchange: bucket UDF once, all readers reuse
    star = None
    if max_bucket is not None:
        sizes = b.groupBy("bucket").agg(F.count("*").alias("bsz"))
        b = b.join(sizes, "bucket", "inner")
        big = b.filter(F.col("bsz") > max_bucket).drop("bsz")
        b = b.filter(F.col("bsz") <= max_bucket).drop("bsz")
        reps = big.groupBy("bucket").agg(F.min("vid").alias("rep"))
        star = (
            big.join(reps, "bucket", "inner")
            .filter(F.col("vid") != F.col("rep"))
            .join(
                big.select("bucket", F.col("vid").alias("rep"),
                           F.col("v").alias("va")).dropDuplicates(["bucket", "rep"]),
                ["bucket", "rep"], "inner",
            )
            .select(F.col("rep").alias("a"), F.col("vid").alias("b"),
                    "va", F.col("v").alias("vb"))
        )
    l = b.select("bucket", F.col("vid").alias("a"), F.col("v").alias("va"))
    r = b.select("bucket", F.col("vid").alias("b"), F.col("v").alias("vb"))
    keys = ["bucket"]
    if salt > 1:
        l = l.withColumn("salt", F.pmod(F.hash("a"), F.lit(salt)))
        r = r.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        keys = ["bucket", "salt"]
    pairs = l.join(r, keys, "inner").filter(F.col("a") < F.col("b")).select(
        "a", "b", "va", "vb"
    )
    if star is not None:
        pairs = pairs.unionByName(star)

    def batch(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            # float64: the threshold decision must not wobble at float32
            # precision (and the DuckDB oracle computes in DOUBLE)
            va = np.vstack(pdf["va"].to_numpy()).astype(np.float64)
            vb = np.vstack(pdf["vb"].to_numpy()).astype(np.float64)
            cos = (va * vb).sum(1) / (
                np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1) + 1e-12
            )
            yield pd.DataFrame({"a": pdf["a"], "b": pdf["b"], "cosine": cos})

    out = pairs.select("a", "b", "va", "vb").mapInPandas(batch, "a long, b long, cosine double")
    return out.filter(F.col("cosine") >= threshold).dropDuplicates(["a", "b"])
