"""Old-vs-new token-hash micro-walls on the same batch (VERDICT.md r4
next #2): rule the round-4 byte-position hashing rewrite in or out as the
cause of the BENCH_r04 minhash/simhash regressions.

Compares, on identical distinct-token arrays extracted exactly the way
``_token_hashes_batch`` does from the sf0.1 documents corpus:

  crc32  OLD  — round-3 path: ``np.fromiter((zlib.crc32(t.encode()) ...))``
         NEW  — round-4 path: ``_crc32_strs`` (table-driven byte-position)
  simhash OLD — round-3 path: per-token ``hashlib.blake2b`` digest
          NEW — round-4 path: ``_fnv1a64_strs`` (byte-wise FNV-1a-64)

plus the ADVERSARIAL long-token batch for the round-5 vectorization of the
per-position live-count (VERDICT.md r4 What's-wrong #4): one multi-KB
unbroken token used to pay a Python-level ``np.searchsorted`` per byte
position; the live counts are now one vectorized call. The old per-position
variant is re-implemented inline here for the A/B.

Prints one JSON line; fold into BENCH.md's reconciliation table.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmi_water_spark.operators.dedup import (  # noqa: E402
    _CRC32_TABLE,
    _crc32_strs,
    _flat_utf8,
    _fnv1a64_strs,
    _TOKEN_RE,
)


def _old_crc32(uniques) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(t.encode()) for t in uniques), dtype=np.uint64, count=len(uniques)
    )


def _old_blake2b(uniques) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            for t in uniques
        ),
        dtype=np.uint64,
        count=len(uniques),
    )


def _per_position_crc32(strs) -> np.ndarray:
    """The round-4 pre-fix loop body: one Python-level searchsorted PER
    byte position (kept here only as the A/B for the round-5 fix)."""
    data, offs = _flat_utf8(strs)
    lens = np.diff(offs)
    n = lens.size
    order = np.argsort(-lens, kind="stable")
    lens_s, starts_s = lens[order], offs[:-1][order]
    neg = -lens_s
    h = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    for k in range(int(lens_s[0]) if n else 0):
        m = int(np.searchsorted(neg, -(k + 1), side="right"))
        if m == 0:
            break
        h[:m] = _CRC32_TABLE[(h[:m] ^ data[starts_s[:m] + k]) & np.uint32(0xFF)] ^ (
            h[:m] >> np.uint32(8)
        )
    out = np.empty(n, dtype=np.uint32)
    out[order] = h
    return (out ^ np.uint32(0xFFFFFFFF)).astype(np.uint64)


def _best(f, *a, reps: int = 5) -> float:
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        f(*a)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import duckdb

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = int(os.environ.get("SPARK_GRAFT_THB_DOCS", "5000"))
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{sf}/documents.parquet') LIMIT {n_docs}"
        ).fetchall()
    ]
    flat = []
    for t in texts:
        flat.extend(x for x in _TOKEN_RE.split((t or "").lower()) if x)
    import pandas as pd

    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    uniq_list = list(uniques)

    # value identity first — a fast wrong hash is not a result
    assert np.array_equal(_crc32_strs(uniq_list), _old_crc32(uniq_list))
    assert np.array_equal(_per_position_crc32(uniq_list), _old_crc32(uniq_list))

    out = {
        "sf_dir": sf,
        "docs": len(texts),
        "tokens": len(flat),
        "distinct_tokens": len(uniq_list),
        "crc32_old_fromiter_ms": round(_best(_old_crc32, uniq_list) * 1e3, 3),
        "crc32_new_bytepos_ms": round(_best(_crc32_strs, uniq_list) * 1e3, 3),
        "simhash_old_blake2b_ms": round(_best(_old_blake2b, uniq_list) * 1e3, 3),
        "simhash_new_fnv_ms": round(_best(_fnv1a64_strs, uniq_list) * 1e3, 3),
    }

    # adversarial: 200 normal tokens + ONE 32 KiB unbroken token
    adv = uniq_list[:200] + ["x" * 32768]
    assert np.array_equal(_crc32_strs(adv), _old_crc32(adv))

    def _scalar_fnv(s: str) -> int:
        h = 14695981039346656037
        for b in s.encode():
            h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        return h

    assert np.array_equal(
        _fnv1a64_strs(adv),
        np.array([_scalar_fnv(s) for s in adv], dtype=np.uint64),
    )
    out["adv_longtoken_perpos_ms"] = round(_best(_per_position_crc32, adv) * 1e3, 3)
    out["adv_longtoken_vectorized_ms"] = round(_best(_crc32_strs, adv) * 1e3, 3)
    out["adv_longtoken_fnv_ms"] = round(_best(_fnv1a64_strs, adv) * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
