"""Input-width guard shared by operators and queries.

A single small parquet file (often one row group, which file-split configs
cannot subdivide) scans as 1-2 partitions, so every narrow map-side stage
built on it — Arrow signature UDFs, heavy derivation projections, explode
fan-outs, partial aggregations — serializes onto 1-2 cores while the rest
of the machine idles (guide §2.6 straggler shape). ``spread_input``
round-robins such an input up to the session's parallelism; at scale the
input already has far more partitions than cores and the call is a no-op,
so no shuffle is ever added on the 100-TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to defaultParallelism iff it is narrower."""
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
