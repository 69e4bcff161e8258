"""J6 — kNN point matching (graft addition per BASELINE.json:6).

The reference matches endpoints by exact node-id equality only
(/root/reference/src/waterway.hpp:383-391); the graft adds
proximity-tolerant matching:

* ``knn_join_exact`` — brute-force: broadcast the (small) right side and
  window-rank by distance. Exact, oracle-checkable; right side must fit
  in a broadcast.
* ``knn_join_cells`` — scale path: candidates from a k-ring cell join
  (bounded fan-out: (2k+1)^2 cells/point), then window top-k. Approximate
  at ring edges (documented); one shuffle on cell id.

Distances are squared-euclidean in degrees (monotonic for ranking),
ties broken by neighbor id — fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmi_water_spark.functions import cells as C


def _ranked(cand: DataFrame, k: int) -> DataFrame:
    dx = F.col("lon") - F.col("n_lon")
    dy = F.col("lat") - F.col("n_lat")
    dist = dx * dx + dy * dy  # plain multiplies (bit-identical to the SQL oracle)
    w = Window.partitionBy("point_id").orderBy(dist.asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("dist2", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("point_id", "rank", "neighbor_id", "dist2")
    )


def knn_join_exact(points: DataFrame, neighbors: DataFrame, k: int = 3) -> DataFrame:
    """points(point_id, lon, lat) x neighbors(neighbor_id, lon, lat) ->
    (point_id, rank, neighbor_id, dist2), rank<=k. Broadcast nested loop —
    right side small by contract."""
    n = F.broadcast(
        neighbors.select(
            F.col("neighbor_id"), F.col("lon").alias("n_lon"), F.col("lat").alias("n_lat")
        )
    )
    return _ranked(points.crossJoin(n), k)


def knn_join_cells(
    points: DataFrame, neighbors: DataFrame, k: int = 3, res: int = C.DEFAULT_RES, ring: int = 1
) -> DataFrame:
    """Cell-bucketed approximate kNN: candidates share a cell within the
    k-ring. Misses true neighbors farther than ``ring`` cells (pick res so
    the expected k-th distance fits inside the ring)."""
    pts = points.select(
        "point_id", "lon", "lat",
        F.explode(C.k_ring(C.cell_of(F.col("lon"), F.col("lat"), res), ring)).alias("cell"),
    )
    nbr = neighbors.select(
        "neighbor_id",
        F.col("lon").alias("n_lon"),
        F.col("lat").alias("n_lat"),
        C.cell_of(F.col("lon"), F.col("lat"), res).alias("cell"),
    )
    cand = pts.join(nbr, "cell", "inner").dropDuplicates(["point_id", "neighbor_id"])
    return _ranked(cand, k)
