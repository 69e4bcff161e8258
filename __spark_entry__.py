"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship graft operation (the salted cell-indexed
point-in-polygon join + raster/vector tile assignment) over the sf0.001
tables; ``queries``/``oracle_sql`` expose every implemented SURVEY.md §2
operator with DuckDB-checkable oracles (osmi_water_spark/plans/
testdata_queries.py documents the derivation scheme).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIP spatial join + tile assignment on /root/testdata/sf0.001."""
    from osmi_water_spark.functions import cells as C
    from osmi_water_spark.plans import testdata_queries as Q

    sf = "/root/testdata/sf0.001"
    pairs = Q._pip_query(spark, sf, salt=4)
    pts = Q._nodes_geo(spark, sf).select(F.col("node_id").alias("point_id"), "lon", "lat")
    return pairs.join(pts, "point_id").select(
        "point_id",
        "poly_id",
        C.tile_id(F.col("lon"), F.col("lat"), Q.Z_TILE).alias("tile_id"),
        C.cell_of(F.col("lon"), F.col("lat"), Q.RES_CELL).alias("cell_id"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osmi_water_spark.plans.testdata_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from osmi_water_spark.plans.testdata_queries import ORACLES

    return dict(ORACLES)
