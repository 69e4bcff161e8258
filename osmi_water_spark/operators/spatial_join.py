"""J5 — the cell-indexed point-in-polygon join (the engine's one custom
physical strategy, SURVEY.md §4/§7.3).

Reference: STRtree envelope query + PreparedPolygon::contains
(/root/reference/src/areahandler.hpp:37-64,
/root/reference/src/falsepositives.hpp:116-144). Spark shape:

  polygons --adaptive bbox cover--> (cell, part)      [bounded fan-out]
  points   --cell per resolution--> (cell, point)     [<= #resolutions rows]
  equi-join on cell            == envelope pre-filter
  vectorized ray-cast refine   == prepared contains
  distinct(point, area)        == first-containing-polygon break

Scale properties: the only shuffle is the cell equi-join; polygon fan-out
is bounded by ``max_cells`` per part (big polygons coarsen resolution
instead of exploding); point fan-out is bounded by the number of distinct
cover resolutions actually present (collected, tiny). Dense cells are
optionally *salted*: the polygon side replicates cell rows k ways and
points pick a deterministic salt from their id hash, spreading one hot
cell across k shuffle partitions (BASELINE.json:6 skew mitigation). AQE
skew-join splitting stays on underneath.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmi_water_spark.functions import cells as C
from osmi_water_spark.functions import wkb as W

REFINE_SCHEMA = "point_id long, area_key string"


def _refine_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Exact containment refine: group each Arrow batch by polygon part and
    ray-cast all its candidate points at once (per-part numpy, no per-point
    Python)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        outs = []
        for (key, buf), grp in pdf.groupby(["area_key", "part_wkb"], sort=False):
            mask = W.points_in_wkb_polygon(
                grp["lon"].to_numpy(), grp["lat"].to_numpy(), bytes(buf)
            )
            hit = grp.loc[mask, ["point_id"]].copy()
            hit["area_key"] = key
            outs.append(hit)
        yield (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame({"point_id": pd.Series(dtype="int64"), "area_key": pd.Series(dtype="object")})
        )


def pip_join(
    points: DataFrame,
    polygon_parts: DataFrame,
    res_min: int = 3,
    res_max: int = C.DEFAULT_RES,
    max_cells: int = C.MAX_COVER_CELLS,
    salt: int = 1,
) -> DataFrame:
    """points(point_id, lon, lat) x parts(area_key, part_wkb, minx..maxy)
    -> contained pairs (point_id, area_key), deduplicated.

    ``salt`` > 1 replicates the polygon side k ways and routes each point to
    one deterministic replica — use when single cells are hot.
    """
    spark = points.sparkSession
    cover = polygon_parts.withColumn(
        "res",
        C.adaptive_cover_res(
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), res_min, res_max, max_cells
        ),
    ).withColumn(
        "cell",
        F.explode(
            C.adaptive_cover_cells(
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
                res_min, res_max, max_cells,
            )
        ),
    )

    # which resolutions are actually present? (tiny driver-side list)
    res_rows = cover.select("res").distinct().collect()
    res_list = sorted({r.res for r in res_rows})
    if not res_list:
        return spark.createDataFrame([], REFINE_SCHEMA)

    pts = points.select(
        "point_id",
        "lon",
        "lat",
        F.explode(C.cell_of_multi(F.col("lon"), F.col("lat"), res_list)).alias("cell"),
    )

    if salt > 1:
        cover = cover.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        pts = pts.withColumn("salt", F.pmod(F.hash("point_id"), F.lit(salt)))
        keys = ["cell", "salt"]
    else:
        keys = ["cell"]

    # envelope check before the exact refine (cheap column filter, mirrors
    # the STRtree envelope query precisely):
    cand = pts.join(
        cover.select(*keys, "area_key", "part_wkb", "minx", "miny", "maxx", "maxy"), keys, "inner"
    ).filter(
        (F.col("lon") >= F.col("minx")) & (F.col("lon") <= F.col("maxx"))
        & (F.col("lat") >= F.col("miny")) & (F.col("lat") <= F.col("maxy"))
    )

    refined = cand.select("point_id", "area_key", "part_wkb", "lon", "lat").mapInPandas(
        _refine_batches, REFINE_SCHEMA
    )
    return refined.dropDuplicates(["point_id", "area_key"])


def pip_exists(points: DataFrame, polygon_parts: DataFrame, **kw) -> DataFrame:
    """Semi-join flavor: point_ids contained in ANY polygon (the reference's
    break-at-first-hit, falsepositives.hpp:137-139)."""
    return pip_join(points, polygon_parts, **kw).select("point_id").distinct()
