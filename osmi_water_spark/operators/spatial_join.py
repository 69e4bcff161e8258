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
REFINE_SCHEMA_LONLAT = "point_id long, area_key string, lon double, lat double"

# broadcast-parts auto decision: both bounds must hold. The byte bound is
# the one that matters at scale — 200k coastline parts can be multi-GB of
# WKB, which would OOM the driver long before the row count trips.
MAX_BROADCAST_PARTS = 200_000
MAX_BROADCAST_BYTES = 128 << 20


def should_broadcast_parts(n_parts: int, n_bytes: int,
                           max_parts: int = MAX_BROADCAST_PARTS,
                           max_bytes: int = MAX_BROADCAST_BYTES) -> bool:
    """Pure decision function (unit-tested): broadcast only when the polygon
    side is small by BOTH row count and total WKB bytes."""
    return n_parts <= max_parts and n_bytes <= max_bytes


def _refine_batches(
    batches: Iterator[pd.DataFrame], carry_lonlat: bool = False
) -> Iterator[pd.DataFrame]:
    """Exact containment refine, fully array-based: factorize the batch by
    polygon part, slice contiguous index runs (argsort + searchsorted), and
    ray-cast each part's candidate points in one vectorized call. No
    per-group pandas objects — per-part cost is the ray cast itself (the
    naive groupby/concat version paid ~0.5 ms of pandas overhead per tiny
    group, which dominated the whole pipeline at scale)."""
    import numpy as np

    for pdf in batches:
        if len(pdf) == 0:
            continue
        ids = pdf["point_id"].to_numpy()
        lon = pdf["lon"].to_numpy()
        lat = pdf["lat"].to_numpy()
        keys = pdf["area_key"].to_numpy()
        codes, uniques = pd.factorize(pdf["part_wkb"], sort=False)
        order = np.argsort(codes, kind="stable")
        sorted_codes = codes[order]
        bounds = np.searchsorted(sorted_codes, np.arange(len(uniques) + 1))
        keep = np.zeros(len(pdf), dtype=bool)
        for c in range(len(uniques)):
            idx = order[bounds[c] : bounds[c + 1]]
            if idx.size == 0:
                continue
            m = W.points_in_wkb_polygon(lon[idx], lat[idx], bytes(uniques[c]))
            keep[idx[m]] = True
        out = {"point_id": ids[keep], "area_key": keys[keep]}
        if carry_lonlat:
            out["lon"] = lon[keep]
            out["lat"] = lat[keep]
        yield pd.DataFrame(out)


def pip_join(
    points: DataFrame,
    polygon_parts: DataFrame,
    res_min: int = 3,
    res_max: int = C.DEFAULT_RES,
    max_cells: int = C.MAX_COVER_CELLS,
    salt: int = 1,
    res_list: list[int] | None = None,
    broadcast_parts: bool | None = None,
    dedup_pairs: bool = True,
    carry_lonlat: bool = False,
) -> DataFrame:
    """points(point_id, lon, lat) x parts(area_key, part_wkb, minx..maxy)
    -> contained pairs (point_id, area_key), deduplicated.

    ``salt`` > 1 replicates the polygon side k ways and routes each point to
    one deterministic replica — use when single cells are hot.

    ``broadcast_parts``: when the polygon set is small (the common case —
    polygons << points), the WKB geometries are shipped once per executor
    as a broadcast dict and the join/shuffle carries only (cell, area_key,
    bbox) — at wide-polygon scale the per-candidate WKB payload is the
    shuffle bottleneck. None = auto (broadcast when <= 200k parts).
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

    # which resolutions can be present? Either supplied by the caller
    # (no extra job; point fan-out = len(res_list), matches are exact) or
    # discovered with one tiny collect.
    if res_list is None:
        res_rows = cover.select("res").distinct().collect()
        res_list = sorted({r.res for r in res_rows})
    if not res_list:
        return spark.createDataFrame(
            [], REFINE_SCHEMA_LONLAT if carry_lonlat else REFINE_SCHEMA
        )

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

    if broadcast_parts is None:
        stats = polygon_parts.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.length("part_wkb")), F.lit(0)).alias("nbytes"),
        ).collect()[0]
        broadcast_parts = should_broadcast_parts(
            int(stats["n"]), int(stats["nbytes"]),
            MAX_BROADCAST_PARTS, MAX_BROADCAST_BYTES,
        )
    schema = REFINE_SCHEMA_LONLAT if carry_lonlat else REFINE_SCHEMA

    # envelope check before the exact refine (cheap column filter, mirrors
    # the STRtree envelope query precisely):
    env = (
        (F.col("lon") >= F.col("minx")) & (F.col("lon") <= F.col("maxx"))
        & (F.col("lat") >= F.col("miny")) & (F.col("lat") <= F.col("maxy"))
    )
    if broadcast_parts:
        # area_key -> ALL part WKBs: a multi-part area (e.g. a multipolygon
        # with two outer rings, areahandler.hpp:48-62 indexes each part
        # separately) emits several index rows under one key — a plain dict
        # would keep only one part and silently drop points inside the rest.
        wkb_by_key: dict[str, list[bytes]] = {}
        for r in polygon_parts.select("area_key", "part_wkb").collect():
            wkb_by_key.setdefault(r["area_key"], []).append(bytes(r["part_wkb"]))
        bc = spark.sparkContext.broadcast(wkb_by_key)
        cand = pts.join(
            cover.select(*keys, "area_key", "minx", "miny", "maxx", "maxy"), keys, "inner"
        ).filter(env)

        def refine_bc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            lookup = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                # each row tests every part of its area, so (point, area)
                # duplicates within the batch are redundant work
                pdf = pdf[["point_id", "area_key", "lon", "lat"]].drop_duplicates(
                    ["point_id", "area_key"]
                )
                ids = pdf["point_id"].to_numpy()
                lon = pdf["lon"].to_numpy()
                lat = pdf["lat"].to_numpy()
                keys_arr = pdf["area_key"].to_numpy()
                codes, uniques = pd.factorize(pdf["area_key"], sort=False)
                order = np.argsort(codes, kind="stable")
                bounds = np.searchsorted(codes[order], np.arange(len(uniques) + 1))
                keep = np.zeros(len(pdf), dtype=bool)
                for c in range(len(uniques)):
                    idx = order[bounds[c] : bounds[c + 1]]
                    if idx.size == 0:
                        continue
                    pending = idx
                    for part in lookup.get(uniques[c], ()):
                        m = W.points_in_wkb_polygon(lon[pending], lat[pending], part)
                        keep[pending[m]] = True
                        pending = pending[~m]
                        if pending.size == 0:
                            break
                out = {"point_id": ids[keep], "area_key": keys_arr[keep]}
                if carry_lonlat:
                    out["lon"] = lon[keep]
                    out["lat"] = lat[keep]
                yield pd.DataFrame(out)

        refined = cand.select("point_id", "area_key", "lon", "lat").mapInPandas(
            refine_bc, schema
        )
    else:
        cand = pts.join(
            cover.select(*keys, "area_key", "part_wkb", "minx", "miny", "maxx", "maxy"),
            keys, "inner",
        ).filter(env)
        refined = cand.select("point_id", "area_key", "part_wkb", "lon", "lat").mapInPandas(
            lambda it: _refine_batches(it, carry_lonlat), schema
        )
    return refined.dropDuplicates(["point_id", "area_key"]) if dedup_pairs else refined


def pip_exists(points: DataFrame, polygon_parts: DataFrame, **kw) -> DataFrame:
    """Semi-join flavor: point_ids contained in ANY polygon (the reference's
    break-at-first-hit, falsepositives.hpp:137-139). Skips the pair-level
    dedup shuffle — only the point-id distinct remains."""
    return (
        pip_join(points, polygon_parts, dedup_pairs=False, **kw)
        .select("point_id")
        .distinct()
    )
