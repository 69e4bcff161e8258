"""Stage C — waterway assembly: J2 (relation members), G2/G3 (linestrings),
O2/O3 writers, E5 (degenerate-way errors), and the connectivity input.

Re-expresses /root/reference/src/waterway.hpp's RelationsManager protocol
as two declarative joins (SURVEY.md §3.2):

* accepted relations (F1)  ⋈  ways on member ref   -> member way rows
  (complete and incomplete relations handled uniformly — the reference
  emits whatever members it has, waterway.hpp:341-343 + :357-362)
* valid ways  ▷  member refs of accepted relations -> standalone rows
  (way_not_in_any_relation, waterway.hpp:348-352)

Reference quirks replicated exactly:
* member ways are written once **per relation membership** and remembered
  for connectivity each time (waterway.hpp:209 inside the relation loop);
* members need no waterway tag of their own (only type==way,
  waterway.hpp:324-326);
* ``contains_nowaterway_ways`` is set when a member HAS a waterway tag
  (inverted name, waterway.hpp:203-205) and only counts members whose
  geometry succeeded;
* degenerate ways (<2 distinct consecutive coords, the ``use_nodes::unique``
  rule of geos_factory.hpp:171-193) produce a way_error node at the way's
  raw first node instead of a way row (waterway.hpp:160-166).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from osmi_water_spark.functions import cells as C
from osmi_water_spark.functions import tags as TG
from osmi_water_spark.functions import wkb as W
from osmi_water_spark.functions.width import width_struct

_LS_SCHEMA = T.StructType(
    [
        T.StructField("wkb", T.BinaryType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("minx", T.DoubleType(), True),
        T.StructField("miny", T.DoubleType(), True),
        T.StructField("maxx", T.DoubleType(), True),
        T.StructField("maxy", T.DoubleType(), True),
    ]
)


@pandas_udf(_LS_SCHEMA)
def make_linestring(coords: pd.Series) -> pd.DataFrame:
    """G2 — located coords -> LineString WKB + bbox. Consecutive duplicate
    coordinates deduped (use_nodes::unique); <2 remaining points -> ok=false
    (the reference's geometry_error path)."""
    n = len(coords)
    out = {"wkb": [None] * n, "ok": [False] * n,
           "minx": [None] * n, "miny": [None] * n, "maxx": [None] * n, "maxy": [None] * n}
    for i, pts in enumerate(coords):
        if pts is None or len(pts) == 0:
            continue
        a = np.array([[p["lon"], p["lat"]] for p in pts], dtype=np.float64)
        if len(a) > 1:
            keep = np.ones(len(a), dtype=bool)
            keep[1:] = (a[1:] != a[:-1]).any(axis=1)
            a = a[keep]
        if len(a) < 2:
            continue
        out["wkb"][i] = W.wkb_linestring(a)
        out["ok"][i] = True
        out["minx"][i] = float(a[:, 0].min())
        out["miny"][i] = float(a[:, 1].min())
        out["maxx"][i] = float(a[:, 0].max())
        out["maxy"][i] = float(a[:, 1].max())
    return pd.DataFrame(out)


@pandas_udf(T.BinaryType())
def merge_multilinestring(wkbs: pd.Series) -> pd.Series:
    """G3 — member linestrings -> MultiLineString (a geometry *collection*,
    not a noded union — waterway.hpp:236-237)."""

    def merge(lst):
        parts = [W.parse_wkb(b)[1] for b in lst if b is not None]
        return W.wkb_multilinestring(parts) if parts else None

    return wkbs.map(merge)


def accepted_relations(relations: DataFrame) -> DataFrame:
    """F1 relation gate (new_relation, waterway.hpp:319-322)."""
    return relations.filter(TG.is_waterway(F.col("tags"), True))


def member_way_pairs(relations: DataFrame, ways_located: DataFrame) -> DataFrame:
    """J2 — accepted relations x their way members (inner join keeps exactly
    the members present, i.e. incomplete relations emit the matched subset)."""
    rels = accepted_relations(relations).select(
        F.col("id").alias("relation_id"),
        F.col("tags").alias("rel_tags"),
        F.col("ts").alias("rel_ts"),
        F.posexplode("members").alias("member_pos", "member"),
    ).filter(F.col("member.type") == "way")
    return rels.join(
        ways_located.withColumnRenamed("id", "member_way_id"),
        rels["member.ref"] == F.col("member_way_id"),
        "inner",
    )


def standalone_ways(relations: DataFrame, ways_located: DataFrame) -> DataFrame:
    """Valid ways not referenced by any accepted relation (anti-join).
    Referenced-but-invalid ways stay excluded even when the relation is
    incomplete (the RelationsManager keeps them out of
    way_not_in_any_relation regardless)."""
    refs = (
        accepted_relations(relations)
        .select(F.explode("members").alias("m"))
        .filter(F.col("m.type") == "way")
        .select(F.col("m.ref").alias("ref"))
        .distinct()
    )
    return (
        ways_located.filter(TG.is_waterway(F.col("tags"), False))
        .join(refs, ways_located["id"] == refs["ref"], "left_anti")
    )


def build_way_rows(relations: DataFrame, ways_located: DataFrame) -> DataFrame:
    """All candidate way-feature rows (pre-geometry): member rows once per
    membership + standalone rows with relation_id=0."""
    members = member_way_pairs(relations, ways_located).select(
        F.col("member_way_id").alias("id"),
        "node_ids",
        "tags",
        "ts",
        "coords",
        "relation_id",
        "member_pos",
    )
    singles = standalone_ways(relations, ways_located).select(
        "id", "node_ids", "tags", "ts", "coords",
        F.lit(0).cast("long").alias("relation_id"),
        F.lit(0).alias("member_pos"),
    )
    return members.unionByName(singles)


def assemble_ways(way_rows: DataFrame, cell_res: int = C.DEFAULT_RES) -> dict[str, DataFrame]:
    """way rows -> {'ways': O3 table rows, 'remembered': connectivity input,
    'way_errors': E5 node-candidate rows, 'geoms': per-membership geometry}."""
    g = way_rows.withColumn("ls", make_linestring("coords"))
    g = g.withColumn("way_type", TG.get_way_type(F.col("tags"))).cache()

    ok = g.filter(F.col("ls.ok"))
    wd = ok.withColumn("wd", width_struct(TG.get_width_tag(F.col("tags"))))
    ways_out = wd.select(
        F.col("id").alias("way_id"),
        F.col("way_type").alias("type"),
        TG.name_or_empty(F.col("tags")).alias("name"),
        F.element_at("node_ids", 1).cast("string").alias("firstnode"),
        F.element_at("node_ids", -1).cast("string").alias("lastnode"),
        "relation_id",
        F.lit(None).cast("string").alias("width"),  # parsed, never written (quirk)
        TG.format_lastchange(F.col("ts")).alias("lastchange"),
        TG.get_construction(F.col("tags")).alias("construction"),
        F.when(F.col("wd.width_error"), "true").otherwise("false").alias("width_error"),
        F.lit(None).cast("string").alias("tagging_error"),
        F.col("ls.wkb").alias("geom_wkb"),
        C.bbox_cover_cells(
            F.col("ls.minx"), F.col("ls.miny"), F.col("ls.maxx"), F.col("ls.maxy"), cell_res
        ).alias("h3_cells"),
    )

    # remember_way (datastorage.hpp:203-210): raw first/last refs, '' name,
    # category from the way type — once per emitted way row (duplicates kept)
    remembered = ok.select(
        F.element_at("node_ids", 1).alias("first_node"),
        F.element_at("node_ids", -1).alias("last_node"),
        TG.name_or_empty(F.col("tags")).alias("name"),
        TG.get_waterway_category(F.col("way_type")).alias("category"),
    )

    # E5: degenerate geometry -> way_error at the raw first node
    way_errors = (
        g.filter(~F.col("ls.ok"))
        .select(F.element_at("node_ids", 1).alias("node_id"))
        .filter(F.col("node_id").isNotNull())
    )

    geoms = g.filter(F.col("ls.ok")).select(
        "relation_id", F.col("id").alias("way_id"), "member_pos",
        F.col("ls.wkb").alias("wkb"),
        TG.has_waterway_tag(F.col("tags")).alias("has_ww"),
    )
    return {"ways": ways_out, "remembered": remembered, "way_errors": way_errors, "geoms": geoms}


def assemble_relations(
    relations: DataFrame, geoms: DataFrame, cell_res: int = C.DEFAULT_RES
) -> DataFrame:
    """O2 — one MultiLineString row per relation with >=1 successful member
    geometry; nowaterway_error quirk as in waterway.hpp:203-205."""
    # member order made explicit (collect_list alone is nondeterministic
    # under parallelism — SURVEY.md §7.4 determinism note)
    per_rel = (
        geoms.filter(F.col("relation_id") != 0)
        .groupBy("relation_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("member_pos", "wkb"))),
                lambda s: s["wkb"],
            ).alias("wkbs"),
            F.max(F.when(F.col("has_ww"), 1).otherwise(0)).alias("any_ww"),
        )
    )
    rels = accepted_relations(relations).select(
        F.col("id").alias("relation_id"), "tags", "ts"
    )
    joined = per_rel.join(rels, "relation_id", "inner")
    out = joined.select(
        "relation_id",
        TG.get_way_type(F.col("tags")).alias("type"),
        TG.name_or_empty(F.col("tags")).alias("name"),
        TG.format_lastchange(F.col("ts")).alias("lastchange"),
        F.when(F.col("any_ww") == 1, "true").otherwise("false").alias("nowaterway_error"),
        F.lit(None).cast("string").alias("tagging_error"),
        merge_multilinestring("wkbs").alias("geom_wkb"),
    )
    return out.withColumn("h3_cells", _wkb_cover_cells(F.col("geom_wkb"), F.lit(cell_res)))


_COVER_SCHEMA = T.ArrayType(T.LongType())


@pandas_udf(_COVER_SCHEMA)
def _wkb_cover_cells(wkb: pd.Series, res: pd.Series) -> pd.Series:
    """bbox cover cells of an arbitrary WKB geometry (output decoration)."""
    r = int(res.iloc[0]) if len(res) else C.DEFAULT_RES
    nx = 1 << r

    def cover(b):
        if b is None:
            return None
        minx, miny, maxx, maxy = W.wkb_bbox(bytes(b))
        ix0 = min(max(int((minx + 180.0) / 360.0 * nx), 0), nx - 1)
        ix1 = min(max(int((maxx + 180.0) / 360.0 * nx), 0), nx - 1)
        iy0 = min(max(int((miny + 90.0) / 180.0 * nx), 0), nx - 1)
        iy1 = min(max(int((maxy + 90.0) / 180.0 * nx), 0), nx - 1)
        return [
            (r << C.RES_BITS_SHIFT) | (iy << C.IY_SHIFT) | ix
            for iy in range(iy0, iy1 + 1)
            for ix in range(ix0, ix1 + 1)
        ]

    return wkb.map(cover)
