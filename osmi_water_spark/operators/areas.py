"""G4/O1 — water-area assembly (closed ways + multipolygon relations) and
the polygon side of the PIP index.

The reference delegates to libosmium's MultipolygonManager + Assembler
(/root/reference/src/waterinspector.cpp:103-106, :125-129) filtered by F2,
then AreaHandler (/root/reference/src/areahandler.hpp:82-98) applies the
F7 gate (polygon row) and the F5 gate (PIP index entry per polygon part).

Spark shape: closed tagged ways pass through directly; multipolygon
relations group their member way segments and an ``applyInPandas`` stage
assembles rings (greedy endpoint chaining), classifies outer/inner by
member role, and nests holes into their containing outer. Output geometry
is MultiPolygon WKB; each polygon *part* also becomes one index row with
its own bbox (matching the reference's envelope-per-polygon STRtree
inserts, areahandler.hpp:48-62).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmi_water_spark.functions import tags as TG
from osmi_water_spark.functions import wkb as W

_AREA_SCHEMA = T.StructType(
    [
        T.StructField("area_key", T.StringType(), False),
        T.StructField("geom_wkb", T.BinaryType(), True),
        T.StructField("minx", T.DoubleType(), True),
        T.StructField("miny", T.DoubleType(), True),
        T.StructField("maxx", T.DoubleType(), True),
        T.StructField("maxy", T.DoubleType(), True),
    ]
)


def _chain_rings(segments: list[np.ndarray]) -> tuple[list[np.ndarray], bool]:
    """Greedy endpoint chaining of line segments into closed rings
    (the Assembler's ring-building, osmium_geos_factory geos_factory.hpp:195-270
    re-expressed; segments may need reversing). O(n) via an endpoint hash
    map — the previous linear rescan per append made one 10k-member
    coastline relation a quadratic single task.

    Returns (rings, ok); ok is False when any chain cannot close (or a
    closed chain is degenerate, <4 points) — libosmium's Assembler errors
    the WHOLE area in that case, it does not emit the rings that did close.
    """
    segs = [np.asarray(s, dtype=np.float64) for s in segments if s is not None and len(s) >= 2]
    from collections import defaultdict

    ends: dict[tuple[float, float], list[tuple[int, bool]]] = defaultdict(list)
    for i, s in enumerate(segs):
        ends[(s[0, 0], s[0, 1])].append((i, True))
        ends[(s[-1, 0], s[-1, 1])].append((i, False))
    used = [False] * len(segs)
    rings: list[np.ndarray] = []
    ok = True
    for start in range(len(segs)):
        if used[start]:
            continue
        used[start] = True
        parts = [segs[start]]
        head = (segs[start][0, 0], segs[start][0, 1])
        tail = (segs[start][-1, 0], segs[start][-1, 1])
        while head != tail:
            cand = [e for e in ends.get(tail, ()) if not used[e[0]]]
            if not cand:
                ok = False  # open chain: the area fails
                break
            # greedy parity with the original scan order: lowest segment
            # index wins; forward orientation beats reversed at equal index
            i, is_start = min(cand, key=lambda e: (e[0], not e[1]))
            used[i] = True
            s = segs[i] if is_start else segs[i][::-1]
            parts.append(s[1:])
            tail = (s[-1, 0], s[-1, 1])
        else:
            cur = np.vstack(parts) if len(parts) > 1 else parts[0]
            if len(cur) >= 4:
                rings.append(cur)
            else:
                ok = False  # degenerate closed ring
    return rings, ok


def _ring_contains_point(ring: np.ndarray, x: float, y: float) -> bool:
    return bool(W.points_in_rings(np.array([x]), np.array([y]), [ring])[0])


def assemble_multipolygon(
    outer_segs: list[np.ndarray], inner_segs: list[np.ndarray]
) -> bytes | None:
    """Rings -> MultiPolygon WKB; each inner nested into the outer that
    contains its first vertex. Any unclosable chain fails the WHOLE area
    (libosmium Assembler semantics: the area is errored, no partial
    geometry is emitted)."""
    outers, ok_outer = _chain_rings(outer_segs)
    inners, ok_inner = _chain_rings(inner_segs)
    if not (ok_outer and ok_inner):
        return None
    if not outers:
        return None
    polys: list[list[np.ndarray]] = [[o] for o in outers]
    for hole in inners:
        hx, hy = float(hole[0, 0]), float(hole[0, 1])
        for poly in polys:
            if _ring_contains_point(poly[0], hx, hy):
                poly.append(hole)
                break
    return W.wkb_multipolygon(polys)


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    key = pdf["area_key"].iloc[0]
    outer, inner = [], []
    for role, pts in zip(pdf["role"], pdf["coords"]):
        seg = np.array([[p["lon"], p["lat"]] for p in pts], dtype=np.float64) if pts is not None and len(pts) else None
        if seg is None:
            continue
        # osmium treats empty role as outer
        (inner if role == "inner" else outer).append(seg)
    wkb = assemble_multipolygon(outer, inner)
    # bbox computed here, once at assembly, so downstream cell covers are
    # plain JVM expressions instead of a per-row WKB re-parse in Python
    bbox = W.wkb_bbox(wkb) if wkb is not None else (None, None, None, None)
    return pd.DataFrame(
        {"area_key": [key], "geom_wkb": [wkb], "minx": [bbox[0]],
         "miny": [bbox[1]], "maxx": [bbox[2]], "maxy": [bbox[3]]}
    )


def build_areas(
    ways_located: DataFrame, relations: DataFrame
) -> DataFrame:
    """All assembled water areas:
    (area_key, way_id, relation_id, tags, ts, geom_wkb[MultiPolygon]).

    Closed F2-tagged ways become single-ring areas directly (no shuffle);
    multipolygon relations shuffle once on relation id for ring assembly.
    """
    # --- closed tagged ways (from_way areas) ---
    closed = ways_located.filter(
        TG.waterpolygon_filter("tags")
        & (F.size("node_ids") >= 4)
        & (F.element_at("node_ids", 1) == F.element_at("node_ids", -1))
    )
    way_areas = closed.selectExpr(
        "concat('w', id) AS area_key",
        "id AS way_id",
        "CAST(0 AS BIGINT) AS relation_id",
        "tags",
        "ts",
        "coords",
    )
    way_areas_g = (
        way_areas.withColumn("g", _closed_way_polygon("coords"))
        .drop("coords")
        .selectExpr(
            "area_key", "way_id", "relation_id", "tags", "ts",
            "g.wkb AS geom_wkb",
            "g.minx AS minx", "g.miny AS miny", "g.maxx AS maxx", "g.maxy AS maxy",
        )
    )

    # --- multipolygon relations ---
    mp_rels = relations.filter(
        (F.col("tags").getItem("type") == "multipolygon") & TG.waterpolygon_filter("tags")
    )
    members = mp_rels.select(
        F.col("id").alias("rel_id"),
        F.explode("members").alias("m"),
    ).filter(F.col("m.type") == "way")
    segs = members.join(
        ways_located.selectExpr("id AS mw_id", "coords"),
        members["m.ref"] == F.col("mw_id"),
        "inner",
    ).selectExpr(
        "concat('r', rel_id) AS area_key",
        "m.role AS role",
        "coords",
    )
    rel_geoms = segs.groupBy("area_key").applyInPandas(_assemble_group, _AREA_SCHEMA)
    rel_areas = mp_rels.selectExpr(
        "concat('r', id) AS area_key",
        "CAST(0 AS BIGINT) AS way_id",
        "id AS relation_id",
        "tags",
        "ts",
    ).join(rel_geoms, "area_key", "inner")

    cols = ["area_key", "way_id", "relation_id", "tags", "ts", "geom_wkb",
            "minx", "miny", "maxx", "maxy"]
    both = way_areas_g.select(*cols).unionByName(rel_areas.select(*cols))
    return both.filter(F.col("geom_wkb").isNotNull())




_CW_SCHEMA = T.StructType(
    [
        T.StructField("wkb", T.BinaryType(), True),
        T.StructField("minx", T.DoubleType(), True),
        T.StructField("miny", T.DoubleType(), True),
        T.StructField("maxx", T.DoubleType(), True),
        T.StructField("maxy", T.DoubleType(), True),
    ]
)


@F.arrow_udf(_CW_SCHEMA)
def _closed_way_polygon(coords: pa.Array) -> pa.Array:
    """Closed way -> single-ring MultiPolygon WKB + bbox. The bbox rides
    along so downstream cell covers (polygon_table) run as JVM expressions
    instead of re-parsing the WKB per row in Python; min/max over the
    deduped ring equals min/max over the raw coords. Arrow-native flat
    scatter build (functions/wkb_vec.py, see make_linestring) —
    byte-identical, parity-pinned by tests/test_wkb_cells.py."""
    from osmi_water_spark.functions import wkb_vec

    return wkb_vec.closed_way_polygon_struct(coords)


def polygon_table(areas: DataFrame, cell_res: int) -> DataFrame:
    """O1 — datastorage.hpp:242-273: the polygons output table (F7 gate).

    h3_cells from the bbox columns carried out of geometry assembly — a
    whole-stage-codegen expression (functions/cells.bbox_cover_cells),
    replacing the previous per-row Python WKB re-parse. The int() vs
    floor() clamp difference is vacuous for coordinates >= -180/-90 and
    the cell iteration order (iy outer, ix inner) is identical."""
    from osmi_water_spark.functions import cells as C

    gated = areas.filter(TG.is_water_area("tags"))
    return gated.select(
        "way_id",
        "relation_id",
        TG.get_polygon_type("tags").alias("type"),
        TG.name_or_empty("tags").alias("name"),
        TG.format_lastchange("ts").alias("lastchange"),
        F.lit(None).cast("string").alias("error"),  # declared, never set
        "geom_wkb",
        C.bbox_cover_cells("minx", "miny", "maxx", "maxy", cell_res).alias("h3_cells"),
    )


_PARTS_SCHEMA = (
    "area_key string, part_wkb binary, minx double, miny double, maxx double, maxy double"
)


def pip_index(areas: DataFrame) -> DataFrame:
    """The PIP index side (F5+F7 gate, areahandler.hpp:89-90): one row per
    polygon *part* with its own envelope."""
    import pandas as _pd

    gated = areas.filter(
        TG.is_water_area("tags") & TG.is_area_to_analyse("tags")
    ).select("area_key", "geom_wkb")

    def explode_parts(batches):
        for pdf in batches:
            rows = {"area_key": [], "part_wkb": [], "minx": [], "miny": [], "maxx": [], "maxy": []}
            for key, buf in zip(pdf["area_key"], pdf["geom_wkb"]):
                if buf is None:
                    continue
                gtype, payload = W.parse_wkb(bytes(buf))
                parts = payload if gtype == W.MULTIPOLYGON else [payload]
                for rings in parts:
                    pw = W.wkb_polygon(rings)
                    allc = np.vstack(rings)
                    rows["area_key"].append(key)
                    rows["part_wkb"].append(pw)
                    rows["minx"].append(float(allc[:, 0].min()))
                    rows["miny"].append(float(allc[:, 1].min()))
                    rows["maxx"].append(float(allc[:, 0].max()))
                    rows["maxy"].append(float(allc[:, 1].max()))
            yield _pd.DataFrame(rows)

    return gated.mapInPandas(explode_parts, _PARTS_SCHEMA)
