"""Unit tests for the WKB codec, ray-cast PIP, and grid-cell / tile math."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from osmi_water_spark.functions import cells as C
from osmi_water_spark.functions import wkb as W


def test_wkb_roundtrip():
    p = W.wkb_point(8.5, 47.25)
    g, (x, y) = W.parse_wkb(p)
    assert g == W.POINT and (x, y) == (8.5, 47.25)

    ls = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 4.0]])
    g, a = W.parse_wkb(W.wkb_linestring(ls))
    assert g == W.LINESTRING
    np.testing.assert_array_equal(a, ls)

    g, parts = W.parse_wkb(W.wkb_multilinestring([ls, ls[::-1]]))
    assert g == W.MULTILINESTRING and len(parts) == 2

    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    g, rings = W.parse_wkb(W.wkb_polygon([ring, hole]))
    assert g == W.POLYGON and len(rings) == 2

    g, polys = W.parse_wkb(W.wkb_multipolygon([[ring, hole], [ring + 10]]))
    assert g == W.MULTIPOLYGON and len(polys) == 2 and len(polys[0]) == 2

    assert W.wkb_bbox(W.wkb_polygon([ring])) == (0.0, 0.0, 4.0, 4.0)


def test_pip_square_and_hole():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    px = np.array([2.0, 1.5, 5.0, 0.0, 3.9, 2.0])
    py = np.array([3.0, 1.5, 5.0, 0.0, 0.1, 0.0])
    got = W.points_in_rings(px, py, [ring, hole])
    # (2,3) inside; (1.5,1.5) in hole; (5,5) out; (0,0) boundary -> False
    # (3.9,0.1) inside; (2,0) boundary -> False
    assert list(got) == [True, False, False, False, True, False]


def test_pip_concave():
    # L-shape: concavity handled by even-odd
    ring = np.array(
        [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]], dtype=float
    )
    px = np.array([3.0, 3.0, 1.0])
    py = np.array([1.0, 3.0, 3.0])
    assert list(W.points_in_rings(px, py, [ring])) == [True, False, True]


def test_pip_multipolygon_wkb():
    r1 = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
    r2 = np.array([[10, 10], [12, 10], [12, 12], [10, 12], [10, 10]], dtype=float)
    mp = W.wkb_multipolygon([[r1], [r2]])
    got = W.points_in_wkb_polygon(
        np.array([1.0, 11.0, 5.0]), np.array([1.0, 11.0, 5.0]), mp
    )
    assert list(got) == [True, True, False]


def test_cell_encode_decode(spark):
    df = spark.createDataFrame([(8.54, 47.37), (-179.99, -89.99), (179.99, 89.99)], "lon double, lat double")
    out = df.select(
        C.cell_of(F.col("lon"), F.col("lat"), 7).alias("c")
    ).select(
        C.cell_res(F.col("c")).alias("r"),
        C.cell_ix(F.col("c")).alias("ix"),
        C.cell_iy(F.col("c")).alias("iy"),
    ).collect()
    for row in out:
        assert row.r == 7 and 0 <= row.ix < 128 and 0 <= row.iy < 128
    # manual check for first point
    assert out[0].ix == math.floor((8.54 + 180) / 360 * 128)
    assert out[0].iy == math.floor((47.37 + 90) / 180 * 128)


def test_bbox_cover_and_adaptive(spark):
    df = spark.createDataFrame([(0.0, 0.0, 10.0, 5.0)], "minx double, miny double, maxx double, maxy double")
    cols = [F.col(c) for c in ["minx", "miny", "maxx", "maxy"]]
    row = df.select(
        F.size(C.bbox_cover_cells(*cols, 7)).alias("n7"),
        C.adaptive_cover_res(*cols, 3, 7, 8).alias("ar"),
        F.size(C.adaptive_cover_cells(*cols, 3, 7, 8)).alias("an"),
    ).first()
    # res7 cells are 2.8125 x 1.40625 deg -> 10deg spans 4-5 cells x, 5deg 4-5 cells y
    assert row.n7 >= 12
    assert row.an <= 8  # adaptive cover respects the bound
    assert 3 <= row.ar < 7


def test_point_cell_matches_cover(spark):
    # a point inside a bbox must land in one of the cover cells (same res)
    df = spark.createDataFrame([(3.3, 2.2)], "lon double, lat double")
    row = df.select(
        C.cell_of(F.col("lon"), F.col("lat"), 6).alias("pc"),
        C.bbox_cover_cells(F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(5.0), 6).alias("cov"),
    ).first()
    assert row.pc in row.cov


def test_k_ring(spark):
    df = spark.createDataFrame([(10.0, 10.0)], "lon double, lat double")
    row = df.select(
        C.k_ring(C.cell_of(F.col("lon"), F.col("lat"), 7), 1).alias("ring")
    ).first()
    assert len(row.ring) == 9 and len(set(row.ring)) == 9


def test_tile_xy_reference_values(spark):
    # Zurich at z=10 -> x=536, y=358 (known slippy-map value)
    df = spark.createDataFrame([(8.54, 47.37)], "lon double, lat double")
    tx, ty = C.tile_xy(F.col("lon"), F.col("lat"), 10)
    row = df.select(tx.alias("x"), ty.alias("y")).first()
    assert (row.x, row.y) == (536, 358)


def test_tile_bounds_roundtrip(spark):
    df = spark.createDataFrame([(536, 358)], "tx long, ty long")
    minx, miny, maxx, maxy = C.tile_bounds(10, F.col("tx"), F.col("ty"))
    row = df.select(minx.alias("a"), miny.alias("b"), maxx.alias("c"), maxy.alias("d")).first()
    assert row.a <= 8.54 <= row.c and row.b <= 47.37 <= row.d


def test_tile_to_cells(spark):
    df = spark.createDataFrame([(536, 358)], "tx long, ty long")
    row = df.select(C.tile_to_cells(10, F.col("tx"), F.col("ty"), 7).alias("cells")).first()
    assert len(row.cells) >= 1


def test_errors_switch_poss(spark):
    from osmi_water_spark.functions import errors as E

    df = spark.createDataFrame(
        [(E.POSS_RIVERMOUTH + E.RIVER,), (E.POSS_OUTFLOW + E.RIVER,),
         (E.POSS_RIVERMOUTH + E.STREAM,), (E.DIRECTION,)],
        "m int",
    )
    got = [r.v for r in df.select(E.switch_poss(F.col("m")).alias("v")).collect()]
    assert got == [
        E.RIVER + E.END,
        E.RIVER + E.SPRING,
        E.POSS_RIVERMOUTH + E.STREAM,  # stream possibles never resolve (quirk)
        E.DIRECTION,
    ]


def test_sql_text_twins_match_column_builders(spark):
    """r6: the one-round-trip SQL-text paths (string column args) must
    produce IDENTICAL values AND types to the Column-builder paths for
    every cell/tile helper that has one."""
    import random

    rng = random.Random(11)
    rows = [
        (rng.uniform(-185, 175), rng.uniform(-95, 85), rng.uniform(0, 40), rng.uniform(0, 20))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "minx double, miny double, w double, h double").select(
        "minx", "miny",
        (F.col("minx") + F.col("w")).alias("maxx"),
        (F.col("miny") + F.col("h")).alias("maxy"),
        F.col("minx").alias("lon"), F.col("miny").alias("lat"),
    )
    pairs = [
        (C.cell_of(F.col("lon"), F.col("lat"), 7), C.cell_of("lon", "lat", 7)),
        (C.cell_of_multi(F.col("lon"), F.col("lat"), [3, 5, 7]),
         C.cell_of_multi("lon", "lat", [3, 5, 7])),
        (C.bbox_cover_cells(F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), 6),
         C.bbox_cover_cells("minx", "miny", "maxx", "maxy", 6)),
        (C.adaptive_cover_res(F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), 3, 7, 64),
         C.adaptive_cover_res("minx", "miny", "maxx", "maxy", 3, 7, 64)),
        (C.adaptive_cover_cells(F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), 3, 7, 64),
         C.adaptive_cover_cells("minx", "miny", "maxx", "maxy", 3, 7, 64)),
        (C.tile_id(F.col("lon"), F.col("lat"), 8), C.tile_id("lon", "lat", 8)),
    ]
    sel = df.select(
        *[c.alias(f"col_{i}") for i, (c, _) in enumerate(pairs)],
        *[s.alias(f"sql_{i}") for i, (_, s) in enumerate(pairs)],
    )
    sch = {f.name: f.dataType for f in sel.schema.fields}
    for i in range(len(pairs)):
        assert sch[f"col_{i}"] == sch[f"sql_{i}"], f"type mismatch at {i}"
    bad = sel.filter(
        " OR ".join(
            f"(NOT (col_{i} <=> sql_{i}))" for i in range(len(pairs))
        )
    ).count()
    assert bad == 0


def _scalar_linestring(pts):
    """Scalar spec of make_linestring (the pre-r6 pandas UDF body)."""
    import numpy as np

    from osmi_water_spark.functions import wkb as W

    if pts is None or len(pts) == 0:
        return (None, False, None, None, None, None)
    a = np.array([[p[0], p[1]] for p in pts], dtype=np.float64)
    if len(a) > 1:
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]).any(axis=1)
        a = a[keep]
    if len(a) < 2:
        return (None, False, None, None, None, None)
    return (W.wkb_linestring(a), True, float(a[:, 0].min()), float(a[:, 1].min()),
            float(a[:, 0].max()), float(a[:, 1].max()))


def _scalar_closed_way(pts):
    import numpy as np

    from osmi_water_spark.functions import wkb as W

    if pts is None or len(pts) < 4:
        return (None, None, None, None, None)
    a = np.array([[p[0], p[1]] for p in pts], dtype=np.float64)
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (a[1:] != a[:-1]).any(axis=1)
    a = a[keep]
    if len(a) < 4 or not (a[0] == a[-1]).all():
        return (None, None, None, None, None)
    return (W.wkb_multipolygon([[a]]), float(a[:, 0].min()), float(a[:, 1].min()),
            float(a[:, 0].max()), float(a[:, 1].max()))


def _coords_cases():
    import random

    rng = random.Random(3)
    cases = [None, [], [(1.0, 2.0)], [(1.0, 2.0), (1.0, 2.0)],
             [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)],
             [(0.0, 0.0), (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)],
             [(5.0, 5.0), (6.0, 5.0), (5.0, 5.0), (6.0, 5.0)]]
    for _ in range(200):
        m = rng.randint(0, 9)
        pts = [(round(rng.uniform(-180, 180), 3), round(rng.uniform(-90, 90), 3))
               for _ in range(m)]
        if pts and rng.random() < 0.5:
            pts.append(pts[-1])  # consecutive dup
        if pts and rng.random() < 0.4:
            pts.append(pts[0])  # close the ring
        cases.append(pts)
    return cases


def test_arrow_linestring_matches_scalar_spec(spark):
    from osmi_water_spark.operators.assemble import make_linestring

    cases = _coords_cases()
    rows = [( [{"lon": x, "lat": y} for x, y in c] if c is not None else None,)
            for c in cases]
    df = spark.createDataFrame(rows, "coords array<struct<lon:double,lat:double>>")
    got = df.select(make_linestring("coords").alias("g")).select(
        "g.wkb", "g.ok", "g.minx", "g.miny", "g.maxx", "g.maxy").collect()
    for c, r in zip(cases, got):
        wkb, ok, minx, miny, maxx, maxy = _scalar_linestring(c)
        assert (bytes(r.wkb) if r.wkb is not None else None) == wkb, c
        assert r.ok == ok and r.minx == minx and r.miny == miny, c
        assert r.maxx == maxx and r.maxy == maxy, c


def test_arrow_closed_way_matches_scalar_spec(spark):
    from osmi_water_spark.operators.areas import _closed_way_polygon

    cases = _coords_cases()
    rows = [( [{"lon": x, "lat": y} for x, y in c] if c is not None else None,)
            for c in cases]
    df = spark.createDataFrame(rows, "coords array<struct<lon:double,lat:double>>")
    got = df.select(_closed_way_polygon("coords").alias("g")).select(
        "g.wkb", "g.minx", "g.miny", "g.maxx", "g.maxy").collect()
    for c, r in zip(cases, got):
        wkb, minx, miny, maxx, maxy = _scalar_closed_way(c)
        assert (bytes(r.wkb) if r.wkb is not None else None) == wkb, c
        assert r.minx == minx and r.miny == miny and r.maxx == maxx and r.maxy == maxy, c


def test_arrow_point_wkb_matches_scalar_spec(spark):
    import struct

    from osmi_water_spark.plans.pipeline import _point_wkb

    rows = [(1.5, 2.5), (None, 3.0), (float("nan"), 1.0), (-180.0, 90.0), (0.0, float("nan"))]
    df = spark.createDataFrame(rows, "lon double, lat double")
    got = [r.w for r in df.select(_point_wkb("lon", "lat").alias("w")).collect()]
    hdr = struct.pack("<BI", 1, 1)
    import math

    want = [None if x is None or (isinstance(x, float) and math.isnan(x))
            else hdr + struct.pack("<dd", x, y) for x, y in rows]
    assert [bytes(g) if g is not None else None for g in got] == want
