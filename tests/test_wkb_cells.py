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
