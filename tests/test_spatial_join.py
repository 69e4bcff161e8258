"""J5 pip_join edge cases: multi-part areas under the broadcast path, the
byte-bounded broadcast decision, and the empty-polygon-side schema contract.

The reference indexes each polygon part separately in its STRtree
(/root/reference/src/areahandler.hpp:48-62), so an area whose MultiPolygon
has several outer rings must match points inside ANY ring — in both the
broadcast and the shuffled refine paths.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmi_water_spark.functions import wkb as W
from osmi_water_spark.operators.spatial_join import (
    MAX_BROADCAST_BYTES,
    MAX_BROADCAST_PARTS,
    pip_exists,
    pip_join,
    should_broadcast_parts,
)


def _rect_wkb(x0, y0, x1, y1):
    return W.wkb_polygon(
        [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)]
    )


def _two_part_area(spark):
    """One area_key ('A') with two disjoint rectangle parts + a decoy area."""
    rows = [
        ("A", bytearray(_rect_wkb(0.0, 0.0, 1.0, 1.0)), 0.0, 0.0, 1.0, 1.0),
        ("A", bytearray(_rect_wkb(10.0, 10.0, 11.0, 11.0)), 10.0, 10.0, 11.0, 11.0),
        ("B", bytearray(_rect_wkb(20.0, 20.0, 21.0, 21.0)), 20.0, 20.0, 21.0, 21.0),
    ]
    return spark.createDataFrame(
        rows,
        "area_key string, part_wkb binary, minx double, miny double, "
        "maxx double, maxy double",
    )


def _points(spark):
    rows = [
        (1, 0.5, 0.5),    # inside part 1 of A
        (2, 10.5, 10.5),  # inside part 2 of A
        (3, 20.5, 20.5),  # inside B
        (4, 5.0, 5.0),    # outside everything
    ]
    return spark.createDataFrame(rows, "point_id long, lon double, lat double")


@pytest.mark.parametrize("broadcast", [True, False])
def test_multi_part_area_both_paths(spark, broadcast):
    parts = _two_part_area(spark)
    pts = _points(spark)
    got = {
        (r.point_id, r.area_key)
        for r in pip_join(pts, parts, broadcast_parts=broadcast).collect()
    }
    assert got == {(1, "A"), (2, "A"), (3, "B")}


def test_multi_part_area_pip_exists(spark):
    parts = _two_part_area(spark)
    pts = _points(spark)
    got = {r.point_id for r in pip_exists(pts, parts, broadcast_parts=True).collect()}
    assert got == {1, 2, 3}


def test_broadcast_decision_is_byte_bounded():
    assert should_broadcast_parts(10, 1000)
    assert should_broadcast_parts(MAX_BROADCAST_PARTS, MAX_BROADCAST_BYTES)
    # few rows of huge coastline WKB must NOT broadcast
    assert not should_broadcast_parts(100, MAX_BROADCAST_BYTES + 1)
    assert not should_broadcast_parts(MAX_BROADCAST_PARTS + 1, 1000)


def test_auto_decision_picks_nonbroadcast_for_fat_parts(spark, monkeypatch):
    """End-to-end: the auto decision consults total WKB bytes, not just the
    row count, and the non-broadcast fallback stays correct."""
    import osmi_water_spark.operators.spatial_join as SJ

    parts = _two_part_area(spark)
    pts = _points(spark)
    monkeypatch.setattr(SJ, "MAX_BROADCAST_BYTES", 8)  # everything is "fat"
    # should_broadcast_parts reads module globals via default args at call
    # time only if re-bound — pass through the public entry instead:
    got = {
        (r.point_id, r.area_key)
        for r in SJ.pip_join(pts, parts, broadcast_parts=None).collect()
    }
    assert got == {(1, "A"), (2, "A"), (3, "B")}


def test_empty_polygon_side_carries_lonlat_schema(spark):
    parts = _two_part_area(spark).limit(0)
    pts = _points(spark)
    out = pip_join(pts, parts, carry_lonlat=True)
    assert set(out.columns) == {"point_id", "area_key", "lon", "lat"}
    assert out.count() == 0
    # downstream select of lon/lat must not raise
    assert out.select("lon", "lat").count() == 0
