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


# ---------------- pure-numpy unit tests (no Spark session) ----------------


def test_flat_index_chunk_invariance():
    """eval() must be chunking-invariant: the max_edge_instances bound is a
    cache budget, never a semantic knob."""
    import numpy as np

    from osmi_water_spark.functions import wkb as W

    rng = np.random.RandomState(7)
    items = []
    for i in range(50):
        cx, cy = rng.uniform(-10, 10, 2)
        n = rng.randint(3, 12)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(0.5, 2.0, n)
        ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        items.append((f"k{i % 20}", W.wkb_polygon([ring])))  # keys repeat
    idx = W.FlatPolygonIndex.build(items)
    px = rng.uniform(-12, 12, 5000)
    py = rng.uniform(-12, 12, 5000)
    keys = rng.randint(0, 20, 5000)
    ref = idx.eval(px, py, keys, max_edge_instances=10**9)
    for chunk in (17, 1000, 131_072):
        got = idx.eval(px, py, keys, max_edge_instances=chunk)
        assert (got == ref).all(), chunk


def test_cell_probe_candidates():
    """candidates() expands each cell to its (sorted, deduped) key list and
    emits (row, key) pairs already lexicographically sorted and unique when
    a single resolution is probed — the fast path in _probe_refine relies
    on this."""
    import numpy as np

    from osmi_water_spark.functions import wkb as W
    from osmi_water_spark.operators.spatial_join import CellProbeIndex

    ring = np.array([[0.0, 0.0], [1, 0], [1, 1], [0, 1], [0, 0]])
    index = W.FlatPolygonIndex.build([("a", W.wkb_polygon([ring]))])
    # cover: cell 10 -> keys {1,0} (dup 0), cell 20 -> {2}
    pairs = np.array([[10, 1], [10, 0], [10, 0], [20, 2]], dtype=np.int64)
    probe = CellProbeIndex(pairs, index, [7], ["a", "b", "c"])
    rows, kk = probe.candidates(np.array([20, 10, 99, 10], dtype=np.int64))
    got = list(zip(rows.tolist(), kk.tolist()))
    assert got == [(0, 2), (1, 0), (1, 1), (3, 0), (3, 1)]
    # sorted + unique as claimed
    assert got == sorted(set(got))


def test_np_cell_of_matches_formula():
    import numpy as np

    from osmi_water_spark.functions import cells as C

    lon = np.array([-180.0, -0.1, 0.0, 179.99, 180.0])
    lat = np.array([-90.0, 45.0, 0.0, -0.1, 90.0])
    res = 7
    n = float(1 << res)
    hi = (1 << res) - 1
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, hi).astype(np.int64)
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, hi).astype(np.int64)
    want = (np.int64(res) << 58) + (iy << 29) + ix
    assert (C.np_cell_of(lon, lat, res) == want).all()


def test_probe_cover_arrow_collect_fallback(spark, monkeypatch):
    """The probe-cover collect is a single bounded Arrow pull (no Python
    Rows): with the cap forced below the cover size the join must fall
    back to the broadcast equi-join and produce identical pairs."""
    import osmi_water_spark.operators.spatial_join as SJ

    rows = [
        (float(i % 10), float(i // 10), float(i % 10) + 1.5, float(i // 10) + 1.5)
        for i in range(40)
    ]
    parts = spark.createDataFrame(
        [
            (str(i), bytes(W.wkb_polygon([np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
            )])), x0, y0, x1, y1)
            for i, (x0, y0, x1, y1) in enumerate(rows)
        ],
        "area_key string, part_wkb binary, minx double, miny double, "
        "maxx double, maxy double",
    )
    pts = spark.createDataFrame(
        [(i, float(i % 12) + 0.7, float(i % 7) + 0.7) for i in range(300)],
        "point_id long, lon double, lat double",
    )
    probe = {(r.point_id, r.area_key) for r in pip_join(pts, parts, broadcast_parts=True).collect()}
    monkeypatch.setattr(SJ, "MAX_PROBE_CELLS", 1)
    fallback = {(r.point_id, r.area_key) for r in pip_join(pts, parts, broadcast_parts=True).collect()}
    assert probe == fallback and len(probe) > 0


def test_cell_probe_index_at_cap_scale():
    """Driver-side stress: CellProbeIndex construction + a candidates()
    probe at MAX_PROBE_CELLS rows stays numpy-vectorized (seconds, not
    minutes) and correct on sampled cells."""
    import time

    from osmi_water_spark.operators.spatial_join import (
        MAX_PROBE_CELLS, CellProbeIndex,
    )

    n = MAX_PROBE_CELLS
    rng = np.random.RandomState(0)
    pairs = np.column_stack([
        rng.randint(0, n // 2, size=n).astype(np.int64),
        rng.randint(0, 1000, size=n).astype(np.int64),
    ])
    idx = W.FlatPolygonIndex.build(
        (str(i), bytes(W.wkb_polygon([np.array(
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
        )]))) for i in range(1)
    )
    t0 = time.time()
    probe = CellProbeIndex(pairs, idx, [7], [str(i) for i in range(1000)])
    build_s = time.time() - t0
    # regression bound: an interpreted per-row build takes MINUTES at 4M
    # rows; the vectorized build takes seconds. 120s keeps the guard while
    # tolerating this host's documented multi-x window noise (a 30s bound
    # flaked at 37s in a loaded round-5 window).
    assert build_s < 120.0, f"cap-scale probe build took {build_s:.1f}s"
    # sampled correctness: candidates for one cell == the deduped pair set
    cell = int(pairs[0, 0])
    want = np.unique(pairs[pairs[:, 0] == cell][:, 1])
    rows_idx, keys = probe.candidates(np.array([cell], dtype=np.int64))
    assert (np.sort(keys) == want).all() and (rows_idx == 0).all()
