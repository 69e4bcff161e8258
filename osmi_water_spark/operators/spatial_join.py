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
# map-side probe eligibility: the (cell, area) cover table must itself fit
# in the broadcast (16 bytes/row -> ~64 MB at the cap)
MAX_PROBE_CELLS = 4_000_000


class CellProbeIndex:
    """The whole J5 polygon side as one broadcastable object: the sorted
    (cell -> candidate area ids) cover table plus the FlatPolygonIndex.

    With it, the PIP join runs as a single narrow ``mapInArrow`` over the
    points table — no point-side explode, no shuffle join, no candidate
    materialization. At cluster scale this is the map-side-join strategy:
    the polygon side (small by the broadcast bound) ships once per
    executor; the 100-TB point side streams through untouched. Cell lookup
    is a vectorized ``searchsorted`` per batch; containment is the flat
    ray cast. Replaces the sort-merge join that dominated PIP wall time
    once the cover outgrew Spark's broadcast-join threshold."""

    def __init__(self, cover_pairs: np.ndarray, index: "W.FlatPolygonIndex",
                 res_list: list[int], keys: list):
        pairs = np.asarray(cover_pairs, dtype=np.int64).reshape(-1, 2)
        order = np.lexsort((pairs[:, 1], pairs[:, 0]))
        pairs = pairs[order]
        if len(pairs):
            # several parts of one key can cover the same cell — dedup
            first = np.ones(len(pairs), dtype=bool)
            first[1:] = (pairs[1:] != pairs[:-1]).any(axis=1)
            pairs = pairs[first]
        cells = pairs[:, 0]
        self.cand_key = pairs[:, 1]
        self.uniq_cells, starts = np.unique(cells, return_index=True)
        self.cand_start = starts.astype(np.int64)
        self.cand_count = np.diff(np.append(starts, len(cells))).astype(np.int64)
        self.index = index
        self.res_list = list(res_list)
        self.keys = np.asarray(keys, dtype=object)

    def candidates(self, cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """cells (n,) -> ragged (row_idx, key_id) candidate expansion."""
        if len(self.uniq_cells) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        pos = np.searchsorted(self.uniq_cells, cells)
        pos = np.minimum(pos, len(self.uniq_cells) - 1)
        rows = np.flatnonzero(self.uniq_cells[pos] == cells)
        p = pos[rows]
        owner, flat = W.FlatPolygonIndex._ragged(
            self.cand_start[p], self.cand_count[p]
        )
        return rows[owner], self.cand_key[flat]


def _probe_refine(
    batches: Iterator["pa.RecordBatch"], probe: "CellProbeIndex", carry_lonlat: bool
) -> Iterator["pa.RecordBatch"]:
    """Map-side PIP: per Arrow batch of points, gather candidate areas from
    the broadcast cover (one searchsorted per resolution), dedup (point,
    area) pairs, and run one flat vectorized ray cast. Zero shuffle."""
    import pyarrow as pa

    for rb in batches:
        if rb.num_rows == 0:
            continue
        ids = rb.column("point_id").to_numpy(zero_copy_only=False)
        lon = rb.column("lon").to_numpy(zero_copy_only=False)
        lat = rb.column("lat").to_numpy(zero_copy_only=False)
        rows_parts, key_parts = [], []
        for res in probe.res_list:
            r, k = probe.candidates(C.np_cell_of(lon, lat, res))
            rows_parts.append(r)
            key_parts.append(k)
        rows = np.concatenate(rows_parts) if rows_parts else np.empty(0, np.int64)
        kk = np.concatenate(key_parts) if key_parts else np.empty(0, np.int64)
        if rows.size == 0:
            continue
        if len(probe.res_list) > 1:
            # a (point, area) pair can arrive once per resolution — dedup.
            # (Single-res probes skip this: candidates() emits pairs already
            # sorted and unique — rows ascend, the per-cell key list is
            # sorted+deduped at build time.)
            order = np.lexsort((rows, kk))
            sr, sk = rows[order], kk[order]
            uniq = np.ones(order.size, dtype=bool)
            uniq[1:] = (sk[1:] != sk[:-1]) | (sr[1:] != sr[:-1])
            rows, kk = sr[uniq], sk[uniq]
        keep = probe.index.eval(lon[rows], lat[rows], kk)
        rsel, ksel = rows[keep], kk[keep]
        arrays = [
            pa.array(ids[rsel], type=pa.int64()),
            pa.array(probe.keys[ksel], type=pa.string()),
        ]
        names = ["point_id", "area_key"]
        if carry_lonlat:
            arrays += [pa.array(lon[rsel]), pa.array(lat[rsel])]
            names += ["lon", "lat"]
        yield pa.RecordBatch.from_arrays(arrays, names)


def should_broadcast_parts(n_parts: int, n_bytes: int,
                           max_parts: int = MAX_BROADCAST_PARTS,
                           max_bytes: int = MAX_BROADCAST_BYTES) -> bool:
    """Pure decision function (unit-tested): broadcast only when the polygon
    side is small by BOTH row count and total WKB bytes."""
    return n_parts <= max_parts and n_bytes <= max_bytes


def _refine_arrow_parts(
    batches: Iterator["pa.RecordBatch"], carry_lonlat: bool
) -> Iterator["pa.RecordBatch"]:
    """Exact containment refine over (point_id, area_key, part_wkb, lon,
    lat) record batches: dictionary-encode the WKB column (one parse per
    DISTINCT part per batch), then ONE flat vectorized ray cast for the
    whole batch (FlatPolygonIndex — per-part numpy calls were the measured
    scaling bottleneck at local[32], BENCH.md). Arrow-native end to end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for rb in batches:
        if rb.num_rows == 0:
            continue
        lon = rb.column("lon").to_numpy(zero_copy_only=False)
        lat = rb.column("lat").to_numpy(zero_copy_only=False)
        d = pc.dictionary_encode(rb.column("part_wkb"))
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        parts = d.dictionary.to_pylist()
        index = W.FlatPolygonIndex.build(enumerate(parts))
        keep = index.eval(lon, lat, codes)
        cols = ["point_id", "area_key"] + (["lon", "lat"] if carry_lonlat else [])
        yield rb.select(cols).filter(pa.array(keep))


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
    unique_points: bool = False,
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

    ``unique_points``: caller-declared contract that ``point_id`` values are
    unique. In probe mode this makes the join fully shuffle-free (the
    in-batch dedup already guarantees pair uniqueness per input row).

    ``dedup_pairs=False`` disables only the GLOBAL dedup shuffle; the
    per-batch (point, area) dedup inside the refine kernels is
    unconditional, so callers never observe raw per-part/per-cell
    candidate multiplicity either way.
    """
    spark = points.sparkSession
    schema = REFINE_SCHEMA_LONLAT if carry_lonlat else REFINE_SCHEMA

    if broadcast_parts is None:
        stats = polygon_parts.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.length("part_wkb")), F.lit(0)).alias("nbytes"),
        ).collect()[0]
        broadcast_parts = should_broadcast_parts(
            int(stats["n"]), int(stats["nbytes"]),
            MAX_BROADCAST_PARTS, MAX_BROADCAST_BYTES,
        )

    part_rows = None
    if broadcast_parts:
        # ONE collect brings the whole polygon side (bounded by the
        # broadcast decision) to the driver: WKB for the flat index AND the
        # bboxes, from which the adaptive cover is derived in numpy
        # (C.np_cover — exact twin of the JVM expressions). Previously the
        # cover and the resolution discovery were 1-2 MORE Spark jobs over
        # the same polygon side (guide §8: decide with small rows; the
        # polygon side is small by construction here).
        part_rows = polygon_parts.select(
            "area_key", "part_wkb", "minx", "miny", "maxx", "maxy"
        ).collect()
        res_np, cover_cells, cover_owner = C.np_cover(
            [r["minx"] for r in part_rows], [r["miny"] for r in part_rows],
            [r["maxx"] for r in part_rows], [r["maxy"] for r in part_rows],
            res_min, res_max, max_cells,
        ) if part_rows else (np.empty(0, np.int64),) * 3
        if res_list is None:
            res_list = sorted({int(r) for r in res_np})
    elif res_list is None:
        # polygon side too big to collect: discover the resolutions
        # actually present with one tiny aggregate
        res_rows = polygon_parts.select(
            C.adaptive_cover_res(
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
                res_min, res_max, max_cells,
            ).alias("res")
        ).distinct().collect()
        res_list = sorted({r.res for r in res_rows})
    if not res_list:
        return spark.createDataFrame(
            [], REFINE_SCHEMA_LONLAT if carry_lonlat else REFINE_SCHEMA
        )

    if broadcast_parts:
        # The flat index is built ONCE on the driver over every (area_key,
        # part) row — multi-part areas (a multipolygon with several outer
        # rings, areahandler.hpp:48-62) keep each part; eval ORs over a
        # key's parts — then shipped per executor.
        index = W.FlatPolygonIndex.build(
            (r["area_key"], bytes(r["part_wkb"])) for r in part_rows
        )
        # Preferred physical strategy: map-side probe. If the (cell, area)
        # cover table also fits the broadcast, ship it with the index and
        # run the whole join as one narrow mapInArrow over the raw points —
        # no explode, no join, no candidate shuffle. Falls back to the
        # broadcast-WKB equi-join when the cover is too wide.
        key_of_part = np.fromiter(
            (index.key_id[r["area_key"]] for r in part_rows),
            dtype=np.int64, count=len(part_rows),
        )
        keys_by_id = [None] * len(index.key_id)
        for k, i in index.key_id.items():
            keys_by_id[i] = k
        # CellProbeIndex dedups (cell, key) pairs at build time — same set
        # as the old cover.distinct() job, computed from the driver arrays
        probe = CellProbeIndex(
            np.column_stack([cover_cells, key_of_part[cover_owner]])
            if len(cover_cells) else np.empty((0, 2), np.int64),
            index, res_list, keys_by_id,
        )
        if len(probe.cand_key) <= MAX_PROBE_CELLS:
            bcp = spark.sparkContext.broadcast(probe)
            # NOT spread_input-widened (r6 A/B, interleaved): the probe is
            # already cheap per point, so the extra exchange's stage
            # barrier cost more than the 1-2-core serialization it fixed
            # (best 1.69 s no-spread vs 2.08 s spread at sf1.0); at scale
            # the point side arrives wide and shuffle-free is the design.
            refined = points.select("point_id", "lon", "lat").mapInArrow(
                lambda it: _probe_refine(it, bcp.value, carry_lonlat), schema
            )
            # pairs are already unique per input ROW (in-batch dedup across
            # resolutions), so the global dedup only collapses duplicate
            # input point_ids. When the caller declares ids unique
            # (``unique_points``) the result is shuffle-FREE end to end —
            # scan -> mapInArrow -> done.
            return (
                refined.dropDuplicates(["point_id", "area_key"])
                if dedup_pairs and not unique_points else refined
            )

    cover = polygon_parts.withColumn(
        "res",
        C.adaptive_cover_res("minx", "miny", "maxx", "maxy", res_min, res_max, max_cells),
    ).withColumn(
        "cell",
        F.explode(
            C.adaptive_cover_cells("minx", "miny", "maxx", "maxy", res_min, res_max, max_cells)
        ),
    )

    pts = points.select(
        "point_id",
        "lon",
        "lat",
        F.explode(C.cell_of_multi("lon", "lat", res_list)).alias("cell"),
    )

    if salt > 1:
        cover = cover.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        pts = pts.withColumn("salt", F.pmod(F.hash("point_id"), F.lit(salt)))
        keys = ["cell", "salt"]
    else:
        keys = ["cell"]

    # envelope check before the exact refine (cheap column filter, mirrors
    # the STRtree envelope query precisely):
    env = (
        (F.col("lon") >= F.col("minx")) & (F.col("lon") <= F.col("maxx"))
        & (F.col("lat") >= F.col("miny")) & (F.col("lat") <= F.col("maxy"))
    )
    if broadcast_parts:
        bc = spark.sparkContext.broadcast(index)
        cand = pts.join(
            cover.select(*keys, "area_key", "minx", "miny", "maxx", "maxy"), keys, "inner"
        ).filter(env)

        def refine_bc(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
            import pyarrow as pa
            import pyarrow.compute as pc

            idx = bc.value
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                ids = rb.column("point_id").to_numpy(zero_copy_only=False)
                lon = rb.column("lon").to_numpy(zero_copy_only=False)
                lat = rb.column("lat").to_numpy(zero_copy_only=False)
                d = pc.dictionary_encode(rb.column("area_key"))
                codes = d.indices.to_numpy(zero_copy_only=False)
                uniques = d.dictionary.to_pylist()
                remap = np.array(
                    [idx.key_id.get(k, -1) for k in uniques], dtype=np.int64
                )
                # lexsort gives grouping AND intra-batch (point, area) dedup
                # in one pass (a key's parts can cover the same cell, so the
                # same pair may arrive on several candidate rows)
                order = np.lexsort((ids, codes))
                sc, si = codes[order], ids[order]
                uniq = np.ones(order.size, dtype=bool)
                uniq[1:] = (sc[1:] != sc[:-1]) | (si[1:] != si[:-1])
                sel = order[uniq]
                keep = idx.eval(lon[sel], lat[sel], remap[codes[sel]])
                outsel = sel[keep]
                arrays = [
                    pa.array(ids[outsel], type=pa.int64()),
                    pc.take(rb.column("area_key"), pa.array(outsel)),
                ]
                names = ["point_id", "area_key"]
                if carry_lonlat:
                    arrays += [pa.array(lon[outsel]), pa.array(lat[outsel])]
                    names += ["lon", "lat"]
                yield pa.RecordBatch.from_arrays(arrays, names)

        refined = cand.select("point_id", "area_key", "lon", "lat").mapInArrow(
            refine_bc, schema
        )
    else:
        cand = pts.join(
            cover.select(*keys, "area_key", "part_wkb", "minx", "miny", "maxx", "maxy"),
            keys, "inner",
        ).filter(env)
        refined = cand.select("point_id", "area_key", "part_wkb", "lon", "lat").mapInArrow(
            lambda it: _refine_arrow_parts(it, carry_lonlat), schema
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
