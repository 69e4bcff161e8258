"""Grid-cell spatial index + slippy (z/x/y) raster tile math, all as native
Spark column expressions (JVM-side, codegen-friendly — no UDFs).

This is the engine's replacement for the reference's GEOS ``STRtree``
envelope index (/root/reference/src/areahandler.hpp:57-59,
/root/reference/src/falsepositives.hpp:130): polygons are covered by the
grid cells of their bounding box, points map to one cell per resolution,
and the spatial join becomes a plain equi-join on cell id — the same plan
shape an H3/S2 polyfill would give (neither library is available in this
environment; the grid keeps identical semantics: cell-join = envelope
pre-filter, exact refine = prepared-polygon contains).

Cell id packing (64-bit long):  (res << 58) | (iy << 29) | ix
with a 2^res x 2^res grid over lon [-180,180] x lat [-90,90].
Resolution <= 20 (cell ~34 m at the equator), ix/iy < 2^29.

Raster tiles use the standard web-mercator z/x/y scheme; ids share the same
packing. ``cell_to_tile`` / ``tile_to_cells`` give the raster<->vector
assignment demanded by the graft (BASELINE.json:6).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

RES_BITS_SHIFT = 58
IY_SHIFT = 29
DEFAULT_RES = 7  # ~312 km cells; fixtures are small worlds
MAX_COVER_CELLS = 64


def _clamp(c: Column, lo: Column, hi: Column) -> Column:
    return F.greatest(lo, F.least(hi, c))


def _encode(res: Column, ix: Column, iy: Column) -> Column:
    return (
        F.shiftleft(res.cast("long"), RES_BITS_SHIFT)
        + F.shiftleft(iy.cast("long"), IY_SHIFT)
        + ix.cast("long")
    )


def cell_res(cell: Column) -> Column:
    return F.shiftright(cell, RES_BITS_SHIFT).cast("int")


def cell_ix(cell: Column) -> Column:
    return (cell % (1 << IY_SHIFT)).cast("long")


def cell_iy(cell: Column) -> Column:
    return (F.shiftright(cell, IY_SHIFT) % (1 << IY_SHIFT)).cast("long")


# ---- SQL-text twins ----
#
# Each deeply nested Column builder below costs dozens-to-hundreds of py4j
# round-trips PER CALL at DAG-construction time (~0.3 ms each; profiling
# showed ~2.7 s of the pipeline's per-run wall was pure driver-side py4j
# chatter while 32 cores idle — guide §7.3's "planning time is real time").
# When the caller can name its inputs (plain column references), we build
# the IDENTICAL expression as one SQL string and parse it with a single
# F.expr round-trip. Literal forms are chosen so the parsed tree matches
# the Column tree exactly: `180.0D` (double, NOT the default decimal),
# `0L` for long literals, same operator order. Parity is pinned by
# tests/test_wkb_cells.py::test_sql_text_twins_match_column_builders.


def _ix_sql(lon: str, res: int) -> str:
    n = repr(float(1 << res))
    return (f"greatest(0L, least({(1 << res) - 1}L, "
            f"floor(({lon} + 180.0D) / 360.0D * {n}D)))")


def _iy_sql(lat: str, res: int) -> str:
    n = repr(float(1 << res))
    return (f"greatest(0L, least({(1 << res) - 1}L, "
            f"floor(({lat} + 90.0D) / 180.0D * {n}D)))")


def _encode_sql(res: str, ix: str, iy: str) -> str:
    return (f"(shiftleft(cast({res} as long), {RES_BITS_SHIFT}) + "
            f"shiftleft(cast({iy} as long), {IY_SHIFT}) + cast({ix} as long))")


def _cell_of_sql(lon: str, lat: str, res: int) -> str:
    return _encode_sql(str(res), _ix_sql(lon, res), _iy_sql(lat, res))


def _ix_of(lon: Column, res: int) -> Column:
    n = F.lit(float(1 << res))
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n)
    return _clamp(raw, F.lit(0), F.lit((1 << res) - 1))


def _iy_of(lat: Column, res: int) -> Column:
    n = F.lit(float(1 << res))
    raw = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * n)
    return _clamp(raw, F.lit(0), F.lit((1 << res) - 1))


def cell_of(lon: Column | str, lat: Column | str, res: int = DEFAULT_RES) -> Column:
    """Point -> grid cell id at a fixed resolution. String args take the
    one-round-trip SQL-text path (see the SQL-text twins note)."""
    if isinstance(lon, str) and isinstance(lat, str):
        return F.expr(_cell_of_sql(lon, lat, res))
    return _encode(F.lit(res), _ix_of(lon, res), _iy_of(lat, res))


def cell_of_multi(lon: Column | str, lat: Column | str, resolutions: list[int]) -> Column:
    """Point -> array of cell ids, one per resolution (for joining against a
    multi-resolution polygon cover — bounded fan-out: len(resolutions) rows)."""
    if isinstance(lon, str) and isinstance(lat, str):
        return F.expr(
            "array(" + ", ".join(_cell_of_sql(lon, lat, r) for r in resolutions) + ")"
        )
    return F.array(*[cell_of(lon, lat, r) for r in resolutions])


def _bbox_cover_cells_sql(minx: str, miny: str, maxx: str, maxy: str, res: int) -> str:
    ix0, ix1 = _ix_sql(minx, res), _ix_sql(maxx, res)
    iy0, iy1 = _iy_sql(miny, res), _iy_sql(maxy, res)
    enc = _encode_sql(str(res), "ix", "iy")
    return (f"flatten(transform(sequence({iy0}, {iy1}), "
            f"iy -> transform(sequence({ix0}, {ix1}), ix -> {enc})))")


def bbox_cover_cells(
    minx: Column | str, miny: Column | str, maxx: Column | str, maxy: Column | str, res: int
) -> Column:
    """All cells at ``res`` intersecting the bbox (envelope cover).

    Built from sequence+transform+flatten so it stays inside codegen.
    String args take the one-round-trip SQL-text path.
    """
    if all(isinstance(c, str) for c in (minx, miny, maxx, maxy)):
        return F.expr(_bbox_cover_cells_sql(minx, miny, maxx, maxy, res))
    ix0, ix1 = _ix_of(minx, res), _ix_of(maxx, res)
    iy0, iy1 = _iy_of(miny, res), _iy_of(maxy, res)
    res_l = F.lit(res)
    return F.flatten(
        F.transform(
            F.sequence(iy0, iy1),
            lambda iy: F.transform(F.sequence(ix0, ix1), lambda ix: _encode(res_l, ix, iy)),
        )
    )


def bbox_cover_count(minx: Column, miny: Column, maxx: Column, maxy: Column, res: int) -> Column:
    ix0, ix1 = _ix_of(minx, res), _ix_of(maxx, res)
    iy0, iy1 = _iy_of(miny, res), _iy_of(maxy, res)
    return (ix1 - ix0 + 1) * (iy1 - iy0 + 1)


def _bbox_cover_count_sql(minx: str, miny: str, maxx: str, maxy: str, res: int) -> str:
    return (f"(({_ix_sql(maxx, res)} - {_ix_sql(minx, res)} + 1L) * "
            f"({_iy_sql(maxy, res)} - {_iy_sql(miny, res)} + 1L))")


def _adaptive_cover_res_sql(minx: str, miny: str, maxx: str, maxy: str,
                            res_min: int, res_max: int, max_cells: int) -> str:
    # mirror of adaptive_cover_res: CASE chain finest-first would invert
    # the when-nesting; replicate the exact otherwise-nesting instead
    expr = str(res_min)
    for r in range(res_min + 1, res_max + 1):
        expr = (f"(CASE WHEN {_bbox_cover_count_sql(minx, miny, maxx, maxy, r)}"
                f" <= {max_cells}L THEN {r} ELSE {expr} END)")
    return expr


def _adaptive_cover_cells_sql(minx: str, miny: str, maxx: str, maxy: str,
                              res_min: int, res_max: int, max_cells: int) -> str:
    res = _adaptive_cover_res_sql(minx, miny, maxx, maxy, res_min, res_max, max_cells)
    out = _bbox_cover_cells_sql(minx, miny, maxx, maxy, res_min)
    for r in range(res_min + 1, res_max + 1):
        out = (f"(CASE WHEN {res} = {r} THEN "
               f"{_bbox_cover_cells_sql(minx, miny, maxx, maxy, r)} ELSE {out} END)")
    return out


def adaptive_cover_res(
    minx: Column,
    miny: Column,
    maxx: Column,
    maxy: Column,
    res_min: int = 3,
    res_max: int = DEFAULT_RES,
    max_cells: int = MAX_COVER_CELLS,
) -> Column:
    """Finest resolution in [res_min, res_max] whose bbox cover stays within
    ``max_cells`` — bounds the explode fan-out per polygon regardless of
    polygon size (big lakes coarsen instead of exploding). String args take
    the one-round-trip SQL-text path."""
    if all(isinstance(c, str) for c in (minx, miny, maxx, maxy)):
        return F.expr(
            _adaptive_cover_res_sql(minx, miny, maxx, maxy, res_min, res_max, max_cells)
        )
    expr = F.lit(res_min)
    for r in range(res_min + 1, res_max + 1):
        expr = F.when(bbox_cover_count(minx, miny, maxx, maxy, r) <= max_cells, F.lit(r)).otherwise(
            expr
        )
    return expr


def adaptive_cover_cells(
    minx: Column,
    miny: Column,
    maxx: Column,
    maxy: Column,
    res_min: int = 3,
    res_max: int = DEFAULT_RES,
    max_cells: int = MAX_COVER_CELLS,
) -> Column:
    """Bbox cover at the adaptive resolution (array<long>). String args take
    the one-round-trip SQL-text path."""
    if all(isinstance(c, str) for c in (minx, miny, maxx, maxy)):
        return F.expr(
            _adaptive_cover_cells_sql(minx, miny, maxx, maxy, res_min, res_max, max_cells)
        )
    res = adaptive_cover_res(minx, miny, maxx, maxy, res_min, res_max, max_cells)
    out = bbox_cover_cells(minx, miny, maxx, maxy, res_min)
    for r in range(res_min + 1, res_max + 1):
        out = F.when(res == r, bbox_cover_cells(minx, miny, maxx, maxy, r)).otherwise(out)
    return out


def np_cell_of(lon, lat, res: int):
    """Numpy twin of :func:`cell_of` — identical IEEE op order
    ((lon+180.0)/360.0*n, floor, clamp) so a point gets the SAME cell id
    whether computed JVM-side or inside an Arrow batch (the map-side PIP
    probe relies on exact parity with the Spark-computed polygon cover)."""
    import numpy as np

    n = float(1 << res)
    hi = (1 << res) - 1
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, hi).astype(np.int64)
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, hi).astype(np.int64)
    return (np.int64(res) << RES_BITS_SHIFT) + (iy << IY_SHIFT) + ix


def np_cover(minx, miny, maxx, maxy, res_min: int = 3, res_max: int = DEFAULT_RES,
             max_cells: int = MAX_COVER_CELLS):
    """Numpy twin of adaptive_cover_res + adaptive_cover_cells over ARRAYS
    of bboxes: returns (res_per_box int64, flat cell ids int64, owner box
    index int64). Identical IEEE op order to the JVM expressions
    ((x+180.0)/360.0*n, floor, clamp; finest res in [res_min, res_max]
    whose cover count stays <= max_cells, else res_min) and identical cell
    order (iy outer, ix inner) so a driver-side cover is byte-equal to the
    Spark-computed one. Used by the probe-mode PIP join to derive the
    whole cover from the ALREADY-COLLECTED parts instead of running a
    second Spark job over the polygon side (guide §8: decide with small
    rows)."""
    import numpy as np

    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)

    def _ix(x, r):
        n = float(1 << r)
        return np.clip(np.floor((x + 180.0) / 360.0 * n), 0, (1 << r) - 1).astype(np.int64)

    def _iy(y, r):
        n = float(1 << r)
        return np.clip(np.floor((y + 90.0) / 180.0 * n), 0, (1 << r) - 1).astype(np.int64)

    res = np.full(minx.shape, res_min, dtype=np.int64)
    for r in range(res_min + 1, res_max + 1):
        cnt = (_ix(maxx, r) - _ix(minx, r) + 1) * (_iy(maxy, r) - _iy(miny, r) + 1)
        res = np.where(cnt <= max_cells, r, res)

    ix0 = np.empty_like(res)
    ix1 = np.empty_like(res)
    iy0 = np.empty_like(res)
    iy1 = np.empty_like(res)
    for r in np.unique(res):
        m = res == r
        ix0[m], ix1[m] = _ix(minx[m], int(r)), _ix(maxx[m], int(r))
        iy0[m], iy1[m] = _iy(miny[m], int(r)), _iy(maxy[m], int(r))
    w = ix1 - ix0 + 1
    counts = w * (iy1 - iy0 + 1)
    offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    total = int(offs[-1])
    owner = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    t = np.arange(total, dtype=np.int64) - offs[owner]
    iy = iy0[owner] + t // w[owner]
    ix = ix0[owner] + t % w[owner]
    cells = (res[owner] << RES_BITS_SHIFT) + (iy << IY_SHIFT) + ix
    return res, cells, owner


def k_ring(cell: Column, k: int = 1) -> Column:
    """Cells within Chebyshev distance k of ``cell`` at the same resolution
    (the kNN candidate ring, J6). No antimeridian wrap (documented limit)."""
    res, ix, iy = cell_res(cell), cell_ix(cell), cell_iy(cell)
    # shiftleft needs a literal bit count; 2^res via pow (exact for res<=20)
    hi = F.pow(F.lit(2.0), res.cast("double")).cast("long") - 1
    return F.flatten(
        F.transform(
            F.sequence(_clamp(iy - k, F.lit(0), hi), _clamp(iy + k, F.lit(0), hi)),
            lambda y: F.transform(
                F.sequence(_clamp(ix - k, F.lit(0), hi), _clamp(ix + k, F.lit(0), hi)),
                lambda x: _encode(res, x, y),
            ),
        )
    )


# ---------------- raster (slippy z/x/y) tiles ----------------


def tile_xy(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    """Web-mercator tile coordinates. Formula written identically to the
    DuckDB oracle (ln(tan + 1/cos)) so both engines run the same IEEE ops."""
    n = F.lit(float(1 << z))
    tx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n)
    lat_rad = lat * F.lit(math.pi) / F.lit(180.0)
    ty = F.floor(
        (F.lit(1.0) - F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad)) / F.lit(math.pi))
        / F.lit(2.0)
        * n
    )
    lim = F.lit((1 << z) - 1)
    return _clamp(tx, F.lit(0), lim), _clamp(ty, F.lit(0), lim)


def _tile_xy_sql(lon: str, lat: str, z: int) -> tuple[str, str]:
    n = repr(float(1 << z))
    pi = repr(math.pi)
    lim = (1 << z) - 1
    tx = f"floor(({lon} + 180.0D) / 360.0D * {n}D)"
    lat_rad = f"({lat} * {pi}D / 180.0D)"
    ty = (f"floor((1.0D - ln(tan({lat_rad}) + 1.0D / cos({lat_rad})) / {pi}D)"
          f" / 2.0D * {n}D)")
    return (f"greatest(0L, least({lim}L, {tx}))",
            f"greatest(0L, least({lim}L, {ty}))")


def _tile_id_sql(lon: str, lat: str, z: int) -> str:
    tx, ty = _tile_xy_sql(lon, lat, z)
    return _encode_sql(str(z), tx, ty)


def tile_id(lon: Column | str, lat: Column | str, z: int) -> Column:
    if isinstance(lon, str) and isinstance(lat, str):
        return F.expr(_tile_id_sql(lon, lat, z))
    tx, ty = tile_xy(lon, lat, z)
    return _encode(F.lit(z), tx, ty.cast("long"))


def tile_bounds(z: int, tx: Column, ty: Column) -> tuple[Column, Column, Column, Column]:
    """Tile -> lon/lat bbox (inverse mercator), for raster->vector assignment."""
    n = F.lit(float(1 << z))
    minx = tx / n * F.lit(360.0) - F.lit(180.0)
    maxx = (tx + 1) / n * F.lit(360.0) - F.lit(180.0)

    def lat_of(yy: Column) -> Column:
        t = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * yy / n)
        return F.degrees(F.atan(F.sinh(t)))

    maxy = lat_of(ty.cast("double"))
    miny = lat_of((ty + 1).cast("double"))
    return minx, miny, maxx, maxy


def tile_to_cells(z: int, tx: Column, ty: Column, res: int) -> Column:
    """Raster->vector: grid cells covering a z/x/y raster tile's bbox."""
    minx, miny, maxx, maxy = tile_bounds(z, tx, ty)
    # shrink by epsilon so a tile edge exactly on a cell boundary doesn't
    # pull in the neighbouring cell row/column
    eps = F.lit(1e-9)
    return bbox_cover_cells(minx + eps, miny + eps, maxx - eps, maxy - eps, res)


def tile_quadkey(tile: Column) -> Column:
    """Human-readable z/x/y string for a packed tile id."""
    return F.concat_ws(
        "/", cell_res(tile).cast("string"), cell_ix(tile).cast("string"), cell_iy(tile).cast("string")
    )
