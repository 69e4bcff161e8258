"""Vectorized flat-buffer WKB builders for the Arrow-native geometry UDFs.

guide §4.2: an Arrow ``binary`` column is ONE contiguous data buffer plus
an offsets array, so per-feature WKB can be assembled with numpy scatter
writes into a single buffer instead of a per-row Python loop of
``struct.pack`` + ``bytes`` concatenation (the shape the round-2..5
``make_linestring``/``_closed_way_polygon``/``_point_wkb`` pandas UDFs
had). Byte-identical to the scalar ``wkb.py`` builders and the previous
pandas UDF semantics — pinned by tests/test_wkb_cells.py parity tests.

All scatters are chunked (<= ``_CHUNK`` points per fancy-index write) so
intermediates stay cache-resident (see the dedup.py ``_PERM_CHUNK`` note
on this sandbox's first-touch page-fault cost).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CHUNK = 65_536


def _list_flat(arr: "pa.Array"):
    """ListArray<struct<lon,lat>> -> (n, valid, lens, flat lon, flat lat).
    ``flatten()`` concatenates the values of each non-null row, so
    ``np.repeat(arange(n), lens)`` maps flat elements to rows regardless
    of slicing/null layout."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    valid = np.asarray(arr.is_valid())
    lens = arr.value_lengths().to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens, nan=0).astype(np.int64)
    flat = arr.flatten()
    lon = flat.field("lon").to_numpy(zero_copy_only=False)
    lat = flat.field("lat").to_numpy(zero_copy_only=False)
    return n, valid, lens, lon, lat


def _consecutive_dedup(n, valid, lens, lon, lat):
    """use_nodes::unique — drop elements equal to their predecessor WITHIN
    a row (NaN != NaN keeps both, matching the scalar ``!=`` compare).
    Elements of invalid rows are dropped entirely."""
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = np.ones(lon.size, dtype=bool)
    if lon.size:
        keep[1:] = (lon[1:] != lon[:-1]) | (lat[1:] != lat[:-1])
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        keep[starts[:-1][lens > 0]] = True  # row starts never compare across rows
        keep &= valid[row_of]
    return row_of, keep


def _scatter_coords(data, dest_start, lon, lat):
    """Write each point's 16 little-endian bytes at its destination."""
    for lo in range(0, lon.size, _CHUNK):
        hi = min(lo + _CHUNK, lon.size)
        coords = np.empty((hi - lo, 2), dtype="<f8")
        coords[:, 0] = lon[lo:hi]
        coords[:, 1] = lat[lo:hi]
        dest = dest_start[lo:hi, None] + np.arange(16, dtype=np.int64)
        data[dest.ravel()] = coords.view(np.uint8).ravel()


def _u32_scatter(data, pos, vals):
    """Write little-endian uint32 values at byte positions ``pos``."""
    b = vals.astype("<u4").view(np.uint8).reshape(-1, 4)
    data[pos[:, None] + np.arange(4, dtype=np.int64)] = b


def _binary_array(n, ok, out_off, data):
    """(validity, offsets, flat data) -> Arrow binary array (null where ~ok)."""
    validity = pa.py_buffer(np.packbits(ok, bitorder="little").tobytes())
    offsets = pa.py_buffer(out_off.astype(np.int32).tobytes())
    return pa.Array.from_buffers(
        pa.binary(), n, [validity, offsets, pa.py_buffer(data.tobytes())]
    )


def _bbox_arrays(n, ok, krow, klon, klat, kcum):
    """Per-ok-row min/max over the kept flat coords."""
    minx = np.full(n, np.nan)
    miny = np.full(n, np.nan)
    maxx = np.full(n, np.nan)
    maxy = np.full(n, np.nan)
    ok_idx = np.flatnonzero(ok)
    if ok_idx.size:
        starts = kcum[ok_idx]
        minx[ok_idx] = np.minimum.reduceat(klon, starts)
        maxx[ok_idx] = np.maximum.reduceat(klon, starts)
        miny[ok_idx] = np.minimum.reduceat(klat, starts)
        maxy[ok_idx] = np.maximum.reduceat(klat, starts)
    mask = ~ok
    return [pa.array(v, type=pa.float64(), mask=mask) for v in (minx, miny, maxx, maxy)]


def _kept(n, row_of, keep, lon, lat):
    krow = row_of[keep]
    m = np.bincount(krow, minlength=n).astype(np.int64)
    kcum = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(m[:-1], out=kcum[1:])
    return lon[keep], lat[keep], krow, m, kcum


def linestring_struct(arr: "pa.Array") -> "pa.StructArray":
    """G2 (make_linestring): coords -> struct(wkb, ok, minx..maxy).
    WKB layout per ok row: 01 | u32(2) | u32(m) | m x (f8 lon, f8 lat)."""
    n, valid, lens, lon, lat = _list_flat(arr)
    row_of, keep = _consecutive_dedup(n, valid, lens, lon, lat)
    klon, klat, krow, m, kcum = _kept(n, row_of, keep, lon, lat)
    ok = valid & (m >= 2)
    # drop kept points of not-ok rows from the scatter
    sel = ok[krow]
    klon, klat, krow = klon[sel], klat[sel], krow[sel]
    m_ok = np.where(ok, m, 0)
    kcum_ok = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(m_ok[:-1], out=kcum_ok[1:])
    sizes = np.where(ok, 9 + 16 * m_ok, 0)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=out_off[1:])
    data = np.zeros(int(out_off[-1]), dtype=np.uint8)
    ok_idx = np.flatnonzero(ok)
    if ok_idx.size:
        ho = out_off[ok_idx]
        data[ho] = 1
        data[ho + 1] = 2  # LINESTRING, little-endian low byte
        _u32_scatter(data, ho + 5, m_ok[ok_idx])
        rank = np.arange(klon.size, dtype=np.int64) - kcum_ok[krow]
        _scatter_coords(data, out_off[krow] + 9 + 16 * rank, klon, klat)
    wkb = _binary_array(n, ok, out_off, data)
    bbox = _bbox_arrays(n, ok, krow, klon, klat, kcum_ok)
    fields = [
        pa.field("wkb", pa.binary()),
        pa.field("ok", pa.bool_(), nullable=False),  # matches _LS_SCHEMA
        pa.field("minx", pa.float64()), pa.field("miny", pa.float64()),
        pa.field("maxx", pa.float64()), pa.field("maxy", pa.float64()),
    ]
    return pa.StructArray.from_arrays([wkb, pa.array(ok)] + bbox, fields=fields)


def closed_way_polygon_struct(arr: "pa.Array") -> "pa.StructArray":
    """G4 closed-way areas (_closed_way_polygon): coords -> struct(wkb,
    minx..maxy); null where the ring is degenerate. WKB layout per ok row:
    01 | u32(6) | u32(1) | 01 | u32(3) | u32(1) | u32(m) | coords."""
    n, valid, lens, lon, lat = _list_flat(arr)
    valid = valid & (lens >= 4)  # raw-length gate BEFORE dedup (scalar spec)
    row_of, keep = _consecutive_dedup(n, valid, lens, lon, lat)
    klon, klat, krow, m, kcum = _kept(n, row_of, keep, lon, lat)
    ok = valid & (m >= 4)
    # closed-ring gate: first deduped point == last deduped point
    ok_idx0 = np.flatnonzero(ok)
    if ok_idx0.size:
        first = kcum[ok_idx0]
        last = first + m[ok_idx0] - 1
        closed = (klon[first] == klon[last]) & (klat[first] == klat[last])
        ok[ok_idx0] = closed
    sel = ok[krow]
    klon, klat, krow = klon[sel], klat[sel], krow[sel]
    m_ok = np.where(ok, m, 0)
    kcum_ok = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(m_ok[:-1], out=kcum_ok[1:])
    sizes = np.where(ok, 22 + 16 * m_ok, 0)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=out_off[1:])
    data = np.zeros(int(out_off[-1]), dtype=np.uint8)
    ok_idx = np.flatnonzero(ok)
    if ok_idx.size:
        ho = out_off[ok_idx]
        data[ho] = 1
        data[ho + 1] = 6  # MULTIPOLYGON
        data[ho + 5] = 1  # n_polys = 1
        data[ho + 9] = 1
        data[ho + 10] = 3  # POLYGON
        data[ho + 14] = 1  # n_rings = 1
        _u32_scatter(data, ho + 18, m_ok[ok_idx])
        rank = np.arange(klon.size, dtype=np.int64) - kcum_ok[krow]
        _scatter_coords(data, out_off[krow] + 22 + 16 * rank, klon, klat)
    wkb = _binary_array(n, ok, out_off, data)
    bbox = _bbox_arrays(n, ok, krow, klon, klat, kcum_ok)
    return pa.StructArray.from_arrays(
        [wkb] + bbox, names=["wkb", "minx", "miny", "maxx", "maxy"]
    )


def point_wkb_array(lon: "pa.Array", lat: "pa.Array") -> "pa.Array":
    """P12/G1 (_point_wkb): 21-byte point WKB per row; null iff lon is
    null/NaN (the scalar spec checked only x)."""
    if isinstance(lon, pa.ChunkedArray):
        lon = lon.combine_chunks()
    if isinstance(lat, pa.ChunkedArray):
        lat = lat.combine_chunks()
    x = lon.to_numpy(zero_copy_only=False)
    y = lat.to_numpy(zero_copy_only=False)
    n = len(x)
    ok = ~np.isnan(x)
    sizes = np.where(ok, 21, 0)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=out_off[1:])
    data = np.zeros(int(out_off[-1]), dtype=np.uint8)
    ok_idx = np.flatnonzero(ok)
    if ok_idx.size:
        ho = out_off[ok_idx]
        data[ho] = 1
        data[ho + 1] = 1  # POINT
        for lo in range(0, ok_idx.size, _CHUNK):
            hi = min(lo + _CHUNK, ok_idx.size)
            sl = ok_idx[lo:hi]
            xb = x[sl].astype("<f8").view(np.uint8).reshape(-1, 8)
            yb = y[sl].astype("<f8").view(np.uint8).reshape(-1, 8)
            data[ho[lo:hi, None] + 5 + np.arange(8, dtype=np.int64)] = xb
            data[ho[lo:hi, None] + 13 + np.arange(8, dtype=np.int64)] = yb
    return _binary_array(n, ok, out_off, data)
