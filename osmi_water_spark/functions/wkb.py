"""WKB geometry encoders/decoders + vectorized point-in-polygon, pure numpy.

The reference round-trips GEOS -> WKB -> OGR (/root/reference/src/
waterway.hpp:50-66); we store WKB ``binary`` directly (little-endian ISO
WKB, EPSG:4326 lon/lat). No GEOS/shapely dependency exists in this
environment, so containment is an even-odd ray cast vectorized over numpy
point batches — semantics match GEOS ``PreparedPolygon::contains``
(/root/reference/src/falsepositives.hpp:133-135) for non-boundary points;
boundary points are explicitly excluded (GEOS contains is interior-only).

These run inside Arrow-batched pandas UDFs: per *feature* Python, per
*coordinate* numpy — the contract's "no per-row Python" applies to the hot
per-point path, which is fully vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")

POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 1, 2, 3, 4, 5, 6


def wkb_point(x: float, y: float) -> bytes:
    return _HDR.pack(1, POINT) + struct.pack("<dd", x, y)


def _coords_bytes(coords: np.ndarray) -> bytes:
    a = np.ascontiguousarray(coords, dtype="<f8")
    return _U32.pack(a.shape[0]) + a.tobytes()


def wkb_linestring(coords: np.ndarray) -> bytes:
    return _HDR.pack(1, LINESTRING) + _coords_bytes(np.asarray(coords))


def wkb_multilinestring(lines: list[np.ndarray]) -> bytes:
    out = [_HDR.pack(1, MULTILINESTRING), _U32.pack(len(lines))]
    out += [wkb_linestring(c) for c in lines]
    return b"".join(out)


def wkb_polygon(rings: list[np.ndarray]) -> bytes:
    out = [_HDR.pack(1, POLYGON), _U32.pack(len(rings))]
    out += [_coords_bytes(np.asarray(r)) for r in rings]
    return b"".join(out)


def wkb_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [_HDR.pack(1, MULTIPOLYGON), _U32.pack(len(polys))]
    out += [wkb_polygon(rings) for rings in polys]
    return b"".join(out)


# ---------------- decoding (tests / refine stage) ----------------


def _read_coords(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    (n,) = _U32.unpack_from(buf, off)
    off += 4
    a = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return a, off + 16 * n


def parse_wkb(buf: bytes):
    """Decode WKB -> (geom_type, payload). Payload shapes:
    point -> (x, y); linestring -> ndarray[n,2]; polygon -> [rings];
    multilinestring -> [ndarray]; multipolygon -> [[rings]]."""
    mv = memoryview(buf)
    geom, payload, _ = _parse_one(mv, 0)
    return geom, payload


def _parse_one(mv: memoryview, off: int):
    endian, gtype = _HDR.unpack_from(mv, off)
    assert endian == 1, "big-endian WKB unsupported"
    off += 5
    if gtype == POINT:
        x, y = struct.unpack_from("<dd", mv, off)
        return POINT, (x, y), off + 16
    if gtype == LINESTRING:
        a, off = _read_coords(mv, off)
        return LINESTRING, a, off
    if gtype == POLYGON:
        (nr,) = _U32.unpack_from(mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            r, off = _read_coords(mv, off)
            rings.append(r)
        return POLYGON, rings, off
    if gtype in (MULTILINESTRING, MULTIPOLYGON, MULTIPOINT):
        (n,) = _U32.unpack_from(mv, off)
        off += 4
        parts = []
        for _ in range(n):
            _, payload, off = _parse_one(mv, off)
            parts.append(payload)
        return gtype, parts, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


# ---------------- point-in-polygon (vectorized over points) ----------------


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd ray cast of N points against one polygon (outer + holes).

    Vectorized over the point batch; boundary points return False (GEOS
    ``contains`` tests the interior only). O(N x total_vertices).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape[0], dtype=bool)
    boundary = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        # edges as (E,) arrays; broadcast against (N,1) points
        pxc, pyc = px[:, None], py[:, None]
        # boundary test: collinear and within segment bbox
        cross = (x2 - x1) * (pyc - y1) - (y2 - y1) * (pxc - x1)
        on_seg = (
            (np.abs(cross) < 1e-12)
            & (pxc >= np.minimum(x1, x2) - 1e-12)
            & (pxc <= np.maximum(x1, x2) + 1e-12)
            & (pyc >= np.minimum(y1, y2) - 1e-12)
            & (pyc <= np.maximum(y1, y2) + 1e-12)
        )
        boundary |= on_seg.any(axis=1)
        # even-odd crossing test (half-open rule avoids double-count at vertices)
        cond = (y1 <= pyc) != (y2 <= pyc)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (pyc - y1) * (x2 - x1) / (y2 - y1)
        crossings = cond & (pxc < xint)
        inside ^= (crossings.sum(axis=1) % 2).astype(bool)
    return inside & ~boundary


def points_in_wkb_polygon(px: np.ndarray, py: np.ndarray, wkb: bytes) -> np.ndarray:
    """PIP against a WKB polygon or multipolygon (the reference queries each
    polygon of a multipolygon separately, areahandler.hpp:48-62; OR-ing over
    parts reproduces its first-containing-polygon break)."""
    gtype, payload = parse_wkb(wkb)
    if gtype == POLYGON:
        return points_in_rings(px, py, payload)
    if gtype == MULTIPOLYGON:
        out = np.zeros(len(px), dtype=bool)
        for rings in payload:
            out |= points_in_rings(px, py, rings)
        return out
    raise ValueError(f"not a polygon WKB: type={gtype}")


def wkb_bbox(buf: bytes) -> tuple[float, float, float, float]:
    """Envelope of any supported WKB geometry."""
    gtype, payload = parse_wkb(buf)
    if gtype == POINT:
        x, y = payload
        return x, y, x, y
    arrs: list[np.ndarray] = []

    def collect(p):
        if isinstance(p, np.ndarray):
            arrs.append(p)
        else:
            for q in p:
                collect(q)

    collect(payload)
    allc = np.vstack(arrs)
    return (
        float(allc[:, 0].min()),
        float(allc[:, 1].min()),
        float(allc[:, 0].max()),
        float(allc[:, 1].max()),
    )
