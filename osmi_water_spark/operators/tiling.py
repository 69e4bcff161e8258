"""Stage F decorations — raster<->vector tile assignment + per-tile
validation rollups (the graft's replacement for the reference's sqlite
sink consumers: the 26 map/water.map layer filters become per-tile
validation dimensions, SURVEY.md §2.9/§7.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmi_water_spark.functions import cells as C

NODE_ERROR_CLASSES = [
    "direction_error", "name_error", "type_error", "spring_error", "end_error", "way_error",
]


def tile_cover(minx: Column, miny: Column, maxx: Column, maxy: Column, z: int) -> Column:
    """All z/x/y tiles intersecting a lon/lat bbox (array of packed ids).
    Mercator y grows downward: maxy -> ty0, miny -> ty1."""
    tx0, ty0 = C.tile_xy(minx, maxy, z)
    tx1, ty1 = C.tile_xy(maxx, miny, z)
    zl = F.lit(z)
    return F.flatten(
        F.transform(
            F.sequence(ty0.cast("long"), ty1.cast("long")),
            lambda ty: F.transform(
                F.sequence(tx0.cast("long"), tx1.cast("long")),
                lambda tx: (
                    F.shiftleft(zl.cast("long"), C.RES_BITS_SHIFT)
                    + F.shiftleft(ty, C.IY_SHIFT)
                    + tx
                ),
            ),
        )
    )


def assign_node_tiles(nodes_out: DataFrame, z: int) -> DataFrame:
    """nodes output -> + tile_id column (vector->raster assignment)."""
    return nodes_out.withColumn("tile_id", C.tile_id("lon", "lat", z))


def tile_validation(nodes_out: DataFrame, z: int) -> DataFrame:
    """Per-tile x error-class counts (the validation tables replacing the
    sqlite sink, BASELINE.json:6). Classes: the six error flags, the two
    specifics, and 'normal'."""
    n = assign_node_tiles(nodes_out, z)
    # one SQL-text expression (identical tree to the previous nested
    # Column build — see cells.py "SQL-text twins")
    whens = ", ".join(
        f"CASE WHEN {c} = 'true' THEN '{c.removesuffix('_error')}' END"
        for c in NODE_ERROR_CLASSES
    )
    classes = (f"array_compact(array({whens}, "
               f"CASE WHEN specific != '' THEN specific END))")
    exploded = n.select(
        "tile_id",
        F.expr(
            f"explode(CASE WHEN size({classes}) > 0 THEN {classes} "
            f"ELSE array('normal') END)"
        ).alias("error_class"),
    )
    return (
        exploded.groupBy("tile_id", "error_class")
        .agg(F.count("*").alias("n"))
        .select("tile_id", F.lit("nodes").alias("table"), "error_class", "n")
    )


def feature_tile_assignment(df: DataFrame, kind: str, id_col: str, z: int, cell_res: int) -> DataFrame:
    """Geometry tables -> (kind, feature_id, tile_id) via the h3_cells
    decoration: raster<->vector mapping is cell-bbox -> tile cover.

    The cell-centre -> tile chain is one SQL-text expression (single
    F.expr parse) instead of ~200 py4j round-trips of nested Column
    building — identical tree, see cells.py "SQL-text twins"."""
    cell = F.explode("h3_cells").alias("cell")
    c = df.select(F.col(id_col).alias("feature_id"), cell)
    # cell centre -> tile (cells are finer than or comparable to tiles here)
    n = f"pow(2.0D, cast(cast(shiftright(cell, {C.RES_BITS_SHIFT}) as int) as double))"
    lon = f"((cast(cell % {1 << C.IY_SHIFT} as long) + 0.5D) / {n} * 360.0D - 180.0D)"
    lat = (f"((cast(shiftright(cell, {C.IY_SHIFT}) % {1 << C.IY_SHIFT} as long) + 0.5D)"
           f" / {n} * 180.0D - 90.0D)")
    return c.select(
        F.lit(kind).alias("table"),
        "feature_id",
        C.tile_id(lon, lat, z).alias("tile_id"),
    ).distinct()
