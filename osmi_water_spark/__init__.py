"""osmi_water_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
``Nathanael-L/osmi-water`` (C++/libosmium/GEOS, see /root/reference) as an
idiomatic Spark DataFrame pipeline:

* tag predicates / projections  -> native column expressions (Catalyst-pushable)
* node-location index           -> equi-join (J1)
* relation membership           -> explode + equi-join (J2)
* endpoint connectivity         -> unpivot + groupBy aggregate (J3/A1-A5)
* STRtree point-in-polygon      -> grid-cell cover equi-join + vectorized
                                   exact refine (J5), with deterministic salting
* sqlite sink                   -> parquet (Iceberg in production) output tables
                                   + per-tile validation rollups

The package is pure Python on top of pyspark; geometry is handled with
numpy-vectorized WKB encoders and ray-casting (no GEOS/shapely dependency).
"""

__version__ = "0.1.0"

from osmi_water_spark.session import get_spark  # noqa: F401
