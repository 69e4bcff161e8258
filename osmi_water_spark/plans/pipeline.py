"""The end-to-end pipeline — the reference's 3-pass ``main()``
(/root/reference/src/waterinspector.cpp:108-153) as a DAG of DataFrame
stages:

  A extract      pages -> nodes/ways/relations          (Arrow UDF scan)
  B locate       J1 equi-join                           (shuffle on node id)
  C assemble     J2 + G2-G4 + O1-O3                     (shuffle on rel id)
  D connectivity J3 + A1-A5 + E4                        (shuffle on node id)
  E passes 3/4   J4 hit-count join + J5 cell PIP join   (shuffles on node id / cell)
  F finalize     E2 + O4 + tiles                        (narrow)

Each checkpointable stage can persist to parquet (Iceberg in production)
and is resumable: an existing ``_SUCCESS``-marked output is read back
instead of recomputed, and a ``_lineage`` table records per-stage,
per-partition row counts + wall time (BASELINE.json:14).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmi_water_spark.functions import cells as C
from osmi_water_spark.functions import errors as E
from osmi_water_spark.operators import areas as AR
from osmi_water_spark.operators import assemble as AS
from osmi_water_spark.operators import connectivity as CN
from osmi_water_spark.operators import false_positives as FP
from osmi_water_spark.operators import tiling as TI
from osmi_water_spark.operators.extract import extract_entities, split_entities
from osmi_water_spark.operators.locate import locate_ways, node_locations


@F.arrow_udf(T.BinaryType())
def _point_wkb(lon: pa.Array, lat: pa.Array) -> pa.Array:
    """P12/G1: 21-byte point WKB, built by vectorized scatter into one
    flat binary buffer (functions/wkb_vec.py) instead of per-row
    struct.pack; null iff lon is null/NaN (the previous scalar checked
    only x). Byte-identical — parity-pinned by tests/test_wkb_cells.py."""
    from osmi_water_spark.functions import wkb_vec

    return wkb_vec.point_wkb_array(lon, lat)


class Lineage:
    """Per-stage lineage/metrics collector -> _lineage parquet.

    Row counts come from a ``df.observe()`` aggregation piggybacked on the
    stage's own write action — ZERO extra Spark jobs. (Round 3 ran a
    follow-up ``groupBy(spark_partition_id()).count()`` job over the
    re-read checkpoint per stage: at 100 TB that is a second full read of
    every stage output, and locally it was a measured share of the
    per-stage fixed cost that capped aggregate scaling efficiency. The
    per-partition rows it produced reflected the *re-read's* split, not
    the write's, so only the partition_id=-1 aggregate row was ever
    write-side truth — that row is what ``observe`` now records.)"""

    def __init__(self) -> None:
        self.rows: list[dict] = []
        self._seq = 0

    def attach(self, stage: str, df: DataFrame):
        """Wrap the stage output with a named Observation; the count is
        collected by the write action itself."""
        from pyspark.sql import Observation

        self._seq += 1
        obs = Observation(f"lineage_{stage}_{self._seq}")
        return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs

    def record(self, stage: str, obs, t0: float, input_rows: int | None = None,
               fingerprint: str = "") -> None:
        wall = int((time.time() - t0) * 1000)
        self.rows.append(
            dict(stage=stage, partition_id=-1, input_rows=int(input_rows or -1),
                 output_rows=int(obs.get["rows"]), wall_ms=wall,
                 input_fingerprint=fingerprint)
        )

    def dataframe(self, spark: SparkSession) -> DataFrame:
        from osmi_water_spark.schemas import LINEAGE

        return spark.createDataFrame(self.rows or [], LINEAGE)


class Sink:
    """Stage-checkpoint writer seam: ``fmt='parquet'`` (this sandbox) or
    ``fmt='iceberg'`` (the production path, BASELINE.json:6 — same code,
    routed through an Iceberg catalog table per stage). The Iceberg branch
    needs the iceberg-spark-runtime jars and a configured catalog
    (``spark.sql.catalog.<name>``), which this environment lacks; the seam
    is exercised with parquet by tests/test_determinism_resume.py and the
    iceberg branch is plain ``writeTo``/``read.table`` calls."""

    def __init__(self, out_dir: str, fmt: str = "parquet", catalog: str | None = None,
                 bucket_spec: dict[str, tuple[int, str]] | None = None,
                 partition_spec: dict[str, str] | None = None):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(f"unknown sink format: {fmt}")
        if fmt == "iceberg" and not catalog:
            raise ValueError("iceberg sink needs a catalog (e.g. 'prod.db')")
        self.out_dir, self.fmt, self.catalog = out_dir, fmt, catalog
        # stage name -> (n_buckets, column): write that checkpoint as a
        # BUCKETED table so downstream joins/aggs on the column read it
        # pre-partitioned (no Exchange on that side). Same-session resume
        # reads the bucketed table; a fresh session without the catalog
        # entry falls back to a plain parquet read (correct, un-bucketed).
        self.bucket_spec = bucket_spec or {}
        # stage name -> hive-partition column: a fused multi-output stage
        # (e.g. 'tiles') is written once partitioned by its discriminator,
        # so each logical output reads back with partition pruning.
        self.partition_spec = partition_spec or {}

    def _table(self, name: str) -> str:
        return f"{self.catalog}.{name}"

    def _bucket_table(self, name: str) -> str:
        import hashlib as _h

        tag = _h.md5(self.out_dir.encode()).hexdigest()[:8]
        return f"osmi_ckpt_{tag}_{name}"

    def path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def exists(self, spark: SparkSession, name: str) -> bool:
        if self.fmt == "parquet":
            # Hadoop FS API, not os.path: correct on object stores / HDFS
            # too, not only a driver-local POSIX filesystem
            from osmi_water_spark import fsutil

            return fsutil.exists(spark, os.path.join(self.path(name), "_SUCCESS"))
        return spark.catalog.tableExists(self._table(name))

    def write(self, df: DataFrame, name: str) -> None:
        if self.fmt == "parquet":
            if name in self.bucket_spec:
                n, col = self.bucket_spec[name]
                tbl = self._bucket_table(name)
                spark = df.sparkSession
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                (
                    df.write.mode("overwrite")
                    .bucketBy(n, col).sortBy(col)
                    .option("path", self.path(name))
                    .saveAsTable(tbl)
                )
            elif name in self.partition_spec:
                (
                    df.write.mode("overwrite")
                    .partitionBy(self.partition_spec[name])
                    .parquet(self.path(name))
                )
            else:
                df.write.mode("overwrite").parquet(self.path(name))
        else:
            df.writeTo(self._table(name)).createOrReplace()

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.fmt == "parquet":
            if name in self.bucket_spec and spark.catalog.tableExists(self._bucket_table(name)):
                return spark.read.table(self._bucket_table(name))
            return spark.read.parquet(self.path(name))
        return spark.read.table(self._table(name))


def _stage(sink: Sink | None, name: str, compute, spark: SparkSession,
           lineage: Lineage | None, resume: bool):
    """Checkpoint-or-resume wrapper: one sink table/dir per stage."""
    if sink:
        if resume and sink.exists(spark, name):
            return sink.read(spark, name), True
        t0 = time.time()
        df = compute()
        if lineage is not None:
            df, obs = lineage.attach(name, df)
        sink.write(df, name)
        if lineage is not None:
            lineage.record(name, obs, t0)
        return sink.read(spark, name), False
    # no checkpoint dir: cache stage outputs so the DAG is evaluated once
    # even when several downstream consumers (or separate count() actions)
    # pull on it — the in-memory analogue of the parquet checkpoint
    return compute().cache(), False


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame | None,
    out_dir: str | None = None,
    cell_res: int = C.DEFAULT_RES,
    tile_z: int = 8,
    salt: int = 1,
    resume: bool = False,
    with_lineage: bool = True,
    sink_format: str = "parquet",
    sink_catalog: str | None = None,
    bucket_entities: int | None = None,
    entities: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """pages -> the four output tables + tile tables (+ checkpoints).

    ``bucket_entities``: write the entities checkpoint as a table bucketed
    by id (N buckets) — the J1 locate join then reads its nodes side
    pre-partitioned on the join key (one Exchange instead of two). On a
    100-TB run this is the difference between re-shuffling the node table
    on every pass and shuffling it once at ingest.

    ``entities``: skip Stage A and run the batch DAG from an
    already-extracted entities table (the streaming/incremental
    orchestration hands over the stream-accumulated table here —
    streaming/incremental.py:incremental_pipeline)."""
    bucket_spec = {"entities": (bucket_entities, "id")} if bucket_entities else None
    sink = (
        Sink(out_dir, sink_format, sink_catalog, bucket_spec,
             partition_spec={"tiles": "_t"})
        if out_dir else None
    )
    lineage = Lineage() if (with_lineage and sink) else None

    # ---- Stage A: extraction (skipped when entities are handed over) ----
    if entities is None:
        if sink and resume and sink.exists(spark, "entities"):
            # contract guard BEFORE the resume-read: a checkpoint written
            # under an older extraction schema must fail loudly here, not
            # null-fill or blow up mid-DAG (ADVICE.md r3)
            from osmi_water_spark.operators.extract import validate_entities_schema

            validate_entities_schema(spark, sink.path("entities"))
        entities, _ = _stage(
            sink, "entities", lambda: extract_entities(pages), spark, lineage, resume
        )
    nodes, ways, relations = split_entities(entities)

    # ---- Stage B: locate (J1) ----
    ways_located, _ = _stage(
        sink, "ways_located", lambda: locate_ways(ways, nodes), spark, lineage, resume
    )
    locations = node_locations(nodes)

    # ---- Stage C: assembly ----
    way_rows = AS.build_way_rows(relations, ways_located)
    parts = AS.assemble_ways(way_rows, cell_res)
    ways_out = parts["ways"]
    remembered = parts["remembered"]
    way_errors = parts["way_errors"]
    relations_out = AS.assemble_relations(relations, parts["geoms"], cell_res)

    # areas / masks / pass outputs fan out to several consumers below —
    # cache them so each is evaluated once per run
    areas = AR.build_areas(ways_located, relations).cache()
    polygons_out = AR.polygon_table(areas, cell_res)
    pip_parts = AR.pip_index(areas).cache()

    # ---- Stage D: connectivity ----
    masks = CN.error_mask(CN.node_stats(remembered)).cache()
    normal, candidates = CN.split_candidates(masks)

    # ---- Stage E: passes 3 + 4 ----
    after3 = FP.apply_pass3(candidates, ways).cache()
    # res_list auto-discovered (one tiny collect over the cached parts):
    # the point-side explode fan-out equals the number of resolutions
    # actually present, which beats a fixed range by ~5x shuffle volume
    after4 = FP.apply_pass4(after3, locations, pip_parts, salt=salt).cache()

    # ---- Stage F: finalize nodes table (O4) ----
    emitted3 = after3.filter(F.col("emitted3")).select("node_id", F.lit(0).alias("final_mask"))
    emitted4 = after4.filter(F.col("emitted4")).select("node_id", F.lit(0).alias("final_mask"))
    survivors = after4.filter(~F.col("emitted4")).select(
        "node_id", E.switch_poss("mask4").alias("final_mask")
    )
    normal_rows = normal.select("node_id", F.col("mask").alias("final_mask"))
    way_error_rows = way_errors.select("node_id", F.lit(E.WAY).alias("final_mask"))

    all_nodes = (
        normal_rows.unionByName(way_error_rows)
        .unionByName(emitted3)
        .unionByName(emitted4)
        .unionByName(survivors)
    )
    # location join: normal emission requires a location (handle_node skips
    # unlocated nodes, waterway.hpp:142-147); fixtures locate everything.
    located = all_nodes.join(locations, "node_id", "inner")
    ecols = E.node_output_columns("final_mask")
    nodes_out = located.select(
        F.col("node_id").cast("string").alias("node_id"),
        *[v.alias(k) for k, v in ecols.items()],
        _point_wkb("lon", "lat").alias("geom_wkb"),
        C.cell_of("lon", "lat", cell_res).alias("h3_cell"),
        "lon",
        "lat",
    )

    # the four output tables are independent leaves of the DAG: submit
    # their stage jobs CONCURRENTLY (SparkSession is thread-safe; shared
    # cached upstreams are computed once under BlockManager's per-block
    # locks). In checkpointed mode this overlaps four write barriers that
    # were serial — per-stage fixed cost (job launch, output commit) was
    # the measured non-scaling share of the pipeline wall (BENCH.md round
    # 3 stage profile), and it shrinks by the overlap factor. On a real
    # cluster this is the standard multi-job scheduler pattern.
    from concurrent.futures import ThreadPoolExecutor

    out: dict[str, DataFrame] = {}
    leaves = {
        "ways": lambda: ways_out,
        "relations": lambda: relations_out,
        "polygons": lambda: polygons_out,
        "nodes": lambda: nodes_out,
    }
    with ThreadPoolExecutor(max_workers=len(leaves)) as ex:
        futs = {
            name: ex.submit(_stage, sink, name, compute, spark, lineage, resume)
            for name, compute in leaves.items()
        }
        for name, fut in futs.items():
            out[name], _ = fut.result()

    tv = TI.tile_validation(out["nodes"], tile_z)
    polys_fid = out["polygons"].withColumn(
        "fid", F.when(F.col("way_id") != 0, F.col("way_id")).otherwise(F.col("relation_id"))
    )
    ta = (
        TI.feature_tile_assignment(out["ways"], "ways", "way_id", tile_z, cell_res)
        .unionByName(TI.feature_tile_assignment(polys_fid, "polygons", "fid", tile_z, cell_res))
        .unionByName(
            TI.feature_tile_assignment(out["relations"], "relations", "relation_id", tile_z, cell_res)
        )
    )
    # the two tile tables are FUSED into one stage: a union-with-kind
    # written once (hive-partitioned by the discriminator, so each logical
    # output reads back with partition pruning). Round 3 ran them as two
    # jobs with two commits; the per-stage profile showed the small stages
    # at eff 0.4-0.55 — pure fixed cost, halved by the fusion.
    tiles_union = tv.withColumn("_t", F.lit("v")).unionByName(
        ta.withColumn("_t", F.lit("a")), allowMissingColumns=True
    )
    tiles, _ = _stage(sink, "tiles", lambda: tiles_union, spark, lineage, resume)
    out["tile_validation"] = tiles.filter(F.col("_t") == "v").select(
        "tile_id", "table", "error_class", "n"
    )
    out["tile_assignment"] = tiles.filter(F.col("_t") == "a").select(
        "table", "feature_id", "tile_id"
    )

    if lineage is not None:
        sink.write(lineage.dataframe(spark), "_lineage")
        out["_lineage"] = sink.read(spark, "_lineage")
    return out
