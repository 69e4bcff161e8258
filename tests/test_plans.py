"""Physical-plan audits: pushdown, pruning, and no-per-row-Python are
load-bearing properties at 100 TB — these tests pin them against
regressions (SURVEY.md §4)."""

from __future__ import annotations

import contextlib
import io

import pytest

from osmi_water_spark.plans import testdata_queries as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    # plan-keyed CacheManager: tables cached by earlier tests would replace
    # parquet scans with InMemoryRelation and hide the scan-level assertions
    spark.catalog.clearCache()
    yield


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_column_pruning_reaches_scan(spark):
    p = plan_of(Q.q_ann_cosine_topk(spark, SF))
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in p
    p = plan_of(Q.q_text_stats(spark, SF))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_predicate_pushdown_reaches_scan(spark):
    p = plan_of(Q.q_j6_knn(spark, SF))
    assert "LessThan(c_custkey,200)" in p, "filter must reach the parquet scan"


def test_pip_scan_reads_keys_only(spark):
    p = plan_of(Q.q_j5_pip(spark, SF))
    # point side: column-pruned to the key the synthetic lon/lat derive from
    assert "ReadSchema: struct<c_custkey:bigint>" in p
    # probe mode: the (small) polygon side is consumed driver-side into the
    # broadcast cell index — the distributed plan is scan -> mapInArrow ->
    # pair dedup with NO join and no point-side explode at all
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_no_row_at_a_time_python(spark):
    """All Python stages must be Arrow-vectorized (BatchEvalPython is the
    pickled row-at-a-time path — banned by BASELINE.json:15)."""
    for name in ("j5_pip", "j1_locate", "j3_connectivity", "map_layers", "text_stats"):
        p = plan_of(Q.QUERIES[name](spark, SF))
        assert "BatchEvalPython" not in p, f"{name} uses row-at-a-time Python"


def test_tag_predicates_are_codegen(spark):
    """F-predicates must appear as CASE/boolean expressions inside the plan,
    not as Python eval nodes."""
    p = plan_of(Q.q_f1_is_waterway_way(spark, SF))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CASE WHEN" in p


def test_bucketed_checkpoint_skips_exchange(spark, tmp_path):
    """Sink bucket_spec: a checkpoint written bucketed on the join key is
    read back pre-partitioned — the join plans ONE Exchange (the derived
    side) instead of two. At 100 TB this is 'shuffle the node table once
    at ingest, never again'."""
    from pyspark.sql import functions as F

    from osmi_water_spark.plans.pipeline import Sink

    sink = Sink(str(tmp_path), bucket_spec={"entities": (4, "id")})
    df = spark.range(1000).select("id", (F.col("id") * 2).alias("v"))
    sink.write(df, "entities")
    back = sink.read(spark, "entities")
    other = spark.range(500).select((F.col("id") * 3 % 1000).alias("id"), F.lit(1).alias("w"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        joined = back.join(other, "id").select("id", "v", "w")
        p = plan_of(joined)
        # exactly ONE Exchange node: the non-bucketed side. The bucketed
        # scan must feed the SortMergeJoin through Sort only.
        n_exchanges = p.count("Exchange (")
        assert n_exchanges == 1, f"expected 1 Exchange (non-bucketed side), plan:\n{p}"
        assert "Bucketed: true" in p, p
        # round-trip sanity: same result as the plain-parquet path
        plain = Sink(str(tmp_path / "plain"))
        plain.write(df, "entities")
        want = plain.read(spark, "entities").join(other, "id").select(F.sum("v")).first()[0]
        assert joined.select(F.sum("v")).first()[0] == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        spark.sql("DROP TABLE IF EXISTS " + sink._bucket_table("entities"))


def test_extraction_decode_is_jvm_side(spark):
    """Round-3 contract: Stage A payload decode is Catalyst (regexp_extract
    + from_json) — the ONLY Python in the stage is the text UDF, and
    consumers that don't select text carry NO Python stage at all (the
    column pruner removes the Arrow UDF entirely)."""
    from osmi_water_spark.operators.extract import extract_entities, split_entities
    from osmi_water_spark.sources import pages_gen as PG

    pages = PG.pages_dataframe(spark, PG.pages_rows(["w01_chain"]))
    extracted = extract_entities(pages)
    p = plan_of(extracted)
    assert "BatchEvalPython" not in p, "row-at-a-time Python in extraction"
    # tree lines read "ArrowEvalPython (n" — detail sections repeat the
    # name as "(n) ArrowEvalPython", so count tree occurrences only
    assert p.count("ArrowEvalPython (") == 1, "exactly one Arrow stage (text)"
    assert "from_json" in p, "payload decode must be a JVM expression"

    nodes, ways, relations = split_entities(extracted)
    for df in (nodes, ways, relations):
        q = plan_of(df)
        assert "ArrowEvalPython" not in q and "BatchEvalPython" not in q, (
            "entity consumers must not pay the text UDF (pruning broken)"
        )
