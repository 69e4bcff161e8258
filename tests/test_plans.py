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
    assert "ReadSchema: struct<c_custkey:bigint>" in p
    assert "ReadSchema: struct<n_nationkey:int>" in p


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
