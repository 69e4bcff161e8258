"""Structured-Streaming ingest tests: incremental extraction keeps up with
arriving page files, restart-safe via checkpoint."""

from __future__ import annotations

from osmi_water_spark.sources import pages_gen as PG
from osmi_water_spark.streaming.incremental import stream_extract


def _write_pages(spark, rows, path):
    PG.pages_dataframe(spark, rows).write.mode("append").parquet(path)


def test_stream_extract_incremental(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "entities")
    ckpt = str(tmp_path / "ckpt")

    rows = PG.pages_rows(["w01_chain"])
    _write_pages(spark, rows, pages_dir)
    q = stream_extract(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(300)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == len(rows)
    assert set(got1.select("kind").distinct().toPandas()["kind"]) == {"node", "way"}

    # new files arrive; a restarted query processes ONLY the delta
    rows2 = PG.pages_rows(["w02_name_change"])
    _write_pages(spark, rows2, pages_dir)
    q2 = stream_extract(spark, pages_dir, out_dir, ckpt)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == len(rows) + len(rows2)
    # no duplicates: urls unique
    assert got2.select("url").distinct().count() == got2.count()


def test_stream_quality_plan(spark, tmp_path):
    """The windowed-watermark aggregation plan is streamable (no
    unsupported-operation error at analysis time)."""
    from osmi_water_spark.streaming.incremental import stream_text_quality

    pages_dir = str(tmp_path / "pages")
    _write_pages(spark, PG.pages_rows(["w01_chain"]), pages_dir)
    agg = stream_text_quality(spark, pages_dir, str(tmp_path / "c2"))
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("quality_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append-mode window agg emits only watermark-closed windows (none here);
    # the point is the query runs end-to-end
    spark.sql("select * from quality_counts").collect()
