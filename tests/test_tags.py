"""Table-driven unit tests for F1-F8 / P1-P5 / P8-P9 against hand-computed
expectations from /root/reference/src/tagcheck.hpp."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osmi_water_spark.functions import tags as TG


def _run(spark, rows, colfn):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "i int, tags map<string,string>"
    )
    out = df.select("i", colfn(F.col("tags")).alias("v")).orderBy("i").collect()
    return [r.v for r in out]


def test_is_waterway_way(spark):
    rows = [
        {"waterway": "river"},
        {"waterway": "riverbank"},          # rejected (tagcheck.hpp:41-44)
        {"type": "multipolygon", "waterway": "river"},  # rejected (:37-39)
        {"natural": "coastline"},            # way-only accept (:53-58)
        {"natural": "water"},
        {},
        {"waterway": "xyz"},
    ]
    assert _run(spark, rows, lambda t: TG.is_waterway(t, False)) == [
        True, False, False, True, False, False, True,
    ]


def test_is_waterway_relation(spark):
    rows = [
        {"type": "waterway"},
        {"type": "waterway", "waterway": "riverbank"},  # riverbank check first
        {"natural": "coastline"},  # coastline NOT accepted for relations
        {"waterway": "canal"},
        {"type": "multipolygon"},
    ]
    assert _run(spark, rows, lambda t: TG.is_waterway(t, True)) == [
        True, False, False, True, False,
    ]


def test_waterpolygon_filter(spark):
    rows = [
        {"natural": "water"},
        {"waterway": "riverbank"},
        {"landuse": "reservoir"},
        {"landuse": "basin"},
        {"landuse": "farm"},
        {"natural": "wood"},
        {},
    ]
    assert _run(spark, rows, TG.waterpolygon_filter) == [
        True, True, True, True, False, False, False,
    ]


def test_is_way_to_analyse(spark):
    rows = [
        {"waterway": "anything"},
        {"natural": "coastline"},
        {"natural": "water"},
        {"landuse": "reservoir"},
        {"landuse": "basin"},
        {"landuse": "forest"},
        {},
    ]
    assert _run(spark, rows, TG.is_way_to_analyse) == [
        True, True, True, True, True, False, False,
    ]


def test_is_area_to_analyse(spark):
    rows = [
        {"natural": "water"},                      # True (no exclusion)
        {"waterway": "riverbank"},                 # excluded
        {"waterway": "river"},                     # excluded
        {"natural": "water", "water": "river"},    # excluded via water tag
        {"natural": "water", "water": "lake"},     # lake passes
        {"waterway": "lock"},                      # not in exclude list
        {},
    ]
    assert _run(spark, rows, TG.is_area_to_analyse) == [
        True, False, False, False, True, True, True,
    ]


def test_is_riverbank_or_coastline_and_water_area(spark):
    rows = [
        {"waterway": "riverbank"},
        {"natural": "coastline"},
        {"waterway": "river"},
        {},
    ]
    assert _run(spark, rows, TG.is_riverbank_or_coastline) == [True, True, False, False]
    rows2 = [{"natural": "water"}, {"landuse": "basin"}, {"waterway": "x"}, {"landuse": "farm"}]
    assert _run(spark, rows2, TG.is_water_area) == [True, True, True, False]


def test_get_way_type_and_category(spark):
    rows = [
        {"waterway": "river"},
        {"waterway": "weir"},       # -> "other"
        {"natural": "coastline"},   # -> "coastline"
        {},                          # -> ""
        {"waterway": "brook"},
    ]
    assert _run(spark, rows, TG.get_way_type) == ["river", "other", "coastline", "", "brook"]
    cats = _run(
        spark, rows, lambda t: TG.get_waterway_category(TG.get_way_type(t))
    )
    assert cats == ["C", "?", "?", "?", "A"]


def test_get_polygon_type_quirk(spark):
    # tagcheck.hpp:166-175: waterway-tagged areas -> "" (the quirk);
    # landuse fallback only when no waterway type.
    rows = [
        {"natural": "coastline"},
        {"waterway": "riverbank"},                 # -> "" (!)
        {"natural": "water"},                      # -> "" (landuse default)
        {"landuse": "reservoir"},                  # -> "reservoir"
        {"waterway": "weir", "landuse": "basin"},  # waterway type "other" -> ""
        {},
    ]
    assert _run(spark, rows, TG.get_polygon_type) == [
        "coastline", "", "", "reservoir", "", "",
    ]


def test_width_tag_and_construction(spark):
    rows = [
        {"width": "3", "est_width": "9"},
        {"est_width": "9"},
        {},
        {"bridge": "yes"},
        {"tunnel": "culvert"},
        {"bridge": "no", "tunnel": "yes"},  # bridge key presence wins
    ]
    assert _run(spark, rows, TG.get_width_tag) == ["3", "9", None, None, None, None]
    assert _run(spark, rows, TG.get_construction) == ["", "", "", "bridge", "tunnel", "bridge"]


def test_format_lastchange(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2015, 7, 6, 12, 34, 56),)], "ts timestamp"
    )
    assert (
        df.select(TG.format_lastchange(F.col("ts")).alias("v")).first().v
        == "2015-07-06 12:34:56"
    )


def test_sql_text_twins_match_column_builders(spark):
    """r6: every tags.py / errors.py function's SQL-text path (string
    column-name arg) must produce identical values and types to its
    Column path, across all predicate branches."""
    from pyspark.sql import functions as F

    from osmi_water_spark.functions import errors as E
    from osmi_water_spark.functions import tags as TG
    from osmi_water_spark.plans.testdata_queries import _tags_from_key

    df = spark.range(0, 3000).select(
        _tags_from_key(F.col("id")).alias("tags"),
        F.timestamp_seconds(F.col("id") * 977 % 2_000_000_000).alias("ts"),
        (F.col("id") % 4096).cast("int").alias("mask"),
        F.element_at(
            F.array(*[F.lit(v) for v in
                      ["river", "stream", "drain", "weir", "", "coastline", None]]),
            (F.col("id") % 7 + 1).cast("int"),
        ).alias("wt"),
    )
    pairs = [
        (TG.is_waterway(F.col("tags"), False), TG.is_waterway("tags", False)),
        (TG.is_waterway(F.col("tags"), True), TG.is_waterway("tags", True)),
        (TG.waterpolygon_filter(F.col("tags")), TG.waterpolygon_filter("tags")),
        (TG.has_waterway_tag(F.col("tags")), TG.has_waterway_tag("tags")),
        (TG.is_way_to_analyse(F.col("tags")), TG.is_way_to_analyse("tags")),
        (TG.is_area_to_analyse(F.col("tags")), TG.is_area_to_analyse("tags")),
        (TG.is_riverbank_or_coastline(F.col("tags")), TG.is_riverbank_or_coastline("tags")),
        (TG.is_water_area(F.col("tags")), TG.is_water_area("tags")),
        (TG.get_waterway_type(F.col("wt")), TG.get_waterway_type("wt")),
        (TG.get_way_type(F.col("tags")), TG.get_way_type("tags")),
        (TG.get_polygon_type(F.col("tags")), TG.get_polygon_type("tags")),
        (TG.get_waterway_category(F.col("wt")), TG.get_waterway_category("wt")),
        (TG.get_width_tag(F.col("tags")), TG.get_width_tag("tags")),
        (TG.get_construction(F.col("tags")), TG.get_construction("tags")),
        (TG.format_lastchange(F.col("ts")), TG.format_lastchange("ts")),
        (TG.name_or_empty(F.col("tags")), TG.name_or_empty("tags")),
        (E.has(F.col("mask"), E.RIVER), E.has("mask", E.RIVER)),
        (E.switch_poss(F.col("mask")), E.switch_poss("mask")),
        (E.resolve_false_positive(F.col("mask")), E.resolve_false_positive("mask")),
    ]
    col_out = E.node_output_columns(F.col("mask"))
    sql_out = E.node_output_columns("mask")
    for k in col_out:
        pairs.append((col_out[k], sql_out[k]))
    sel = df.select(
        *[c.alias(f"col_{i}") for i, (c, _) in enumerate(pairs)],
        *[s.alias(f"sql_{i}") for i, (_, s) in enumerate(pairs)],
    )
    sch = {f.name: f.dataType for f in sel.schema.fields}
    for i in range(len(pairs)):
        assert sch[f"col_{i}"] == sch[f"sql_{i}"], f"type mismatch at pair {i}"
    bad = sel.filter(
        " OR ".join(f"(NOT (col_{i} <=> sql_{i}))" for i in range(len(pairs)))
    ).count()
    assert bad == 0
