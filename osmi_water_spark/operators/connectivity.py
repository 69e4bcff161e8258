"""Stage D — J3/A1-A5/E1/E4: endpoint connectivity analysis.

The reference's ``node_map`` (endpoint -> connected ways,
/root/reference/src/datastorage.hpp:203-210) + ``analyse_nodes``
(/root/reference/src/waterway.hpp:369-404) become one unpivot + one hash
aggregate — partial aggregation (map-side combine) comes free from
Catalyst; the groupBy key is the node id, so the shuffle is one exchange
of (node_id, small payload) pairs regardless of way fan-in.

Multiplicity semantics replicated exactly: every remembered way row emits
an entry for its first node AND its last node; each entry then contributes
to count_first/names/category_out when the entry node equals the way's
first node and to count_last/names/category_in when it equals the last
node — so a closed way (first==last) contributes 2 to both counts and 4
names at that node, exactly like the reference's double push_back +
double-if loop (datastorage.hpp:208-209, waterway.hpp:381-393).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmi_water_spark.functions import errors as E


def node_stats(remembered: DataFrame) -> DataFrame:
    """remembered(first_node, last_node, name, category) -> per-node A1
    aggregate: counts, name multiset, max in/out categories."""
    entries = remembered.select(
        "first_node",
        "last_node",
        "name",
        "category",
        F.explode(F.array("first_node", "last_node")).alias("node_id"),
    ).select(
        "node_id",
        (F.col("node_id") == F.col("first_node")).cast("int").alias("cf"),
        (F.col("node_id") == F.col("last_node")).cast("int").alias("cl"),
        "name",
        "category",
    )
    return entries.groupBy("node_id").agg(
        F.sum("cf").alias("count_first"),
        F.sum("cl").alias("count_last"),
        F.flatten(F.collect_list(F.array_repeat("name", F.col("cf") + F.col("cl")))).alias("names"),
        F.max(F.when(F.col("cl") == 1, F.col("category"))).alias("max_in"),  # A2
        F.max(F.when(F.col("cf") == 1, F.col("category"))).alias("max_out"),
    )


def error_mask(stats: DataFrame) -> DataFrame:
    """A3-A5 + E1 -> integer mask column, preserving the reference's
    overwrite semantics (set_poss_* replaces direction/name bits,
    errorsum.hpp:53-59) and branch order (waterway.hpp:395-397)."""
    cf, cl = F.col("count_first"), F.col("count_last")
    # A3 (waterway.hpp:71-77)
    direction = (F.abs(cf - cl) > 1) & ((cf == 0) | (cl == 0))
    # A4 (waterway.hpp:82-88): exactly two names with differing values
    n_names = F.size("names")
    name_err = (n_names == 2) & (F.size(F.array_distinct("names")) > 1)
    base = direction.cast("int") * E.DIRECTION + name_err.cast("int") * E.NAME
    # A5 (waterway.hpp:102-133): if-chain over category vector sizes
    both = (cl > 0) & (cf > 0)
    type_err = both & (F.col("max_in") == "C") & (F.col("max_out") < "C") & (F.col("max_out") != "?")
    one_in = ~both & (cl == 1)
    one_out = ~both & ~one_in & (cf == 1)
    mask = (
        F.when(one_in & (F.col("max_in") == "C"), F.lit(E.POSS_RIVERMOUTH + E.RIVER))
        .when(one_in & (F.col("max_in") == "B"), F.lit(E.POSS_RIVERMOUTH + E.STREAM))
        .when(one_out & (F.col("max_out") == "C"), F.lit(E.POSS_OUTFLOW + E.RIVER))
        .when(one_out & (F.col("max_out") == "B"), F.lit(E.POSS_OUTFLOW + E.STREAM))
        .otherwise(base + type_err.cast("int") * E.TYPE)
    )
    return stats.select("node_id", mask.alias("mask"))


def split_candidates(masks: DataFrame) -> tuple[DataFrame, DataFrame]:
    """E4 (waterway.hpp:139-154): mask==0 -> normal nodes (emitted now),
    else -> candidate set for passes 3/4."""
    normal = masks.filter(F.col("mask") == 0)
    candidates = masks.filter(F.col("mask") != 0)
    return normal, candidates
