"""Round-6 optimization harness (guide §1): noop-sink isolation per
operator + .explain("formatted") capture.

bench.py is FROZEN for the driver's measurement; every extra number this
round cites comes from here. Usage:

    python bench_extra.py [--sf-dir D] [--runs N] [--plans-dir P] [op ...]

Each op is timed with the noop sink (computes every column, discards the
write — guide §1.4), best-of-N with clearCache between runs, and its
physical plan is written to <plans-dir>/<op>.txt when --plans-dir is set.
Prints one JSON line {"queries": {...}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from osmi_water_spark import get_spark  # noqa: E402
from osmi_water_spark.plans import testdata_queries as Q  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("ops", nargs="*")
    args = ap.parse_args()
    sf_dir = args.sf_dir

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="osmi-water-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from osmi_water_spark.operators.dedup import (
        exact_dedup, minhash_near_dups, simhash_near_dups,
    )

    docs_sf = spark.read.parquet(f"{sf_dir}/documents.parquet")

    builders = {
        "pip_join": lambda: Q.q_j5_pip(spark, sf_dir),
        "pip_join_salted": lambda: Q.q_j5_pip_salted(spark, sf_dir),
        "pip_join_auto": lambda: Q.q_j5_pip_auto(spark, sf_dir),
        "connectivity": lambda: Q.q_j3_connectivity(spark, sf_dir),
        "locate": lambda: Q.q_j1_locate(spark, sf_dir),
        "knn": lambda: Q.q_j6_knn(spark, sf_dir),
        "tiles": lambda: Q.q_tiles(spark, sf_dir),
        "map_layers": lambda: Q.q_map_layers(spark, sf_dir),
        "dedup_exact": lambda: Q.q_dedup_exact(spark, sf_dir),
        "minhash_near_dups": lambda: minhash_near_dups(docs_sf, threshold=0.5),
        "simhash_near_dups": lambda: simhash_near_dups(docs_sf, max_hamming=8),
        "embedding_near_dups": lambda: Q.q_embedding_near_dups(spark, sf_dir),
        "ann_bruteforce": lambda: Q.q_ann_cosine_topk(spark, sf_dir),
        "text_stats": lambda: Q.q_text_stats(spark, sf_dir),
        "map_layers_relations": lambda: Q.q_map_layers_relations(spark, sf_dir),
        "map_layers_nodes": lambda: Q.q_map_layers_nodes(spark, sf_dir),
        "map_layers_polygons": lambda: Q.q_map_layers_polygons(spark, sf_dir),
    }
    ops = args.ops or list(builders)

    # warm JVM/codegen/Arrow-worker paths (same rationale as bench.py)
    spark.range(1000).select(F.sum("id")).collect()
    small = docs_sf.limit(64).cache()
    small.count()
    minhash_near_dups(small).count()
    simhash_near_dups(small).count()
    small.unpersist()

    times: dict[str, float] = {}
    for op in ops:
        build = builders[op]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                build().explain("formatted")
            with open(os.path.join(args.plans_dir, f"{op}.txt"), "w") as f:
                f.write(buf.getvalue())
        best = None
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{op}:run{i + 1}")
            t0 = time.time()
            noop(build())
            r = round(time.time() - t0, 3)
            times[f"{op}_run{i + 1}"] = r
            best = r if best is None or r < best else best
        times[op] = best
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": times, "sf_dir": sf_dir, "cpus": cpus,
                      "loadavg_end": [round(x, 2) for x in os.getloadavg()]}))
    spark.stop()


if __name__ == "__main__":
    main()
