"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

Primary metric: end-to-end waterway-pipeline throughput in pages
(documents) per second over a distributed synthetic pages table
(extraction -> locate -> assemble -> connectivity -> PIP passes ->
nodes+tiles), i.e. the BASELINE.json "spatial-join + tile-assignment
throughput (docs/sec)". Secondary timings cover the other headline
operators. Knobs via env: SPARK_GRAFT_CHAINS (pipeline input size,
default 4000 chains = 64k pages at sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from osmi_water_spark import get_spark  # noqa: E402
from osmi_water_spark.plans import testdata_queries as Q  # noqa: E402
from osmi_water_spark.plans.pipeline import run_pipeline  # noqa: E402
from osmi_water_spark.sources.pages_gen import scale_pages_df  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        print(json.dumps({"error": f"sf dir not found: {sf_dir}"}))
        sys.exit(2)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    chains = int(os.environ.get("SPARK_GRAFT_CHAINS", min(20000, max(200, int(40000 * sf)))))

    # SPARK_GRAFT_MASTER overrides the topology (the scaling campaigns pass
    # local-cluster[n,c,mem] to run with real separate executor JVMs);
    # shuffle width then derives from the topology inside get_spark.
    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    spark = get_spark(app_name="osmi-water-bench", master=master,
                      shuffle_partitions=None if master.startswith("local-cluster") else cpus)
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        times[name] = round(time.time() - t0, 3)
        return n

    def timed2(name, fn):
        """Best-of-N (default 3) for secondary ops: this sandbox host shows
        up to 7x external window variance; round 2's committed record let
        ONE bad window write a 3x 'regression' for minhash that BENCH.md's
        warm number contradicted, and round 4's best-of-2 still let a bad
        window print +21-51% on four rows that reproduced nowhere
        (VERDICT r4 What's-wrong #1 — tokenhash_bench ruled the code out).
        Every raw run is recorded (run1..runN) so the min stays
        self-describing. clearCache between runs — CacheManager is
        plan-keyed, an identical second plan would silently read the first
        run's cache."""
        n = int(os.environ.get("SPARK_GRAFT_SEC_RUNS", "3"))
        best = None
        for i in range(max(1, n)):
            if i:
                spark.catalog.clearCache()
            t0 = time.time()
            fn()
            r = round(time.time() - t0, 3)
            times[f"{name}_run{i + 1}"] = r
            best = r if best is None or r < best else best
        times[name] = best

    # warm the JVM / codegen / Arrow-worker paths so the timed window
    # measures steady-state throughput, not session startup. The warm input
    # must be big enough to trigger C2 JIT of the hot codegen loops (a
    # 20-chain warm left the first timed run paying 2-4x JIT cost).
    spark.range(1000).select(F.sum("id")).collect()
    warm = scale_pages_df(spark, min(1000, max(100, chains // 8))).cache()
    warm.count()
    wout = run_pipeline(spark, warm, out_dir=None, with_lineage=False)
    for k in ("ways", "relations", "polygons", "nodes"):
        wout[k].count()
    spark.catalog.clearCache()

    # ---- headline: full pipeline docs/sec ----
    pages = scale_pages_df(spark, chains).cache()
    n_pages = pages.count()  # materialize input outside the timed window

    # SPARK_GRAFT_OUT: run the PRODUCTION configuration — per-stage
    # checkpoints to this dir (the resumable path the north rule names).
    # Unset = in-memory cached stages (fast local convenience; its JVM
    # columnar-cache build is allocation-bound and anti-scales in a single
    # shared heap, so scaling campaigns use the checkpointed mode).
    ckpt_dir = os.environ.get("SPARK_GRAFT_OUT")

    def run_pipe():
        from concurrent.futures import ThreadPoolExecutor

        if ckpt_dir:
            import shutil

            shutil.rmtree(ckpt_dir, ignore_errors=True)
        out = run_pipeline(spark, pages, out_dir=ckpt_dir, with_lineage=False)
        # concurrent counts: in cached mode these are what actually
        # materialize the (lazy) stage caches — overlap them like the
        # checkpointed mode overlaps its stage writes
        with ThreadPoolExecutor(max_workers=4) as ex:
            return sum(
                n for n in ex.map(
                    lambda k: out[k].count(), ("ways", "relations", "polygons", "nodes")
                )
            )

    # best-of-N (default 3): the sandbox host shows up to 7x external
    # wall-clock noise (see BENCH.md) — round 4's "regressions" were
    # single-bad-window artifacts, and an observed in-session swing of
    # 44.7 -> 18.7 s on the SAME plan motivated the round-5 move from
    # best-of-2 to best-of-3 (matching the secondary rows).
    # clearCache between runs — Spark's CacheManager is plan-keyed, so a
    # repeat identical run would otherwise read the prior run's cache.
    # SPARK_GRAFT_RUNS=1 drops repeats (giant-input scaling campaigns
    # where one narrow-width run alone approaches the subprocess timeout).
    n_runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    timed("pipeline", run_pipe)
    best = times["pipeline"]
    times["pipeline_run1"] = best
    for r in range(2, n_runs + 1):
        spark.catalog.clearCache()
        pages = scale_pages_df(spark, chains).cache()
        pages.count()
        timed("pipeline", run_pipe)
        times[f"pipeline_run{r}"] = times["pipeline"]
        best = min(best, times["pipeline"])
    times["pipeline"] = best
    docs_per_sec = round(n_pages / times["pipeline"], 1)

    if os.environ.get("SPARK_GRAFT_ONLY") == "pipeline":
        print(json.dumps({"metric": "pipeline_docs_per_sec", "value": docs_per_sec,
                          "unit": "sec", "queries": times, "sf": sf,
                          "pages": n_pages, "cpus": cpus,
                          "loadavg_end": [round(x, 2) for x in os.getloadavg()]}))
        spark.stop()
        return

    # ---- secondary operator timings over the sf tables ----
    # warm the dedup/ANN python-worker paths on a small slice first: fresh
    # workers pay 100-400x first-touch page-fault cost on this sandbox's
    # first big numpy allocation (see BENCH.md) — the timed window should
    # measure the operator, not the VM's fault handler
    docs_small = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(64).cache()
    docs_small.count()
    from osmi_water_spark.operators.dedup import (
        minhash_near_dups, simhash_near_dups,
    )
    minhash_near_dups(docs_small).count()
    simhash_near_dups(docs_small).count()
    docs_small.unpersist()

    # minhash/simhash BENCH numbers measure the operators over the sf
    # documents table (the correctness queries now run the deterministic
    # fixture corpus, which would be trivially small here)
    from osmi_water_spark.operators.dedup import (
        minhash_near_dups as _mh, simhash_near_dups as _sh,
    )
    docs_sf = spark.read.parquet(f"{sf_dir}/documents.parquet")

    timed2("pip_join", lambda: Q.q_j5_pip(spark, sf_dir).count())
    timed2("pip_join_salted", lambda: Q.q_j5_pip_salted(spark, sf_dir).count())
    # knobs-off auto mode: records the discovery-job overhead (res-list
    # collect, stats agg, broadcast decision) next to the pinned row
    timed2("pip_join_auto", lambda: Q.q_j5_pip_auto(spark, sf_dir).count())
    timed2("connectivity", lambda: Q.q_j3_connectivity(spark, sf_dir).count())
    timed2("locate", lambda: Q.q_j1_locate(spark, sf_dir).count())
    timed2("knn", lambda: Q.q_j6_knn(spark, sf_dir).count())
    timed2("tiles", lambda: Q.q_tiles(spark, sf_dir).count())
    timed2("map_layers", lambda: Q.q_map_layers(spark, sf_dir).count())
    timed2("dedup_exact", lambda: Q.q_dedup_exact(spark, sf_dir).count())
    timed2("minhash_near_dups", lambda: _mh(docs_sf, threshold=0.5).count())
    timed2("simhash_near_dups", lambda: _sh(docs_sf, max_hamming=8).count())
    timed2("embedding_near_dups", lambda: Q.q_embedding_near_dups(spark, sf_dir).count())
    timed2("ann_bruteforce", lambda: Q.q_ann_cosine_topk(spark, sf_dir).count())
    timed2("text_stats", lambda: Q.q_text_stats(spark, sf_dir).count())
    timed2("map_layers_relations", lambda: Q.q_map_layers_relations(spark, sf_dir).count())

    # *_runN are raw repeats of work already counted under the best-of-N
    # min — exclude them so the total isn't multiple-counted
    import re

    total = round(
        sum(
            v for k, v in times.items()
            if not k.startswith("pipeline_run") and not re.search(r"_run\d+$", k)
        ),
        3,
    )
    print(
        json.dumps(
            {
                "metric": "pipeline_docs_per_sec",
                "value": docs_per_sec,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "pages": n_pages,
                "cpus": cpus,
                "total_sec": total,
                # window self-description: this sandbox's external load
                # swings wall-clock up to 7x; the 1/5/15-min load averages
                # at exit let a reader judge a record's window without
                # cross-referencing BENCH.md narratives
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
