"""The ``spark-submit --py-files`` deployment path, actually driven.

The north rule (BASELINE.json) names the deployment form literally:
"run via spark-submit --py-files on a multi-executor cluster".
scripts/run_pipeline_job.py is that entry point, but until round 5
nothing exercised it — this test zips the package, submits the job to a
real multi-executor master (local-cluster[2,2,1536] — two separate
executor JVMs that can only see the code through the shipped zip), and
checks the four output tables against an in-process run of the same
seeded pages. A PYTHONPATH leak (executors importing the repo checkout
instead of the zip) is ruled out by submitting from a different cwd with
no repo on PYTHONPATH.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)

_CHAINS = 120


def test_spark_submit_py_files_deployment(spark, tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        pytest.skip("no spark-submit on this box")

    from osmi_water_spark.plans.pipeline import run_pipeline
    from osmi_water_spark.sources.pages_gen import scale_pages_df

    pages = scale_pages_df(spark, _CHAINS)
    pages_dir = str(tmp_path / "pages")
    pages.write.parquet(pages_dir)

    # the expected answer: the same pipeline in-process (cache mode)
    expect = run_pipeline(spark, spark.read.parquet(pages_dir))
    expected_counts = {
        name: expect[name].count()
        for name in ("nodes", "ways", "polygons", "relations", "tile_validation")
    }
    assert expected_counts["nodes"] > 0 and expected_counts["ways"] > 0

    zip_path = str(tmp_path / "osmi_water_spark.zip")
    subprocess.run(
        ["zip", "-qr", zip_path, "osmi_water_spark", "-x", "*__pycache__*"],
        cwd=REPO, check=True,
    )

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    # executors must get the code from --py-files, not a leaked checkout
    env.pop("PYTHONPATH", None)
    env.pop("SPARK_GRAFT_MASTER", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,1536]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "run_pipeline_job.py"),
            pages_dir, out_dir,
        ],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
    )
    if r.returncode != 0 and "java.net.BindException" in r.stderr:
        pytest.skip("local-cluster could not bind in this env")
    assert r.returncode == 0, f"spark-submit failed; stderr tail:\n{r.stderr[-3000:]}"

    # the job prints "<table>: N rows" per output — parse and compare
    got = {}
    for line in r.stdout.splitlines():
        parts = line.strip().split(": ")
        if len(parts) == 2 and parts[1].endswith(" rows"):
            got[parts[0]] = int(parts[1][: -len(" rows")])
    assert got == expected_counts

    # and the checkpointed outputs are really on disk, readable, non-empty
    for name in ("nodes", "ways", "polygons"):
        df = spark.read.parquet(os.path.join(out_dir, name))
        assert df.count() == expected_counts[name]
