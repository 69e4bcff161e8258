"""Filesystem helpers that go through the Hadoop FileSystem API.

Driver-local ``os.path`` checks are correct only on a local/shared POSIX
filesystem; the checkpoint/epoch idempotency contracts must also hold when
the destination is an object store or HDFS (the production posture —
BASELINE.json:6). Routing existence/listing through the path's own
``FileSystem`` implementation makes the same code correct for ``file:``,
``hdfs:``, ``s3a:``, … URIs. (ADVICE.md round 3, incremental.py item.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory ([] if it doesn't exist)."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]
