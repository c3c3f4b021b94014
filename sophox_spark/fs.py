"""Filesystem abstraction for table/manifest paths.

Snapshot-table reads need existence probes and directory listings. At
cluster scale those paths live on HDFS/S3, where ``os.path`` is wrong —
all probes route through the JVM Hadoop FileSystem API bound to the
session's Hadoop configuration, which resolves the right scheme
(file://, hdfs://, s3a://) per path. In local mode this is the local
filesystem, so tests exercise the same code path that runs on a
cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory ([] if it doesn't exist)."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def any_file_with_suffix(spark: SparkSession, path: str, suffix: str) -> bool:
    return any(n.endswith(suffix) for n in list_names(spark, path))
