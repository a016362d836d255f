"""Filesystem probes through Spark's Hadoop FileSystem API.

Driver-side ``os.path`` checks are WRONG on a cluster: Spark resolves
scheme-less paths against ``fs.defaultFS`` (HDFS/S3 in production, the
local FS only in local mode), so an ``os.path.exists`` probe would
silently answer "missing" for state that is present on the default FS —
turning every micro-batch into a "first batch" and dropping prior state
without an error. All streaming-state existence probes route through
here so the probe always asks the SAME filesystem the DataFrame
reader/writer would use.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the filesystem Spark itself would
    read it from: ``Path.getFileSystem`` resolves scheme'd paths
    (hdfs://, s3a://, file://) to their own FS and scheme-less ones
    against ``fs.defaultFS`` — exactly the resolution DataFrame
    reader/writer paths get."""
    fs, hpath = _fs_path(spark, path)
    return fs.exists(hpath)


def fs_size(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` (0 if absent) on the FS Spark resolves
    it to — the content-summary probe compaction triggers use."""
    fs, hpath = _fs_path(spark, path)
    if not fs.exists(hpath):
        return 0
    return fs.getContentSummary(hpath).getLength()


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete through the Hadoop FileSystem (no-op if absent).
    Returns True if something was deleted."""
    fs, hpath = _fs_path(spark, path)
    if not fs.exists(hpath):
        return False
    return fs.delete(hpath, True)
