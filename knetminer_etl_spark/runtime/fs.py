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


def fs_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the filesystem Spark itself would
    read it from: ``Path.getFileSystem`` resolves scheme'd paths
    (hdfs://, s3a://, file://) to their own FS and scheme-less ones
    against ``fs.defaultFS`` — exactly the resolution DataFrame
    reader/writer paths get."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)
