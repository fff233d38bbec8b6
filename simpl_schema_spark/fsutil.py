"""Hadoop FileSystem helpers (py4j) shared by lineage and index I/O.

One place for the ``Path → getFileSystem → stream`` dance so storage
concerns (credentials, encoding, error handling) have a single home;
works on any Hadoop-supported filesystem, not just local paths.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["delete_dir", "read_text", "write_text"]


def _fs_and_path(spark: SparkSession, path: str):
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(sc._jsc.hadoopConfiguration()), jpath


def delete_dir(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path``; no-op if absent."""
    fs, jpath = _fs_and_path(spark, path)
    fs.delete(jpath, True)


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """(Over)write a small UTF-8 text file (metadata-sized payloads)."""
    fs, jpath = _fs_and_path(spark, path)
    out = fs.create(jpath, True)
    out.write(bytearray(content.encode("utf-8")))
    out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small UTF-8 text file written by :func:`write_text`."""
    jvm = spark.sparkContext._jvm
    fs, jpath = _fs_and_path(spark, path)
    stream = fs.open(jpath)
    reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream))
    chunks = []
    line = reader.readLine()
    while line is not None:
        chunks.append(line)
        line = reader.readLine()
    reader.close()
    return "\n".join(chunks)
