"""Filesystem shim for index metadata IO (markers, stats.json, manifests).

The segment build advertises object-store index roots
(``--index-dir s3a://bucket/index``, jobs/build_index.py); bulk data
(postings/segments/terms/deletes parquet) already goes through Spark's
own Hadoop connectors, but the small metadata files must not fall back
to bare ``open()``/``os.*`` or the build crashes at the first marker
write on a real cluster. This module routes:

- plain local paths (``/tmp/idx``)             → ``os`` / ``shutil``
- URI paths (``s3a://…``, ``hdfs://…``, ``file:/…``) → the Hadoop
  FileSystem API of the active SparkSession (same credentials/connector
  chain as the executors' parquet IO).

Atomicity: local writes are tmp + ``os.replace``; Hadoop writes are tmp +
``rename`` (atomic on HDFS; copy-then-delete on S3, where the PUT of the
tmp object is itself atomic — a torn marker is impossible, at worst a
stale tmp file survives a crash).
"""

from __future__ import annotations

import os
import posixpath
import re
import shutil

_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:/")


def is_uri(path: str) -> bool:
    return bool(_URI_RE.match(path))


def join(path: str, *parts: str) -> str:
    """Path join that is safe for both URIs and local paths."""
    return posixpath.join(path, *parts)


def as_local(path: str) -> str:
    """Local filesystem form of ``path`` for non-Spark readers (pyarrow,
    open). Raises for remote schemes — callers fall back to Spark."""
    if not is_uri(path):
        return path
    m = re.match(r"^file:(//)?(/.*)$", path)
    if m:
        return m.group(2)
    raise ValueError(f"not a local path: {path}")


def _hadoop(path: str):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(f"no active SparkSession for remote-FS IO on {path}")
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def exists(path: str) -> bool:
    if not is_uri(path):
        return os.path.exists(path)
    _, fs, hpath = _hadoop(path)
    return bool(fs.exists(hpath))


def makedirs(path: str) -> None:
    if not is_uri(path):
        os.makedirs(path, exist_ok=True)
        return
    _, fs, hpath = _hadoop(path)
    fs.mkdirs(hpath)


def listdir(path: str) -> list[str]:
    """Child basenames of a directory ([] if it doesn't exist)."""
    if not is_uri(path):
        return os.listdir(path) if os.path.isdir(path) else []
    _, fs, hpath = _hadoop(path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def rmtree(path: str) -> None:
    if not is_uri(path):
        if os.path.exists(path):
            shutil.rmtree(path)
        return
    _, fs, hpath = _hadoop(path)
    fs.delete(hpath, True)


def rename(src: str, dst: str) -> None:
    """Move a file or directory (dst must not exist)."""
    if not is_uri(src):
        shutil.move(src, dst)
        return
    jvm, fs, hsrc = _hadoop(src)
    fs.rename(hsrc, jvm.org.apache.hadoop.fs.Path(dst))


def read_text(path: str) -> str:
    if not is_uri(path):
        with open(path) as f:
            return f.read()
    jvm, fs, hpath = _hadoop(path)
    stream = fs.open(hpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(path: str, text: str) -> None:
    if not is_uri(path):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return
    jvm, fs, hpath = _hadoop(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(hpath):
        fs.delete(hpath, False)
    fs.rename(tmp, hpath)


def mtime_token(path: str) -> int:
    """Monotone change token for a file (cache invalidation); 0 if absent."""
    if not is_uri(path):
        return os.stat(path).st_mtime_ns if os.path.exists(path) else 0
    _, fs, hpath = _hadoop(path)
    if not fs.exists(hpath):
        return 0
    return int(fs.getFileStatus(hpath).getModificationTime())
