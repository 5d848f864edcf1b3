"""Driver-side filesystem metadata ops via the Hadoop FileSystem API.

The engine's stores do a handful of driver-side metadata operations
(existence probes before dedup gates, tmp-dir cleanup after snapshot
swaps). `os.path` only understands the local filesystem; on `s3a://` or
`gs://` paths it silently answers False and the logic that depends on it
(e.g. the anti-join dedup gate in OfflineStore.append) degrades without
an error. Going through Hadoop's FileSystem — the same abstraction the
executors' parquet I/O uses — makes these probes correct on every scheme
Spark itself can read.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def child_names(spark: SparkSession, path: str) -> list[str]:
    """Names of direct children of ``path`` (empty if it doesn't exist)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def delete(spark: SparkSession, path: str) -> None:
    """Recursive delete; no-op if absent."""
    fs, jpath = _fs_and_path(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Directory rename. Atomic on HDFS/POSIX; on object stores it is a
    copy+delete — callers must treat the swap window as non-atomic."""
    fs, jsrc = _fs_and_path(spark, src)
    jdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    return bool(fs.rename(jsrc, jdst))


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite a small text file (manifests, markers) through
    the same FileSystem abstraction as the data I/O — works on every
    scheme the store accepts, unlike driver-local ``open()``."""
    fs, jpath = _fs_and_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file via tmp + rename so a reader (or a crash)
    never observes a torn/truncated file — the round-9 ADVICE fix for
    manifest/floor writes, where a half-written JSON made every
    subsequent ``retention_floor()``/``read(as_of)`` raise
    ``JSONDecodeError``. Rename is atomic on HDFS/POSIX; on object
    stores it is copy+delete, so the failure window is a briefly
    MISSING destination (callers fall back to their read-with-default),
    never a torn one. Overwrites delete-then-rename; concurrent writers
    of the SAME path are a single-writer contract (see
    SnapshotManifests)."""
    import uuid

    fs, jpath = _fs_and_path(spark, path)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    write_text(spark, tmp, text)
    jtmp = spark._jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(jpath):
        fs.delete(jpath, False)
    if not fs.rename(jtmp, jpath):
        raise IOError(f"write_text_atomic: rename {tmp} -> {path} failed")


def read_text(spark: SparkSession, path: str) -> str:
    fs, jpath = _fs_and_path(spark, path)
    stream = fs.open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """Recursive (path, size) listing of data files under ``path``,
    skipping hidden/commit markers (_SUCCESS, ._*). Driver-side metadata
    only — one RPC stream, no data read; cardinality is file count, not
    row count."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append((st.getPath().toString(), int(st.getLen())))
    return out


def list_file_stats(spark: SparkSession, path: str) -> list[tuple[str, int, int]]:
    """Recursive (path, size, mtime_ms) listing of data files — the
    fingerprint input for session fit caches (plans/_base.py
    corpus_fingerprint). Same traversal as :func:`list_data_files`,
    plus modification time so a same-size rewrite still changes the
    fingerprint."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    out: list[tuple[str, int, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append(
            (st.getPath().toString(), int(st.getLen()), int(st.getModificationTime()))
        )
    return out
