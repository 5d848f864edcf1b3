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
    ``JSONDecodeError``.

    Overwrites rename OVER the existing destination through
    ``FileContext`` with ``Options.Rename.OVERWRITE`` (POSIX/HDFS
    semantics: the destination atomically flips old→new, a concurrent
    reader never observes it MISSING — the round-10 ADVICE fix for the
    delete-then-rename window, where a ``retention_floor()`` read
    racing a floor rewrite transiently defaulted to 0 and could admit
    an as-of pin below the real floor). Where ``FileContext`` is
    unsupported (some object-store connectors expose only the
    ``FileSystem`` API) the fallback is delete-then-rename — on those
    stores rename is copy+delete anyway, so no atomicity is lost that
    the store could have provided; the failure window is a briefly
    missing destination, never a torn one (callers read-with-default,
    and SnapshotManifests.retention_floor retries when it can see a
    rewrite in flight). Concurrent writers of the SAME path remain a
    single-writer contract (see SnapshotManifests)."""
    import uuid

    fs, jpath = _fs_and_path(spark, path)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    write_text(spark, tmp, text)
    jvm = spark._jvm
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            jpath.toUri(), spark._jsc.hadoopConfiguration()
        )
        arr = spark.sparkContext._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        arr[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(jtmp, jpath, arr)  # void: throws on failure
        return
    except Exception:
        # UnsupportedFileSystemException (no AbstractFileSystem for the
        # scheme) or any FileContext failure: fall through to the
        # FileSystem-API path rather than leave the tmp stranded.
        if not fs.exists(jtmp):
            # rename is all-or-nothing: tmp gone + dst present means the
            # rename took effect before the exception surfaced
            if fs.exists(jpath):
                return
            raise
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
