"""FileIO: the lakehouse's storage abstraction (reference S8).

The reference deployment stores tables on an S3-compatible object
store via Hadoop's S3A connector (reference spark/conf/
spark-defaults.conf:15-20); locally everything is plain files. All
metadata/maintenance file handling in the lakehouse layer goes
through this interface — mirroring Iceberg's own `FileIO` seam — so
the transaction log, writers, and maintenance procedures are
path-scheme-agnostic:

- `LocalFileIO`: direct `os` calls; the default and what every test
  exercises.
- `HadoopFileIO`: routes through the JVM Hadoop `FileSystem` API that
  Spark already carries (`spark._jvm`), so the SAME code paths work on
  `hdfs://`, `s3a://`, or `file:` URIs. Instantiable and tested
  locally because Hadoop's `LocalFileSystem` serves `file:` paths.

Durability note (same caveat Iceberg documents): exclusive-create as
a commit arbiter is atomic on a real filesystem (POSIX, HDFS). On
S3A, create-no-overwrite is check-then-put, so multi-writer commits
against raw S3 need an external lock/catalog service — exactly why
Iceberg pairs S3 with a metastore/REST catalog. The abstraction keeps
that single arbitration point in one overridable method.

Bulk DATA reads/writes do not pass through here: Spark's own readers
and writers (`spark.read.parquet`, `df.write.parquet`) are already
scheme-aware via the same Hadoop connectors.
"""

from __future__ import annotations

import abc
import os
import shutil
from collections.abc import Iterator

import pyarrow.parquet as pq


class FileIO(abc.ABC):
    """Minimal file operations the lakehouse metadata layer needs."""

    # --- directories -------------------------------------------------
    @abc.abstractmethod
    def makedirs(self, path: str) -> None: ...

    @abc.abstractmethod
    def listdir(self, path: str) -> list[str]:
        """Names (not paths) of entries directly under `path`;
        empty list if the directory doesn't exist."""

    @abc.abstractmethod
    def walk_files(self, path: str) -> Iterator[str]:
        """Every file path (recursively) under `path`."""

    @abc.abstractmethod
    def remove_empty_dirs(self, path: str) -> None:
        """Prune now-empty directories under `path` (never `path`)."""

    @abc.abstractmethod
    def rmtree(self, path: str) -> None: ...

    # --- files -------------------------------------------------------
    @abc.abstractmethod
    def exists(self, path: str) -> bool: ...

    @abc.abstractmethod
    def is_dir(self, path: str) -> bool: ...

    @abc.abstractmethod
    def size(self, path: str) -> int: ...

    @abc.abstractmethod
    def mtime(self, path: str) -> float: ...

    @abc.abstractmethod
    def remove(self, path: str) -> None: ...

    @abc.abstractmethod
    def read_text(self, path: str) -> str: ...

    @abc.abstractmethod
    def write_text_atomic(self, path: str, data: str) -> None:
        """Write so readers never observe a partial file."""

    @abc.abstractmethod
    def create_exclusive(self, path: str, data: str) -> bool:
        """Write `data` to `path` iff it does not exist. Returns False
        (without writing) when it already does — the commit-race
        arbiter; see module docstring for scheme-level atomicity."""

    # --- parquet footers ---------------------------------------------
    @abc.abstractmethod
    def parquet_row_count(self, path: str) -> int:
        """Exact row count from the parquet footer (no Spark job)."""


class LocalFileIO(FileIO):
    """Plain-`os` implementation — the local default."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def walk_files(self, path: str) -> Iterator[str]:
        for root, _dirs, names in os.walk(path):
            for name in names:
                yield os.path.join(root, name)

    def remove_empty_dirs(self, path: str) -> None:
        for root, dirs, names in list(os.walk(path, topdown=False)):
            if root != path and not dirs and not names:
                try:
                    os.rmdir(root)
                except OSError:
                    pass

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def remove(self, path: str) -> None:
        os.remove(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, data: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def create_exclusive(self, path: str, data: str) -> bool:
        try:
            with open(path, "x") as f:
                f.write(data)
            return True
        except FileExistsError:
            return False

    def parquet_row_count(self, path: str) -> int:
        return pq.ParquetFile(path).metadata.num_rows


class HadoopFileIO(FileIO):
    """Hadoop `FileSystem`-backed implementation via Spark's JVM.

    Works for any URI scheme the cluster's Hadoop connectors resolve
    (`hdfs://`, `s3a://`, `file:`). Parquet footers are read through a
    seekable Hadoop input stream wrapped for pyarrow, so row counts
    never require pulling a whole data file to the driver.
    """

    def __init__(self, spark) -> None:
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        fs = self._path(p).getFileSystem(self._conf)
        try:
            # no .crc sidecars next to metadata files (ChecksumFileSystem
            # wrapping, e.g. Hadoop's LocalFileSystem); object-store and
            # HDFS impls ignore this
            fs.setWriteChecksum(False)
            fs.setVerifyChecksum(False)
        except Exception:
            pass
        return fs

    def makedirs(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def listdir(self, path: str) -> list[str]:
        fs, jp = self._fs(path), self._path(path)
        if not fs.exists(jp):
            return []
        return sorted(st.getPath().getName() for st in fs.listStatus(jp))

    def walk_files(self, path: str) -> Iterator[str]:
        fs, jp = self._fs(path), self._path(path)
        if not fs.exists(jp):
            return
        it = fs.listFiles(jp, True)  # recursive
        while it.hasNext():
            yield it.next().getPath().toString()

    def remove_empty_dirs(self, path: str) -> None:
        fs, jp = self._fs(path), self._path(path)
        if not fs.exists(jp):
            return

        def prune(p) -> bool:  # True => removed
            statuses = fs.listStatus(p)
            empty = True
            for st in statuses:
                if st.isDirectory():
                    if not prune(st.getPath()):
                        empty = False
                else:
                    empty = False
            if empty and p.toString() != jp.toString():
                fs.delete(p, False)
                return True
            return False

        prune(jp)

    def rmtree(self, path: str) -> None:
        self._fs(path).delete(self._path(path), True)

    def exists(self, path: str) -> bool:
        return self._fs(path).exists(self._path(path))

    def is_dir(self, path: str) -> bool:
        fs, jp = self._fs(path), self._path(path)
        return fs.exists(jp) and fs.getFileStatus(jp).isDirectory()

    def size(self, path: str) -> int:
        return self._fs(path).getFileStatus(self._path(path)).getLen()

    def mtime(self, path: str) -> float:
        # Hadoop reports millis
        return self._fs(path).getFileStatus(self._path(path)).getModificationTime() / 1000.0

    def remove(self, path: str) -> None:
        self._fs(path).delete(self._path(path), False)

    def _read_range(self, path: str, offset: int) -> bytes:
        """Bytes from `offset` to EOF. py4j copies byte arrays by value,
        so reads must RETURN a java byte[] (IOUtils.toByteArray) rather
        than fill a Python-side buffer."""
        fs, jp = self._fs(path), self._path(path)
        stream = fs.open(jp)
        try:
            if offset:
                stream.seek(offset)
            return bytes(self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()

    def read_text(self, path: str) -> str:
        return self._read_range(path, 0).decode("utf-8")

    def write_text_atomic(self, path: str, data: str) -> None:
        # write to a sibling temp object, then rename (atomic on HDFS /
        # real filesystems; an overwrite-PUT on object stores, which is
        # itself atomic per-object there)
        fs = self._fs(path)
        tmp = self._path(path + ".tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()
        dst = self._path(path)
        if fs.exists(dst):
            fs.delete(dst, False)
        fs.rename(tmp, dst)

    def create_exclusive(self, path: str, data: str) -> bool:
        fs, jp = self._fs(path), self._path(path)
        try:
            out = fs.create(jp, False)  # no overwrite
        except Exception:  # FileAlreadyExistsException from the JVM
            return False
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()
        return True

    def parquet_row_count(self, path: str) -> int:
        import io

        n = self.size(path)
        # parquet footer: last 8 bytes = metadata length + magic; read
        # only the file tail, never the data pages
        tail = self._read_range(path, max(0, n - (1 << 20)))
        meta_len = int.from_bytes(tail[-8:-4], "little")
        if meta_len + 8 > len(tail):  # enormous footer: fetch exactly it
            tail = self._read_range(path, n - meta_len - 8)
        footer = tail[-(meta_len + 8) : -8]
        # a footer-only "file" (magic + footer + length + magic) parses
        # fine for metadata purposes
        shim = b"PAR1" + footer + meta_len.to_bytes(4, "little") + b"PAR1"
        return pq.ParquetFile(io.BytesIO(shim)).metadata.num_rows
