"""Filesystem utility wrapper — the reference's S3FSWrapper surface
(core s3io_wrapper.py:1-108, a deprecated shim onto the hydra
implementation, hydra s3io_wrapper.py:28-400) re-expressed over the
Hadoop FileSystem API.

The reference hand-rolls two backends (boto3 S3 + local) and dispatches
on the path prefix; on Spark the Hadoop FS layer IS that dispatch —
``Path.getFileSystem(conf)`` resolves ``s3a://``, ``gs://``, ``abfs://``,
``hdfs://`` and ``file:`` through one API, with the cluster's
credentials/endpoint configuration. Everything here is driver-side
control-plane I/O (existence probes, tiny marker/text files, listings)
— the data plane stays in spark.read/write.

Deltas from the reference, documented:
  * ``is_directory`` asks the filesystem (S3 has no real directories, so
    the reference fakes them with a RESERVED_HIDDEN_FILE marker and
    ``create_dir`` writes one); Hadoop FS exposes honest directory
    status on every scheme, so the marker protocol is unnecessary and
    ``create_dir``/``makedirs`` are both real ``mkdirs``.
  * ``*_with_wait`` keep the reference's poll-until-attempts-exhausted
    behavior (hydra s3io_wrapper.py:41-52) — eventual-consistency
    guards for object stores.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

DEFAULT_WAIT_SEC = 3
DEFAULT_ATTEMPTS = 3


class FSWrapper:
    """Scheme-agnostic filesystem utilities (reference S3FSWrapper)."""

    def __init__(self, spark: SparkSession | None = None):
        self._spark = spark or SparkSession.getActiveSession()
        if self._spark is None:
            raise RuntimeError("FSWrapper needs an active SparkSession")
        self._jvm = self._spark._jvm
        self._conf = self._spark._jsc.hadoopConfiguration()

    # ------------------------------------------------------------ plumbing
    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        return self._path(path).getFileSystem(self._conf)

    @staticmethod
    def _normalize(path: str) -> str:
        return path[:-1] if path.endswith("/") else path

    def _wait_loop(self, probe, wait_sec, attempts, want=True):
        while True:
            if probe() is want:
                return True
            if attempts <= 0:
                return False
            time.sleep(wait_sec)
            attempts -= 1

    # ------------------------------------------------------------ existence
    def file_exists(self, path: str) -> bool:
        p = self._path(path)
        fs = self._fs(path)
        return bool(fs.exists(p)) and not fs.getFileStatus(p).isDirectory()

    def dir_exists(self, path: str) -> bool:
        p = self._path(path)
        fs = self._fs(path)
        return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())

    def file_not_exists(self, path: str) -> bool:
        return not self.file_exists(path)

    def file_exists_with_wait(self, path: str, wait_sec: int = DEFAULT_WAIT_SEC,
                              attempts: int = DEFAULT_ATTEMPTS) -> bool:
        return self._wait_loop(lambda: self.file_exists(path), wait_sec, attempts)

    def dir_exists_with_wait(self, path: str, wait_sec: int = DEFAULT_WAIT_SEC,
                             attempts: int = DEFAULT_ATTEMPTS) -> bool:
        return self._wait_loop(lambda: self.dir_exists(path), wait_sec, attempts)

    def file_not_exists_with_wait(self, path: str,
                                  wait_sec: int = DEFAULT_WAIT_SEC,
                                  attempts: int = DEFAULT_ATTEMPTS) -> bool:
        return self._wait_loop(lambda: self.file_exists(path), wait_sec,
                               attempts, want=False)

    def dir_not_exists_with_wait(self, path: str,
                                 wait_sec: int = DEFAULT_WAIT_SEC,
                                 attempts: int = DEFAULT_ATTEMPTS) -> bool:
        return self._wait_loop(lambda: self.dir_exists(path), wait_sec,
                               attempts, want=False)

    def is_file(self, path: str) -> bool:
        return self.file_exists(path)

    def is_directory(self, path: str) -> bool:
        return self.dir_exists(path)

    # ------------------------------------------------------------ listings
    def get_directory_listing(self, path: str, filter_func=None,
                              ignore_if_missing: bool = False) -> list[str]:
        """Full child paths as complete URIs, sorted (reference returns full
        keys). The scheme and authority are kept (``s3a://bucket/dir/child``,
        not ``/dir/child``) so every returned path round-trips into any
        FSWrapper method on any filesystem, not just the default FS.
        ``filter_func`` accordingly receives the full URI — match on
        suffixes/basenames, not on a bare-path prefix."""
        if not self.dir_exists(path):
            if ignore_if_missing:
                return []
            raise FileNotFoundError(path)
        fs = self._fs(path)
        statuses = fs.listStatus(self._path(path))
        out = sorted(str(st.getPath().toString()) for st in statuses)
        if filter_func:
            out = [x for x in out if filter_func(x)]
        return out

    def ls(self, path: str, filter_func=None,
           wait_sec: int = DEFAULT_WAIT_SEC,
           attempts: int = DEFAULT_ATTEMPTS) -> list[str]:
        """Child names relative to path (reference __simplify_dir_list__);
        waits for the directory to appear first (object-store sync).
        Names are the URI basename of each direct child, so the result is
        scheme-independent."""
        path = self._normalize(path)
        self.dir_exists_with_wait(path, wait_sec=wait_sec, attempts=attempts)
        full = self.get_directory_listing(path, ignore_if_missing=False)
        names = [f.rstrip("/").rsplit("/", 1)[-1] for f in full]
        if filter_func:
            names = [n for n in names if filter_func(n)]
        return names

    def list_dirs(self, path: str, filter_func=None) -> list[str]:
        path = self._normalize(path)
        return [n for n in self.ls(path, filter_func=filter_func)
                if self.is_directory(f"{path}/{n}")]

    def list_files(self, path: str, filter_func=None) -> list[str]:
        path = self._normalize(path)
        return [n for n in self.ls(path, filter_func=filter_func)
                if self.is_file(f"{path}/{n}")]

    def list_leaf_dir(self, path: str, filter_func=None) -> list[str]:
        """Names in a leaf directory (all files)."""
        return self.list_files(path, filter_func=filter_func)

    # ------------------------------------------------------------ r/w text
    def read_text_file(self, path: str) -> str:
        fs = self._fs(path)
        stream = fs.open(self._path(path))
        try:
            return str(self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"))
        finally:
            stream.close()

    def read_file_contents_as_text(self, path: str) -> str:
        """Deprecated reference alias of read_text_file."""
        return self.read_text_file(path)

    def read_file_contents_as_text_with_wait(
            self, path: str, wait_sec: int = DEFAULT_WAIT_SEC,
            attempts: int = DEFAULT_ATTEMPTS) -> str:
        if not self.file_exists_with_wait(path, wait_sec=wait_sec,
                                          attempts=attempts):
            raise FileNotFoundError(path)
        return self.read_text_file(path)

    def write_text_file(self, path: str, text: str) -> None:
        fs = self._fs(path)
        out = fs.create(self._path(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    # ------------------------------------------------------------ mutation
    def create_dir(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def makedirs(self, path: str, levels: int = 1) -> None:
        """Hadoop mkdirs is recursive; `levels` kept for API parity."""
        self.create_dir(path)

    def delete_file(self, path: str, ignore_if_missing: bool = False) -> bool:
        if not self.file_exists(path):
            if ignore_if_missing:
                return False
            raise FileNotFoundError(path)
        return bool(self._fs(path).delete(self._path(path), False))

    def delete_file_with_wait(self, path: str, ignore_if_missing: bool = True,
                              wait_sec: int = DEFAULT_WAIT_SEC,
                              attempts: int = DEFAULT_ATTEMPTS) -> bool:
        self.delete_file(path, ignore_if_missing=ignore_if_missing)
        return self.file_not_exists_with_wait(path, wait_sec=wait_sec,
                                              attempts=attempts)

    def delete_dir_with_wait(self, path: str, ignore_if_missing: bool = True,
                             wait_sec: int = DEFAULT_WAIT_SEC,
                             attempts: int = DEFAULT_ATTEMPTS) -> bool:
        if not self.dir_exists(path):
            if ignore_if_missing:
                return True
            raise FileNotFoundError(path)
        self._fs(path).delete(self._path(path), True)
        return self.dir_not_exists_with_wait(path, wait_sec=wait_sec,
                                             attempts=attempts)

    def copy_leaf_dir(self, src: str, dst: str) -> int:
        """Copy every file directly under src into dst (non-recursive,
        the reference's leaf-dir copy). Returns files copied."""
        self.create_dir(dst)
        FileUtil = self._jvm.org.apache.hadoop.fs.FileUtil
        n = 0
        src = self._normalize(src)
        dst = self._normalize(dst)
        for name in self.list_files(src):
            FileUtil.copy(self._fs(src), self._path(f"{src}/{name}"),
                          self._fs(dst), self._path(f"{dst}/{name}"),
                          False, self._conf)
            n += 1
        return n

    # ------------------------------------------------------------ metadata
    def get_parent_directory(self, path: str) -> str:
        path = self._normalize(path)
        return path[:path.rindex("/")]

    def get_last_modified_timestamp(self, path: str) -> int:
        """Epoch seconds of last modification."""
        st = self._fs(path).getFileStatus(self._path(path))
        return int(st.getModificationTime() // 1000)

    def read_text_file_with_wait(self, path: str,
                                 wait_sec: int = DEFAULT_WAIT_SEC,
                                 attempts: int = DEFAULT_ATTEMPTS) -> str:
        """(hydra s3io_wrapper read_text_file_with_wait)"""
        return self.read_file_contents_as_text_with_wait(
            path, wait_sec=wait_sec, attempts=attempts)
