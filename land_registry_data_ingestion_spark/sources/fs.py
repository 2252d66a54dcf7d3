"""Object-store operations (SURVEY S5-S8, S15) via the Hadoop FileSystem API.

The reference moves staged files between MinIO buckets with boto-style
calls (put/get/copy/delete — ``land_registry_pp_complete_archiver.py:204-216``,
``...garbage_collector.py:199-220``). The engine uses Hadoop's FileSystem
abstraction instead: the same code path works on ``file://`` (tests),
``hdfs://`` and ``s3a://`` (production), and inherits S3A's committers,
retry and multipart handling.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class FS:
    """Thin wrapper over org.apache.hadoop.fs.FileSystem for one path root."""

    def __init__(self, spark: SparkSession, any_path: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._path_cls = jvm.org.apache.hadoop.fs.Path
        self._fs = self._path_cls(any_path).getFileSystem(self._conf)

    def _p(self, path: str):
        return self._path_cls(path)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def delete(self, path: str, recursive: bool = True) -> bool:
        """S8: garbage-collect an object/directory."""
        return self._fs.delete(self._p(path), recursive)

    def copy(self, src: str, dst: str) -> None:
        """S7 (first half): server-side copy within/between stores."""
        util = self._jvm.org.apache.hadoop.fs.FileUtil
        ok = util.copy(
            self._fs, self._p(src), self._fs, self._p(dst), False, self._conf
        )
        if not ok:
            raise IOError(f"copy failed: {src} -> {dst}")

    def move(self, src: str, dst: str) -> None:
        """S7: archive move = copy + delete source (rename when same store)."""
        if not self._fs.rename(self._p(src), self._p(dst)):
            self.copy(src, dst)
            self.delete(src)

    def put_once(self, path: str, data: bytes) -> None:
        """S5: upload with the reference's error-if-exists guard
        (``pp_complete_downloader.py:505-545`` pre-checks key existence)."""
        if self.exists(path):
            raise FileExistsError(path)
        out = self._fs.create(self._p(path), False)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def get(self, path: str) -> bytes:
        """S6: fetch object bytes."""
        stream = self._fs.open(self._p(path))
        try:
            ioutils = self._jvm.org.apache.commons.io.IOUtils
            return bytes(ioutils.toByteArray(stream))
        finally:
            stream.close()

    def listdir(self, path: str) -> list[str]:
        """S15: sorted recursive listing."""
        out = []
        it = self._fs.listFiles(self._p(path), True)
        while it.hasNext():
            out.append(it.next().getPath().toString())
        return sorted(out)
