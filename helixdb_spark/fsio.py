"""Local/Hadoop filesystem shim for engine metadata and directory GC.

Bulk data I/O already goes through Spark's readers/writers (URI-portable by
construction). What remains engine-side is metadata (the JSON state file —
the commit pointer) and directory surgery (garbage-collecting superseded
cold generations and retired partitions). Local paths take a plain
``os``/``shutil`` fast path; any ``scheme://`` URI goes through the JVM
Hadoop ``FileSystem`` API via py4j — the same public interface Spark's own
committers use — so HDFS / S3A / ABFS work with no extra Python deps.

Commit-atomicity contract (reference: the fdatasync'd LEVEL_INFO superblock,
src/types/level_info.rs:98-111): the engine's single commit point is the
atomic replacement of the JSON state file. Locally that is ``os.replace``;
on HDFS a rename onto the target (atomic per the HDFS spec); on S3-like
stores the tmp+rename degrades to copy+delete, but the state object is a
single small PUT whose final copy is itself atomic — readers see either the
old or the new pointer, never a torn one.
"""

from __future__ import annotations

import os
import shutil
import uuid


class EngineFS:
    """Filesystem operations rooted at one engine base path."""

    def __init__(self, spark, base_path: str) -> None:
        self.remote = "://" in base_path
        if self.remote:
            jvm = spark._jvm
            self._jvm = jvm
            self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(
                jvm.java.net.URI.create(base_path),
                spark._jsc.hadoopConfiguration(),
            )

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def exists(self, p: str) -> bool:
        if not self.remote:
            return os.path.exists(p)
        return self._fs.exists(self._path(p))

    def listdir(self, p: str) -> list[str]:
        """Child names of a directory ([] if it does not exist)."""
        if not self.remote:
            if not os.path.isdir(p):
                return []
            return os.listdir(p)
        if not self._fs.exists(self._path(p)):
            return []
        return [s.getPath().getName() for s in self._fs.listStatus(self._path(p))]

    def list_buckets(self, p: str) -> list[int]:
        """time_bucket partition values present under a directory."""
        return sorted(
            int(n.split("=", 1)[1])
            for n in self.listdir(p)
            if n.startswith("time_bucket=")
        )

    def delete(self, p: str) -> None:
        """Recursive delete, missing-ok."""
        if not self.remote:
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.exists(p):
                try:
                    os.remove(p)
                except OSError:
                    pass
            return
        self._fs.delete(self._path(p), True)

    def move(self, src: str, dst: str) -> bool:
        """Move a directory (parents created), False if ``src`` is missing.

        Used only for GC-deferral (trashing dropped partitions so a
        rollback can restore them) — never on the read path, so the
        object-store copy+delete degradation is a background cost.
        """
        if not self.remote:
            if not os.path.exists(src):
                return False
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(dst):
                shutil.rmtree(dst, ignore_errors=True)
            shutil.move(src, dst)
            return True
        sp, dp = self._path(src), self._path(dst)
        if not self._fs.exists(sp):
            return False
        self._fs.mkdirs(dp.getParent())
        if self._fs.exists(dp):
            self._fs.delete(dp, True)
        return bool(self._fs.rename(sp, dp))

    def read_text(self, p: str) -> str | None:
        if not self.remote:
            if not os.path.exists(p):
                return None
            with open(p) as f:
                return f.read()
        if not self._fs.exists(self._path(p)):
            return None
        stream = self._fs.open(self._path(p))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def write_text_atomic(self, p: str, text: str) -> None:
        """Write-new-then-rename: the single atomic commit point (see module
        docstring for the per-store guarantees)."""
        if not self.remote:
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = f"{p}.tmp"
            with open(tmp, "w") as f:
                f.write(text)
            os.replace(tmp, p)
            return
        parent = p.rsplit("/", 1)[0]
        self._fs.mkdirs(self._path(parent))
        tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
        out = self._fs.create(self._path(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        # HDFS rename won't clobber; delete-then-rename is fine because the
        # tmp file is complete — a crash here leaves the old pointer intact
        # (rename not yet issued) or the new one (rename done).
        self._fs.delete(self._path(p), False)
        self._fs.rename(self._path(tmp), self._path(p))
