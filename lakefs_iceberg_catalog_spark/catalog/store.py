"""Manifest storage seam — the primitives the commit protocol needs.

The manifest protocol (manifest.py) is lock-free: the arbiter of a commit
race is storage-level *put-if-absent*. The reference runs the same protocol
against an object store (LakeFSFileIO.java:26-51); this seam makes the
storage primitive pluggable so the protocol is testable against an
object-store-like implementation without changing a line of TableOperations:

- ``put_if_absent``  — exclusive create. Local: temp write + ``os.link``
  (fails-if-exists AND publishes fully-formed). Object store: conditional
  PUT (S3 ``If-None-Match: *``, GCS ``ifGenerationMatch=0``, Azure
  ``If-None-Match: *``) — atomic by nature, no temp file needed.
- ``read``           — full-object GET, None when absent (with the legacy
  ``.gz`` codec probe, LakeFSTableOperations.java:149-166).
- ``put``            — best-effort atomic overwrite (the version hint).
  Local: temp write + rename. Object store: plain PUT.
- ``exists`` / ``list_dir`` — metadata probes used by version recovery.
"""

from __future__ import annotations

import gzip
import os
import threading
import uuid as _uuid


class ManifestStore:
    """Abstract storage primitives for manifest files (see module doc)."""

    def put_if_absent(self, path: str, content: str) -> None:
        """Create ``path`` with ``content`` iff absent; raise FileExistsError
        if any writer (including this one) already created it."""
        raise NotImplementedError

    def read(self, path: str) -> str | None:
        raise NotImplementedError

    def put(self, path: str, content: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Best-effort object delete (absent is fine) — orphan-part
        cleanup and version expiry. Object store: plain DELETE."""
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        """Names (not full paths) under ``path``; [] when absent."""
        raise NotImplementedError


class LocalManifestStore(ManifestStore):
    """POSIX filesystem implementation — the default.

    put_if_absent writes the full content to a private temp file and
    publishes via ``os.link``: the hard link both fails-if-exists (the
    set-if-absent arbiter) and makes the file appear fully formed, so a
    concurrent reader can never observe a torn half-written manifest."""

    def put_if_absent(self, path: str, content: str) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".commit.{os.getpid()}.{_uuid.uuid4().hex}.tmp")
        # A ``.gz`` target is written gzip-compressed (mtime=0 keeps the
        # bytes deterministic) — the write-side analog of the read probe
        # (write.metadata.compression-codec, LakeFSTableOperations.java:
        # 149-166 probes both because either may have been written).
        data = (
            gzip.compress(content.encode(), mtime=0)
            if path.endswith(".gz")
            else content.encode()
        )
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def read(self, path: str) -> str | None:
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            pass
        try:
            with gzip.open(path + ".gz", "rt") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def put(self, path: str, content: str) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".hint.{os.getpid()}.{_uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(content)
        os.replace(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def list_dir(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []


class InMemoryManifestStore(ManifestStore):
    """Object-store semantics in memory, for protocol tests: a flat
    key→content map whose put_if_absent is a conditional PUT (one atomic
    check-and-set under a lock — the mutual exclusion S3/GCS/Azure provide
    server-side). No directories, no rename, no hard links — exactly the
    primitive set an object store offers."""

    def __init__(self) -> None:
        self._objects: dict[str, str] = {}
        self._lock = threading.Lock()

    def put_if_absent(self, path: str, content: str) -> None:
        with self._lock:
            if path in self._objects:
                raise FileExistsError(path)
            self._objects[path] = content

    def read(self, path: str) -> str | None:
        with self._lock:
            if path in self._objects:
                return self._objects[path]
            # legacy .gz probe parity: stored plain in this fake
            return self._objects.get(path + ".gz")

    def put(self, path: str, content: str) -> None:
        with self._lock:
            self._objects[path] = content

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._objects

    def delete(self, path: str) -> None:
        with self._lock:
            self._objects.pop(path, None)

    def list_dir(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        with self._lock:
            return sorted(
                {
                    k[len(prefix):].split("/", 1)[0]
                    for k in self._objects
                    if k.startswith(prefix)
                }
            )
