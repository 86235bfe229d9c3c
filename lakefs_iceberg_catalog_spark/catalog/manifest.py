"""Table metadata versioning: the manifest chain.

Re-expresses the reference's metadata model (SURVEY.md §1.1, §2.1) with JSON
manifests over any filesystem:

- table state = ``metadata/v<N>.manifest.json`` chain
  (LakeFSTableOperations.java:87-112 current/refresh walks forward from a
  hint until the next version is absent)
- ``version-hint.text`` best-effort pointer, temp-write + atomic rename
  (LakeFSTableOperations.java:210-231)
- recovery scan over ``metadata/`` when the hint is missing
  (LakeFSTableOperations.java:233-265 findVersion)
- commit = **create-if-absent, no locks** — the filesystem's exclusive-create
  is the arbiter (LakeFSTableOperations.java:30-35, 114-147). Locally that is
  ``open(path, "x")``; on an object store the same protocol runs on a
  conditional PUT (S3 If-None-Match, GCS if-generation-match=0) — the
  protocol, not the syscall, is the design.

Manifests store **repo-relative** data-file paths, which is what makes
zero-copy branching work (the reference keeps metadata paths repo-relative
for the same reason — Util.java:13-16, LakeFSFileIO.java:53-66).
"""

from __future__ import annotations

import json
import os
import re
import uuid as _uuid
from dataclasses import dataclass, field

from .errors import CommitConflictError, CommitStateError

METADATA_DIR = "metadata"
VERSION_HINT = "version-hint.text"
_VERSION_RE = re.compile(r"^v(\d+)\.manifest\.json(?:\.gz)?$")


def _read_manifest_file(path: str) -> str | None:
    """Read a manifest probing codecs: plain JSON, then gzip — the
    reference's getMetadataFile codec probe (LakeFSTableOperations.java:
    149-166, incl. the legacy .gz naming)."""
    import gzip

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


@dataclass
class TableManifest:
    table_uuid: str
    version: int
    schema_json: str            # Spark StructType.json()
    files: list[str]            # repo-relative parquet paths
    properties: dict = field(default_factory=dict)
    # per-file column min/max ranges for scan-time file skipping (Iceberg
    # manifest stats equivalent): {path: {col: [min, max]}}; numeric and
    # string columns only, absent entries mean "no stats — never skip".
    file_stats: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "table_uuid": self.table_uuid,
                "version": self.version,
                "schema_json": self.schema_json,
                "files": self.files,
                "properties": self.properties,
                "file_stats": self.file_stats,
            },
            indent=1,
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "TableManifest":
        d = json.loads(s)
        return TableManifest(
            table_uuid=d["table_uuid"],
            version=int(d["version"]),
            schema_json=d["schema_json"],
            files=list(d["files"]),
            properties=dict(d.get("properties", {})),
            file_stats=dict(d.get("file_stats", {})),
        )

    def next(
        self,
        files: list[str],
        properties: dict | None = None,
        schema_json: str | None = None,
        file_stats: dict | None = None,
    ) -> "TableManifest":
        return TableManifest(
            table_uuid=self.table_uuid,
            version=self.version + 1,
            schema_json=self.schema_json if schema_json is None else schema_json,
            files=files,
            properties=self.properties if properties is None else properties,
            file_stats=self.file_stats if file_stats is None else file_stats,
        )


def new_manifest(
    schema_json: str,
    files: list[str],
    properties: dict | None = None,
    file_stats: dict | None = None,
) -> TableManifest:
    return TableManifest(
        table_uuid=str(_uuid.uuid4()),
        version=1,
        schema_json=schema_json,
        files=files,
        properties=properties or {},
        file_stats=file_stats or {},
    )


class TableOperations:
    """Versioned metadata operations for one table directory (one branch).

    The equivalent of LakeFSTableOperations: refresh/current walk the chain,
    commit races via exclusive-create.
    """

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.meta_dir = os.path.join(table_dir, METADATA_DIR)

    # -- version resolution (LakeFSTableOperations.java:87-112, 233-265) ----

    def _version_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.manifest.json")

    def find_version(self) -> int:
        """Hint file if present, else scan metadata/ for max valid version,
        else 0 (= table has no committed metadata)."""
        hint = os.path.join(self.meta_dir, VERSION_HINT)
        try:
            with open(hint) as f:
                v = int(f.read().strip())
                if self._version_exists(v):
                    return v
        except (FileNotFoundError, ValueError):
            pass
        best = 0
        try:
            for name in os.listdir(self.meta_dir):
                m = _VERSION_RE.match(name)
                if m:
                    best = max(best, int(m.group(1)))
        except FileNotFoundError:
            return 0
        return best

    def current(self) -> TableManifest | None:
        """Newest manifest: start at the hinted/scanned version, walk forward
        until v(N+1) is absent — tolerates a stale hint the same way the
        reference does."""
        v = self.find_version()
        if v == 0:
            return None
        while self._version_exists(v + 1):
            v += 1
        content = _read_manifest_file(self._version_path(v))
        return TableManifest.from_json(content) if content is not None else None

    def _version_exists(self, version: int) -> bool:
        p = self._version_path(version)
        return os.path.exists(p) or os.path.exists(p + ".gz")

    # -- commit (LakeFSTableOperations.java:114-147) -------------------------

    def commit(self, base: TableManifest | None, manifest: TableManifest) -> TableManifest:
        """Optimistic, lock-free commit of the next version.

        Preconditions mirror the reference: the base must still be current
        (stale-base check), the table UUID must not change (checkUUID), and
        the winner of a race is decided by exclusive-create of the version
        file — the loser gets CommitConflictError and must refresh+retry.
        """
        current = self.current()
        if base is None:
            if current is not None:
                raise CommitStateError(f"table already has metadata v{current.version}")
            if manifest.version != 1:
                raise CommitStateError("first commit must be version 1")
        else:
            if current is None or current.version != base.version:
                raise CommitStateError(
                    f"stale base: base v{base.version}, current "
                    f"v{current.version if current else 0} — refresh and retry"
                )
            if current.table_uuid != manifest.table_uuid:
                raise CommitStateError("table UUID changed — refusing commit")
            if manifest.version != base.version + 1:
                raise CommitStateError("commit must advance the version by exactly 1")

        os.makedirs(self.meta_dir, exist_ok=True)
        path = self._version_path(manifest.version)
        # Write the full manifest to a private temp file, then PUBLISH it
        # atomically with a hard link — link() both fails-if-exists (the
        # set-if-absent arbiter) and makes the file appear fully formed, so
        # a concurrent reader can never observe a torn half-written
        # manifest. (Object-store equivalent: conditional PUT, which is
        # atomic by nature.)
        tmp = os.path.join(
            self.meta_dir, f".commit.{os.getpid()}.{_uuid.uuid4().hex}.tmp"
        )
        with open(tmp, "w") as f:
            f.write(manifest.to_json())
        try:
            os.link(tmp, path)
        except FileExistsError as e:
            raise CommitConflictError(
                f"lost commit race for v{manifest.version} at {path}"
            ) from e
        finally:
            os.unlink(tmp)
        self._write_version_hint(manifest.version)
        return manifest

    def _write_version_hint(self, version: int) -> None:
        """Best-effort pointer update: temp write + atomic rename; failures
        are swallowed (the chain walk recovers without it)."""
        try:
            tmp = os.path.join(self.meta_dir, f".hint.{os.getpid()}.{_uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as f:
                f.write(str(version))
            os.replace(tmp, os.path.join(self.meta_dir, VERSION_HINT))
        except OSError:
            pass

    def is_table_dir(self) -> bool:
        """A directory is a table iff metadata/ holds manifest files
        (LakeFSCatalog.java:88-104 isTableDir)."""
        try:
            return any(_VERSION_RE.match(n) for n in os.listdir(self.meta_dir))
        except FileNotFoundError:
            return False
