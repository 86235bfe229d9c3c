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
import time as _time
import uuid as _uuid
from dataclasses import dataclass, field

from .errors import CommitConflictError, CommitStateError
from .store import LocalManifestStore, ManifestStore

METADATA_DIR = "metadata"
VERSION_HINT = "version-hint.text"
# Table property selecting the metadata codec, spelled as the reference
# spells it (write.metadata.compression-codec, LakeFSTableOperations.java:
# 149-166): "gzip" makes commits publish v<N>.manifest.json.gz; anything
# else (or absence) writes plain JSON. Reads always probe both.
METADATA_COMPRESSION_PROP = "write.metadata.compression-codec"
# Table property enabling SHARDED manifests (SCALE.md "Manifest metadata at
# scale"): commits write one small LIST object (v<N>.manifest.json holding
# the table-level state + a shard index) plus per-partition PART objects
# carrying the per-file maps — the Iceberg manifest-list design. The list
# stays the single put-if-absent commit arbiter; parts are written first
# under commit-unique names, so losers leave only unreferenced orphans
# (cleaned by expire). Partition-pruned scans load only surviving shards.
METADATA_SHARD_PROP = "write.metadata.shard-partitions"
# The per-file maps a shard part carries (everything O(files) in the
# manifest; table-level fields stay in the list object).
_PER_FILE_MAPS = (
    "file_stats",
    "file_columns",
    "file_types",
    "file_partitions",
    "delete_preds",
    "position_deletes",
    "equality_deletes",
    "file_struct_columns",
)
_VERSION_RE = re.compile(r"^v(\d+)\.manifest\.json(?:\.gz)?$")

_LOCAL_STORE = LocalManifestStore()


def _read_manifest_file(path: str) -> str | None:
    """Read a manifest probing codecs: plain JSON, then gzip — the
    reference's getMetadataFile codec probe (LakeFSTableOperations.java:
    149-166, incl. the legacy .gz naming)."""
    return _LOCAL_STORE.read(path)


def _columns_from_schema(schema_json: str) -> list[dict]:
    """Initial field-id assignment: position-ordered ids, Iceberg-style
    (every field gets a stable id at table create; ids never get reused).
    Struct columns additionally carry a ``fields`` list assigning ids to
    every MEMBER (Iceberg tracks ids at every nesting level, so add/rename/
    widen inside a struct is metadata-only too). One nesting level — the
    id space of members is per-struct and never reused within it."""
    fields = json.loads(schema_json).get("fields", [])
    cols = []
    for i, f in enumerate(fields):
        entry = {"id": i, "name": f["name"]}
        t = f.get("type")
        if isinstance(t, dict) and t.get("type") == "struct":
            entry["fields"] = [
                {"id": j, "name": mf["name"]}
                for j, mf in enumerate(t.get("fields", []))
            ]
        cols.append(entry)
    return cols


def struct_mapping_of(columns: list[dict]) -> dict[str, dict[str, str]]:
    """{top id: {member id: member name}} for the struct columns of a
    ``columns`` list — the nested analog of the flat {id: name} mapping."""
    return {
        str(c["id"]): {str(m["id"]): m["name"] for m in c["fields"]}
        for c in columns
        if c.get("fields")
    }


def _types_by_id(schema_json: str, columns: list[dict]) -> dict[str, object]:
    """{field id: Spark type jsonValue} for the given schema — the written
    physical type stamped onto new files so later column widening can read
    them back with the type they actually hold."""
    fields = {f["name"]: f["type"] for f in json.loads(schema_json).get("fields", [])}
    return {str(c["id"]): fields[c["name"]] for c in columns if c["name"] in fields}


@dataclass
class TableManifest:
    table_uuid: str
    version: int
    schema_json: str            # Spark StructType.json()
    files: list[str]            # repo-relative parquet paths
    properties: dict = field(default_factory=dict)
    # wall-clock commit time (epoch seconds), stamped by TableOperations
    # .commit at publish — the Iceberg snapshot-timestamp analog backing
    # `TIMESTAMP AS OF` time travel. 0.0 on legacy manifests (always
    # eligible for any as-of bound).
    committed_at: float = 0.0
    # per-file column min/max ranges for scan-time file skipping (Iceberg
    # manifest stats equivalent): {path: {col: [min, max]}}; numeric and
    # string columns only, absent entries mean "no stats — never skip".
    file_stats: dict = field(default_factory=dict)
    # Schema-evolution bookkeeping (Iceberg's field-id model): `columns` is
    # the CURRENT schema as ordered {id, name} pairs — ids are stable across
    # rename and never reused after drop; `file_columns` records, per data
    # file, the {id: name} mapping the file was WRITTEN with, so a scan can
    # read old files by their old column names and project them to the
    # current schema (read-time projection, no data rewrite).
    columns: list = field(default_factory=list)
    file_columns: dict = field(default_factory=dict)
    # Column type widening (Iceberg's safe type promotion: int→long,
    # float→double, decimal precision growth): per data file, the {id: type
    # jsonValue} mapping the file was WRITTEN with. Scans read each file
    # with its written physical type and cast to the current schema type —
    # metadata-only evolution, no data rewrite. Files absent here were
    # written with the then-current schema types (the common no-widening
    # case stays an empty map).
    file_types: dict = field(default_factory=dict)
    # Identity partition spec (Iceberg's PartitionSpec, exercised as
    # unpartitioned by the reference at TestLakeFSTableOperations.java:59-61):
    # ordered partition column names, fixed at table create. Data files of a
    # partitioned table live under hive-style dirs (data/col=value/...) and
    # each file belongs to EXACTLY one partition; `file_partitions` records
    # the {col: value} tuple per file. The partition column is NOT stored in
    # the file's pages — scans inject it as a per-file constant (Iceberg
    # reads identity partition values from metadata the same way), and
    # planning treats the value as a [v, v] stat for pruning.
    partition_spec: list = field(default_factory=list)
    file_partitions: dict = field(default_factory=dict)
    # Bucket transform (Iceberg's bucket[N] partition transform): {"col":
    # name, "n": buckets}. Rows are hash-routed into N bucket dirs
    # (data/_bucket=i/...) by a cross-engine-replayable digest of the key;
    # unlike identity partitions the key column STAYS in the data pages
    # (a bucket number is not invertible), so scans read it normally and
    # equality point-lookups prune to the one covering bucket's files.
    bucket_spec: dict = field(default_factory=dict)
    # Merge-on-read deletes (Iceberg format-version 2 delete files,
    # TestLakeFSCatalogSpark.java:67 'format-version'=2): per-file list of
    # delete predicates, applied at scan time AFTER projection. A one-row
    # delete is then a metadata-only commit; compact() folds predicates into
    # rewritten files. Files appended after a delete carry no entry and are
    # unaffected (the sequence-number scoping equality deletes need).
    delete_preds: dict = field(default_factory=dict)
    # Position deletes (Iceberg format-version 2 POSITION delete files —
    # the other half of the v2 row-level contract next to the predicate/
    # equality deletes above): {data_file: [delete_file, ...]} where each
    # delete file is a parquet of (_file, _pos) rows naming exact rows by
    # their ordinal within the data file. A delete of N scattered rows is
    # one small parquet write + a manifest swap; scans anti-join on
    # (file, position) — never re-evaluate a predicate — so the cost is
    # proportional to the DELETED rows, not the table. compact()/CoW
    # rewrites fold them in and drop the entries (next() keeps entries
    # only for retained files, same lifecycle as delete_preds).
    position_deletes: dict = field(default_factory=dict)
    # Equality deletes (Iceberg format-version 2's third delete flavor,
    # completing the triad next to the predicate and POSITION forms):
    # {data_file: [[delete_file, [key_col, ...]], ...]} where each delete
    # file is a parquet of key VALUE tuples. Scans anti-join covered files
    # on the key columns (null-safe), so a delete of N keys is one small
    # parquet write + a manifest swap, cost proportional to the DELETED
    # keys — and unlike position deletes the match is by VALUE, so ordinal
    # staleness cannot exist. Rewritten files drop their entries (the
    # rewrite folds the deletes in), same lifecycle as the other flavors.
    equality_deletes: dict = field(default_factory=dict)
    # Nested field-id provenance (the struct-member analog of file_columns):
    # {data_file: {top id: {member id: written member name}}} — the member
    # mapping each file's struct columns were WRITTEN with, so scans can
    # project renamed/added/widened struct members through stable member
    # ids without rewriting data. Files absent here (or struct columns
    # absent inside) were written with the then-current member layout.
    file_struct_columns: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "table_uuid": self.table_uuid,
                "version": self.version,
                "schema_json": self.schema_json,
                "files": self.files,
                "properties": self.properties,
                "committed_at": self.committed_at,
                "file_stats": self.file_stats,
                "columns": self.columns,
                "file_columns": self.file_columns,
                "file_types": self.file_types,
                "partition_spec": self.partition_spec,
                "file_partitions": self.file_partitions,
                "bucket_spec": self.bucket_spec,
                "delete_preds": self.delete_preds,
                "position_deletes": self.position_deletes,
                "equality_deletes": self.equality_deletes,
                "file_struct_columns": self.file_struct_columns,
            },
            # compact encoding, deterministic key order: at 100 TB the
            # manifest is O(files) metadata — a 1M-file table's entries are
            # ~100 bytes each, and the separators alone cut ~30% vs pretty
            # printing. The .gz read probe already accepts a compressed
            # twin for legacy/offline-written manifests.
            separators=(",", ":"),
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "TableManifest":
        return TableManifest.from_dict(json.loads(s))

    @staticmethod
    def from_dict(d: dict) -> "TableManifest":
        if "shards" in d:
            # A sharded LIST object cannot be materialized without its
            # parts — forcing every reader through the store-aware
            # TableOperations.load_version keeps a naive parse from
            # silently dropping per-file state (stats are merely
            # conservative, but delete stamps and column provenance are
            # CORRECTNESS: resurrected rows / mis-projected renames).
            raise CommitStateError(
                "sharded manifest: use TableOperations.load_version, "
                "not TableManifest.from_json"
            )
        return TableManifest(
            table_uuid=d["table_uuid"],
            version=int(d["version"]),
            schema_json=d["schema_json"],
            files=list(d["files"]),
            properties=dict(d.get("properties", {})),
            committed_at=float(d.get("committed_at", 0.0)),
            file_stats=dict(d.get("file_stats", {})),
            # legacy manifests (pre-evolution): derive ids positionally —
            # their files were all written with the then-current names
            columns=list(d.get("columns") or _columns_from_schema(d["schema_json"])),
            file_columns=dict(d.get("file_columns", {})),
            file_types=dict(d.get("file_types", {})),
            partition_spec=list(d.get("partition_spec", [])),
            file_partitions=dict(d.get("file_partitions", {})),
            bucket_spec=dict(d.get("bucket_spec", {})),
            delete_preds=dict(d.get("delete_preds", {})),
            position_deletes=dict(d.get("position_deletes", {})),
            equality_deletes=dict(d.get("equality_deletes", {})),
            file_struct_columns=dict(d.get("file_struct_columns", {})),
        )

    def split_for_sharding(self, token: str) -> tuple[str, dict[str, str]]:
        """Serialize as (list_json, {part_name: part_json}): files group
        into shards by their partition-value dict (identity dirs, bucket/
        transform `_bucket` keys, or the "" default shard for
        unpartitioned files), and each part carries the per-file maps
        scoped to its files. ``token`` is the committer's unique id — part
        names are v<version>-<token>.part<i>.json so racing committers
        never collide on parts; the LIST is the only contended object."""
        d = json.loads(self.to_json())
        shard_files: dict[str, list[str]] = {}
        for f in d["files"]:
            key = json.dumps(self.file_partitions.get(f) or {}, sort_keys=True)
            shard_files.setdefault(key, []).append(f)
        in_shards = set(d["files"])
        shards: dict[str, dict] = {}
        parts: dict[str, str] = {}
        for i, (key, files) in enumerate(sorted(shard_files.items())):
            name = f"v{self.version}-{token}.part{i}.json"
            fset = set(files)
            part = {"files": files}
            for mname in _PER_FILE_MAPS:
                part[mname] = {k: v for k, v in d[mname].items() if k in fset}
            parts[name] = json.dumps(part, separators=(",", ":"), sort_keys=True)
            shards[key] = {
                "part": name,
                "partition": json.loads(key),
                "n_files": len(files),
            }
        # map entries keyed by something that is NOT a listed file (should
        # not happen — next() scopes them — but never silently drop state)
        for mname in _PER_FILE_MAPS:
            d[mname] = {k: v for k, v in d[mname].items() if k not in in_shards}
        d["files"] = []
        d["shards"] = shards
        return json.dumps(d, separators=(",", ":"), sort_keys=True), parts

    def next(
        self,
        files: list[str],
        properties: dict | None = None,
        schema_json: str | None = None,
        file_stats: dict | None = None,
        columns: list | None = None,
        delete_preds: dict | None = None,
        file_partitions: dict | None = None,
        position_deletes: dict | None = None,
        partition_spec: list | None = None,
        equality_deletes: dict | None = None,
    ) -> "TableManifest":
        new_cols = list(self.columns if columns is None else columns)
        # Any file the base doesn't know was just written with the COMMIT's
        # column names — stamp its {id: name} mapping here so every commit
        # path (append/CoW rewrite/merge/stream sink) records provenance
        # without each call site threading it through. When the commit
        # itself evolves the schema (columns/schema_json passed — e.g.
        # merge with schema evolution), the new files were written with the
        # NEW shape, so provenance uses it; pure-metadata evolutions write
        # no files, making the two cases coincide for retained files
        # (which always keep their recorded mapping). Entries for files no
        # longer listed are dropped (rewritten/compacted away).
        src_cols = new_cols if columns is not None else (self.columns or new_cols)
        write_mapping = {str(c["id"]): c["name"] for c in src_cols}
        fcols = {
            f: self.file_columns.get(f, write_mapping)
            for f in files
        }
        # struct-member provenance follows the same rule: new files were
        # written with the commit's member layout, retained files keep theirs
        write_struct = struct_mapping_of(src_cols)
        fstruct = {
            f: self.file_struct_columns.get(f, write_struct) for f in files
        }
        fstruct = {f: m for f, m in fstruct.items() if m}
        # written physical types follow the same provenance rule
        eff_schema = self.schema_json if schema_json is None else schema_json
        write_types = _types_by_id(eff_schema, src_cols)
        ftypes = {f: self.file_types.get(f, write_types) for f in files}
        # delete predicates follow their file: inherited for retained files,
        # gone with rewritten/compacted ones, never attached to new files
        src_preds = self.delete_preds if delete_preds is None else delete_preds
        dpreds = {f: src_preds[f] for f in files if src_preds.get(f)}
        # position-delete files follow the same lifecycle: retained data
        # files keep their delete files, rewritten ones drop them
        src_pos = self.position_deletes if position_deletes is None else position_deletes
        dpos = {f: src_pos[f] for f in files if src_pos.get(f)}
        # equality-delete files follow the same retained/rewritten lifecycle
        src_eq = self.equality_deletes if equality_deletes is None else equality_deletes
        deq = {f: src_eq[f] for f in files if src_eq.get(f)}
        # partition values: retained files inherit, new files bring their own
        # (stamped by the partitioned writer), removed files drop out
        all_parts = {**self.file_partitions, **(file_partitions or {})}
        fparts = {f: all_parts[f] for f in files if f in all_parts}
        return TableManifest(
            table_uuid=self.table_uuid,
            version=self.version + 1,
            schema_json=self.schema_json if schema_json is None else schema_json,
            files=files,
            properties=self.properties if properties is None else properties,
            file_stats=self.file_stats if file_stats is None else file_stats,
            columns=new_cols,
            file_columns=fcols,
            file_types=ftypes,
            partition_spec=list(
                self.partition_spec if partition_spec is None else partition_spec
            ),
            file_partitions=fparts,
            bucket_spec=dict(self.bucket_spec),
            delete_preds=dpreds,
            position_deletes=dpos,
            equality_deletes=deq,
            file_struct_columns=fstruct,
        )


def new_manifest(
    schema_json: str,
    files: list[str],
    properties: dict | None = None,
    file_stats: dict | None = None,
    partition_spec: list[str] | None = None,
    file_partitions: dict | None = None,
    bucket_spec: dict | None = None,
) -> TableManifest:
    columns = _columns_from_schema(schema_json)
    mapping = {str(c["id"]): c["name"] for c in columns}
    smap = struct_mapping_of(columns)
    return TableManifest(
        table_uuid=str(_uuid.uuid4()),
        version=1,
        schema_json=schema_json,
        files=files,
        properties=properties or {},
        file_stats=file_stats or {},
        columns=columns,
        file_columns={f: mapping for f in files},
        file_types={f: _types_by_id(schema_json, columns) for f in files},
        partition_spec=list(partition_spec or []),
        file_partitions=file_partitions or {},
        bucket_spec=bucket_spec or {},
        file_struct_columns={f: smap for f in files} if smap else {},
    )


class TableOperations:
    """Versioned metadata operations for one table directory (one branch).

    The equivalent of LakeFSTableOperations: refresh/current walk the chain,
    commit races via exclusive-create.

    Every storage touch goes through a ManifestStore (store.py): the default
    LocalManifestStore keeps today's POSIX behavior byte-identical, while an
    object-store implementation needs only put-if-absent/read/list to run
    the same lock-free protocol (conditional PUT as the race arbiter).
    """

    def __init__(self, table_dir: str, store: ManifestStore | None = None):
        self.table_dir = table_dir
        self.meta_dir = os.path.join(table_dir, METADATA_DIR)
        self.store = store if store is not None else _LOCAL_STORE

    # -- version resolution (LakeFSTableOperations.java:87-112, 233-265) ----

    def _version_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.manifest.json")

    def find_version(self) -> int:
        """Hint file if present, else scan metadata/ for max valid version,
        else 0 (= table has no committed metadata)."""
        hint = os.path.join(self.meta_dir, VERSION_HINT)
        try:
            content = self.store.read(hint)
            if content is not None:
                v = int(content.strip())
                if self._version_exists(v):
                    return v
        except ValueError:
            pass
        best = 0
        for name in self.store.list_dir(self.meta_dir):
            m = _VERSION_RE.match(name)
            if m:
                best = max(best, int(m.group(1)))
        return best

    def current_version(self) -> int:
        """Newest committed version number (0 = no metadata): hinted/
        scanned start, then walk forward past a stale hint."""
        v = self.find_version()
        if v == 0:
            return 0
        while self._version_exists(v + 1):
            v += 1
        return v

    def current(self) -> TableManifest | None:
        """Newest manifest: start at the hinted/scanned version, walk forward
        until v(N+1) is absent — tolerates a stale hint the same way the
        reference does."""
        v = self.current_version()
        return self.load_version(v) if v else None

    def read_version(self, version: int) -> str | None:
        """Raw manifest content for a version (codec-probing), or None."""
        return self.store.read(self._version_path(version))

    def peek_version(self, version: int) -> dict | None:
        """Raw manifest dict for a version — sharded LIST objects come back
        as-is (with their ``shards`` index, no part loads). The cheap probe
        for committed_at checks and shard-pruning decisions."""
        content = self.read_version(version)
        return json.loads(content) if content is not None else None

    def load_version(self, version: int, keep_shard=None) -> TableManifest | None:
        """Materialize a version's manifest, loading shard parts when the
        list object is sharded. ``keep_shard`` (fn(partition_dict) -> bool)
        makes the load LAZY: shards it rejects are never read from the
        store — the partition-pruned planning path. Correctness contract:
        only pass a keep_shard whose False is a PROOF that every file in
        the shard is excluded by the query's predicate."""
        d = self.peek_version(version)
        if d is None:
            return None
        if "shards" not in d:
            return TableManifest.from_dict(d)
        files = list(d.get("files", []))
        maps = {m: dict(d.get(m, {})) for m in _PER_FILE_MAPS}
        for info in d["shards"].values():
            if keep_shard is not None and not keep_shard(info["partition"]):
                continue
            raw = self.store.read(os.path.join(self.meta_dir, info["part"]))
            if raw is None:
                raise CommitStateError(
                    f"sharded manifest v{version} references missing part "
                    f"{info['part']}"
                )
            part = json.loads(raw)
            files.extend(part["files"])
            for m in _PER_FILE_MAPS:
                maps[m].update(part.get(m, {}))
        d = {k: v for k, v in d.items() if k != "shards"}
        d["files"] = files
        d.update(maps)
        return TableManifest.from_dict(d)

    def delete_version_artifacts(self, version: int) -> None:
        """Remove a version's list object (both codecs) and every part file
        belonging to it — expire's storage-reclaim step. Part names embed
        their version (v<N>-<token>.part<i>.json), so orphans from LOST
        commit races of that version are swept too."""
        for path in (self._version_path(version), self._version_path(version) + ".gz"):
            self.store.delete(path)
        prefix = f"v{version}-"
        for name in self.store.list_dir(self.meta_dir):
            if name.startswith(prefix) and ".part" in name and name.endswith(".json"):
                self.store.delete(os.path.join(self.meta_dir, name))

    def _version_exists(self, version: int) -> bool:
        p = self._version_path(version)
        return self.store.exists(p) or self.store.exists(p + ".gz")

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

        manifest.committed_at = _time.time()
        path = self._version_path(manifest.version)
        # Property-driven codec: gzip commits publish the .gz twin the read
        # probe (and _version_exists / GC / expire) already understands, so
        # a chain may freely mix plain and compressed versions.
        if manifest.properties.get(METADATA_COMPRESSION_PROP) == "gzip":
            path += ".gz"
        # Sharded manifests: write the per-partition PART objects first
        # under commit-unique names (no contention — each racer has its own
        # token), then race on the LIST object alone. A loser's parts are
        # unreferenced orphans, best-effort deleted here and swept by
        # expire's version-prefixed cleanup otherwise.
        part_paths: list[str] = []
        if manifest.properties.get(METADATA_SHARD_PROP) == "true":
            payload, parts = manifest.split_for_sharding(_uuid.uuid4().hex[:12])
            for name, content in parts.items():
                p = os.path.join(self.meta_dir, name)
                self.store.put(p, content)
                part_paths.append(p)
        else:
            payload = manifest.to_json()
        # PUBLISH via the store's put-if-absent — the set-if-absent arbiter
        # of the race. Local store: private temp file + os.link (fails-if-
        # exists and appears fully formed, so a concurrent reader can never
        # observe a torn half-written manifest). Object store: conditional
        # PUT, atomic by nature.
        try:
            self.store.put_if_absent(path, payload)
        except FileExistsError as e:
            for p in part_paths:
                self.store.delete(p)
            raise CommitConflictError(
                f"lost commit race for v{manifest.version} at {path}"
            ) from e
        self._write_version_hint(manifest.version)
        return manifest

    def _write_version_hint(self, version: int) -> None:
        """Best-effort pointer update (atomic overwrite); failures are
        swallowed (the chain walk recovers without it)."""
        try:
            self.store.put(os.path.join(self.meta_dir, VERSION_HINT), str(version))
        except OSError:
            pass

    def is_table_dir(self) -> bool:
        """A directory is a table iff metadata/ holds manifest files
        (LakeFSCatalog.java:88-104 isTableDir)."""
        return any(_VERSION_RE.match(n) for n in self.store.list_dir(self.meta_dir))
