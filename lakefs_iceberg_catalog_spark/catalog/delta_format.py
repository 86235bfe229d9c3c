"""Delta Lake transaction-log format: write and scan real `_delta_log` chains.

The second open-table-format ingest path beside Iceberg
(iceberg_format.py), following the PUBLIC Delta Lake protocol
(github.com/delta-io/delta PROTOCOL.md): a table is a directory of parquet
data files plus `_delta_log/<version, zero-padded 20>.json` commits, each
commit a list of newline-delimited JSON actions — `metaData` (schema as a
Spark schema JSON string, partition columns), `add` (data file joins the
table), `remove` (file leaves), `protocol`, `commitInfo`. The current file
set is the fold of all actions in version order; time travel stops the
fold at a version.

Scope: JSON commits only. Checkpoint parquet files are an optimization of
the same fold (base state + later JSONs); a table with a `_last_checkpoint`
whose JSON tail is incomplete raises rather than silently mis-reading.

Scale note: like the Iceberg walker, the log fold is driver-side planning —
O(commits + files) small JSON reads (checkpoints bound the commit tail in
production); executors read the data files through the distributed parquet
source with pushdown intact.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_delta_log"


def _commit_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _LOG_DIR, f"{version:020d}.json")


class DeltaTableWriter:
    """Minimal writer of a genuine Delta layout (fixture/export use):
    version 0 carries protocol+metaData, each commit appends and/or removes
    data files with the spec's action shapes."""

    def __init__(self, spark: SparkSession, table_dir: str):
        self.spark = spark
        self.table_dir = table_dir
        os.makedirs(os.path.join(table_dir, _LOG_DIR), exist_ok=True)
        self._version = -1

    def _write_commit(self, actions: list[dict]) -> int:
        self._version += 1
        with open(_commit_path(self.table_dir, self._version), "w") as f:
            f.write("\n".join(json.dumps(a, separators=(",", ":")) for a in actions))
        return self._version

    def commit(self, add_dfs: list[DataFrame] | None = None, remove: list[str] | None = None) -> int:
        """One commit: write each DataFrame as a parquet data file (`add`)
        and/or drop previously added files (`remove`). The first commit
        also stamps protocol + metaData."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        actions: list[dict] = []
        now_ms = int(time.time() * 1000)
        if self._version < 0:
            schema_df = (add_dfs or [None])[0]
            if schema_df is None:
                raise ValueError("first commit must add data (schema source)")
            actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_df.schema.json(),
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": now_ms,
                    }
                }
            )
        for df in add_dfs or []:
            name = f"part-{self._version + 1:05d}-{uuid.uuid4()}.snappy.parquet"
            path = os.path.join(self.table_dir, name)
            pdf = df.toPandas()
            pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
            actions.append(
                {
                    "add": {
                        "path": name,
                        "partitionValues": {},
                        "size": os.path.getsize(path),
                        "modificationTime": now_ms,
                        "dataChange": True,
                        "stats": json.dumps({"numRecords": len(pdf)}),
                    }
                }
            )
        for rel in remove or []:
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
        actions.append(
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "WRITE" if add_dfs else "DELETE",
                }
            }
        )
        return self._write_commit(actions)


def read_delta_log(table_dir: str, version: int | None = None) -> dict:
    """Fold the commit log: returns {version, schema_json, files} where
    files is the live relative-path set at that version (or head)."""
    log_dir = os.path.join(table_dir, _LOG_DIR)
    if os.path.exists(os.path.join(log_dir, "_last_checkpoint")):
        raise NotImplementedError(
            "checkpointed Delta logs are not supported by this reader"
        )
    versions = sorted(
        int(n.split(".")[0])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n.split(".")[0].isdigit()
    )
    if not versions:
        raise FileNotFoundError(f"no Delta commits under {log_dir}")
    if versions[0] != 0 or versions != list(range(len(versions))):
        raise ValueError(f"Delta log is not contiguous from 0: {versions}")
    stop = versions[-1] if version is None else version
    if stop not in versions:
        raise ValueError(f"Delta version {stop} does not exist (have {versions})")
    files: dict[str, dict] = {}
    schema_json: str | None = None
    for v in range(stop + 1):
        with open(_commit_path(table_dir, v)) as f:
            for line in f.read().splitlines():
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    schema_json = action["metaData"]["schemaString"]
                    if action["metaData"].get("partitionColumns"):
                        raise NotImplementedError(
                            "partitioned Delta tables are not supported"
                        )
                elif "add" in action:
                    files[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
    if schema_json is None:
        raise ValueError("Delta log has no metaData action")
    return {"version": stop, "schema_json": schema_json, "files": files}


def scan_delta_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Distributed scan of a Delta layout at head or a pinned version —
    log fold on the driver, parquet reads on the executors."""
    state = read_delta_log(table_dir, version)
    if not state["files"]:
        raise ValueError(f"Delta version {state['version']} has no live files")
    paths = [os.path.join(table_dir, rel) for rel in state["files"]]
    return spark.read.parquet(*paths)
