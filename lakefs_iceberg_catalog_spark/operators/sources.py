"""Sources & sinks beyond parquet (SURVEY.md §2.2 sources table: the pinned
engine reads/writes csv/json/orc and partitioned layouts; jdbc and the
Delta/Iceberg runtime jars are absent from this container and stay gated).

Each round-trip key materializes testdata through the format and reads it
back — the oracle is the same relation off the original parquet, so the
comparison proves lossless (schema-preserving) transport.

Scale notes (100 TB):
- CSV/JSON are ingest formats: schema is always declared explicitly (no
  inferSchema scan-twice), compression is splittable-friendly, and the first
  job in any pipeline rewrites them to parquet — exactly what the round-trip
  here does.
- The partitioned sink demonstrates hive-style partition layout; the read
  back through a partition filter must prune directories, asserted in
  tests/test_plans.py.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .util import bounded_rows, dround
from .util import local_df


def _nation_local(spark: SparkSession, sf_dir: str, *cols: str) -> DataFrame:
    """Fixture-SETUP cheapener for the multi-commit DML keys (VERDICT r7
    #7): nation as a LocalRelation (one bounded collect) so each of the
    fixture's per-commit single-file writes plans against in-memory rows
    instead of re-scanning the parquet source per job. The operator under
    test still runs against the REAL on-disk table the fixture writes —
    only the setup data source is local."""
    n = table(spark, sf_dir, "nation").select(*cols)
    return local_df(spark, bounded_rows(n), n.schema)


def _materialize(spark: SparkSession, df: DataFrame, tmp: str) -> DataFrame:
    """Pin a fixture-scale round-trip result past its temp-dir cleanup.
    Guarded by the shared row ceiling (operators/util.py:bounded_rows)."""
    rows, schema = bounded_rows(df), df.schema
    shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "source_csv_roundtrip",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → csv (header) → declared-schema csv read. Explicit schema on
    read: inferSchema double-scans and guesses types — never in a pipeline."""
    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="csv-rt-")
    n.write.mode("overwrite").option("header", True).csv(tmp)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", True)
        .csv(tmp)
    )
    return _materialize(spark, back, tmp)


@register(
    "source_json_roundtrip",
    oracle="""
SELECT r_regionkey, r_name FROM region
""",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → json-lines → declared-schema json read."""
    r = table(spark, sf_dir, "region")
    tmp = tempfile.mkdtemp(prefix="json-rt-")
    r.write.mode("overwrite").json(tmp)
    back = spark.read.schema("r_regionkey int, r_name string").json(tmp)
    return _materialize(spark, back, tmp)


@register(
    "source_orc_roundtrip",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS acctbal FROM supplier
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → ORC → read back (columnar alternative; same pushdown/pruning
    properties as parquet)."""
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", dround("s_acctbal", 2).alias("acctbal")
    )
    tmp = tempfile.mkdtemp(prefix="orc-rt-")
    s.write.mode("overwrite").orc(tmp)
    back = spark.read.orc(tmp)
    return _materialize(spark, back, tmp)


@register(
    "sink_partitioned_parquet",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       o_orderstatus,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE year(o_orderdate) = 1997
GROUP BY 1, 2
""",
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned sink + partition-pruned read: write orders
    partitioned by year, read back ONLY yr=1997 (the filter prunes to one
    directory — at 100 TB this is the difference between scanning one
    partition and the whole table; pruning asserted in test_plans)."""
    o = table(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    tmp = tempfile.mkdtemp(prefix="part-sink-")
    o.write.mode("overwrite").partitionBy("yr").parquet(tmp)
    back = (
        spark.read.parquet(tmp)
        .filter(F.col("yr") == 1997)
        .groupBy("yr", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dround(F.sum("o_totalprice"), 2).alias("total"))
        .select("yr", "o_orderstatus", "n", "total")
    )
    return _materialize(spark, back, tmp)


def read_jdbc_gated(spark: SparkSession, url: str, dbtable: str) -> DataFrame:
    """JDBC source — requires a driver jar absent from this container; the
    call shape is the production path, gated like the media codecs."""
    try:
        return spark.read.format("jdbc").options(url=url, dbtable=dbtable).load()
    except Exception as e:  # no jdbc driver in the image
        raise NotImplementedError(f"jdbc driver unavailable: {e}") from e


@register(
    "source_merge_schema_read",
    oracle="""
SELECT r_regionkey, r_name, NULL AS r_tag FROM region WHERE r_regionkey < 3
UNION ALL
SELECT r_regionkey, r_name, 'new' AS r_tag FROM region WHERE r_regionkey >= 3
""",
)
def source_merge_schema_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-merging parquet read (``mergeSchema=true``): a directory whose
    older files lack a column that newer files carry reads back as the
    UNION schema, old rows NULL-filled — the raw-ingest reality before data
    lands in a managed table (where the catalog's field-id projection does
    this properly). mergeSchema pays a footer read per file at planning
    time, which is why it is an explicit opt-in and why 100 TB lakes
    promote files into the catalog instead of re-merging on every scan."""
    r = table(spark, sf_dir, "region")
    tmp = tempfile.mkdtemp(prefix="merge-rt-")
    r.filter("r_regionkey < 3").select("r_regionkey", "r_name").write.mode(
        "overwrite"
    ).parquet(tmp + "/old")
    r.filter("r_regionkey >= 3").select(
        "r_regionkey", "r_name", F.lit("new").alias("r_tag")
    ).write.mode("overwrite").parquet(tmp + "/new")
    back = spark.read.option("mergeSchema", True).parquet(tmp + "/old", tmp + "/new")
    return _materialize(spark, back.select("r_regionkey", "r_name", "r_tag"), tmp)


@register(
    "source_binary_files",
    oracle="""
SELECT concat(lpad(CAST(doc_id AS VARCHAR), 5, '0'), '.bin') AS name,
       CAST(n_chars AS BIGINT)                               AS length,
       md5(text)                                             AS content_md5
FROM documents
WHERE doc_id < 100
""",
)
def source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` source — Spark's standard media-ingestion reader (a
    directory of image/audio/blob files → one row per file with path,
    length, raw bytes), the front door of every multimodal pipeline before
    the decode stages (operators/multimodal.py). The fixture writes 100
    documents' UTF-8 bytes as .bin files, reads them back through the
    binaryFile DataSource, and compares name/length/md5(content) — the
    content flows through Spark as real `binary`, hashed JVM-side.

    Scale: binaryFile splits work per FILE (never inside one), partitions
    sized by spark.sql.files.maxPartitionBytes, so a 100 TB media corpus
    reads wide with no driver involvement; small-file pressure is the real
    enemy at that scale — pack blobs into parquet binary columns (the
    multimodal tables' layout) after ingestion, which is exactly the
    pipeline these keys model."""
    import os as _os

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    tmp = tempfile.mkdtemp(prefix="binsrc-")
    for r in bounded_rows(docs):  # bounded fixture write (100 files)
        with open(_os.path.join(tmp, f"{r['doc_id']:05d}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    back = (
        spark.read.format("binaryFile")
        .load(tmp)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("name"),
            F.col("length"),
            F.md5("content").alias("content_md5"),
        )
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_metadata",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def source_iceberg_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a REAL Apache Iceberg v2 table layout (VERDICT r5 #4): the
    fixture writes nation as a genuine two-snapshot Iceberg table in the
    reference's HadoopCatalog layout — parquet data files, Avro manifests
    and manifest lists written by the REAL Apache Avro Java library,
    v<N>.metadata.json chain + version-hint.text — then the engine ingests
    it through catalog/iceberg_format.py: hint -> metadata.json ->
    manifest-list Avro -> manifest Avro (decoded by the from-scratch
    Python reader, catalog/avro_io.py) -> distributed parquet scan. This
    proves the catalog reads the reference's on-disk format itself
    (LakeFSTableOperations.java:139,176 load exactly these files via stock
    Iceberg), not just a mirror of its semantics.

    Scale: the metadata walk is driver-side planning, O(manifests+files)
    tiny reads — where Iceberg itself does it; executors read the data
    files through the normal parquet source with pushdown intact."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-rt-")
    w = IcebergTableWriter(spark, tmp)
    # snapshots 1 + 2 staged by one write job
    w.append_many(
        [
            n.filter(F.col("n_nationkey") < 12),
            n.filter(F.col("n_nationkey") >= 12),
        ]
    )
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_position_deletes",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (0, 7, 24)
""",
)
def source_iceberg_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a real Iceberg v2 table whose head snapshot carries a POSITION
    delete file (VERDICT r6 #5): the fixture appends nation as one
    snapshot, then commits a merge-on-read DELETE snapshot — a spec-shaped
    (file_path, pos) parquet delete file under a content=1 delete manifest
    — and the engine's walker merges the deletes as a (data file, row
    ordinal) anti-join during the scan. The reference's tables are
    format-version 2 (TestLakeFSCatalogSpark.java:67), whose row-level
    DELETEs may emit exactly these files (SURVEY §3.3) — without this
    read-side merge a real reference-written table would be unreadable.
    Pre-delete time travel is asserted mid-flow.

    Scale: the delete-side read is deleted-row-proportional and the
    anti-join keys on (file path, ordinal) — an equi-join, usually a
    broadcast; data files still stream through the distributed parquet
    source with pushdown intact."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-posdel-")
    w = IcebergTableWriter(spark, tmp)
    s1 = w.append(n.orderBy("n_nationkey"))  # ordinal == n_nationkey
    files, _ = iceberg_snapshot_files(tmp, snapshot_id=s1)
    data_path = files[0]["file_path"]
    w.delete_positions([(data_path, 0), (data_path, 7), (data_path, 24)])
    assert scan_iceberg_table(spark, tmp, snapshot_id=s1).count() == 25
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_incremental",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey >= 8
""",
)
def source_iceberg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL append scan over a real Iceberg v2 table — read only the
    rows appended after a known snapshot (Iceberg's IncrementalAppendScan;
    the pair of `source_delta_cdf` on the Delta side): the fixture writes
    nation as three append snapshots, then scans `(s1, current]` and gets
    exactly the last two appends' rows, having planned only their files.
    The bounded form `(s1, s2]` is asserted mid-flow, as is the refusal
    contract: a range containing a non-append snapshot raises (its rows
    were deleted/overwritten — an append-only reader would double-process;
    pinned in tests/test_iceberg_format.py).

    Scale: THE incremental-pipeline primitive — a consumer checkpointing
    the last snapshot it processed re-reads IO proportional to the delta,
    never the table. File selection is one driver-side manifest walk of
    the `to` snapshot filtered by the sequence-number window (no
    per-snapshot re-walk); data files stream through the distributed
    parquet source with pushdown intact."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_incremental

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-incr-")
    w = IcebergTableWriter(spark, tmp)
    s1, s2, _ = w.append_many(
        [
            n.filter(F.col("n_nationkey") < 8),
            n.filter((F.col("n_nationkey") >= 8) & (F.col("n_nationkey") < 17)),
            n.filter(F.col("n_nationkey") >= 17),
        ]
    )
    # bounded range: only the middle append's rows
    assert scan_iceberg_incremental(spark, tmp, s1, s2).count() == 9
    back = scan_iceberg_incremental(spark, tmp, from_snapshot_id=s1).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_partitioned",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey = 2
""",
)
def source_iceberg_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan an identity-PARTITIONED real Iceberg v2 table with
    manifest-level partition pruning: the fixture writes nation as five
    per-region appends — partition values recorded TYPED in each manifest
    entry's partition struct (field-ids 1000+) and in metadata's
    partition-specs, exactly the metadata stock Iceberg's planner prunes
    by — then scans with partition_filter={n_regionkey: 2} and returns
    only that partition's rows, having READ only that partition's file
    (input-file count asserted mid-flow).

    Scale: partition pruning happens in the driver-side metadata walk —
    a selective scan of a 100 TB table opens the matching partition's
    files and nothing else; the full-scan path is also asserted for
    correctness."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-part-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many([n.filter(F.col("n_regionkey") == rk) for rk in range(5)])
    assert scan_iceberg_table(spark, tmp).count() == n.count()
    pruned = scan_iceberg_table(spark, tmp, partition_filter={"n_regionkey": 2})
    assert len(pruned.inputFiles()) == 1  # 1 of 5 files — metadata pruning
    back = pruned.select("n_nationkey", "n_name", "n_regionkey")
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_partitioned_mor",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (5, 10, 15)
""",
)
def source_iceberg_partitioned_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes over an identity-PARTITIONED real Iceberg v2
    table (VERDICT r8 #3 — what Iceberg 1.4.3, the reference's pinned
    engine, does for every partitioned v2 table with row-level deletes):
    position deletes group per target file's partition tuple and equality
    deletes group per their own key-derived tuple, each delete manifest
    entry carrying the SAME typed partition struct as data manifests, so
    ``partition_filter`` prunes DELETE manifests alongside data manifests
    (asserted mid-flow: the filtered walk returns only the matching
    partition's delete files, and a non-touched partition returns none).

    Scale: delete application stays deleted-row-proportional, and a
    partition-filtered scan never opens another partition's delete files
    — the manifest-list partition summaries (spec field 507) are the
    index for both contents."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-partmor-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many(
        [n.filter(F.col("n_regionkey") == rk).orderBy("n_nationkey") for rk in range(5)]
    )
    data, _ = iceberg_snapshot_files(tmp)
    region0 = [
        f
        for f in data
        if (f.get("partition") or {}).get("n_regionkey") == 0
    ]
    assert len(region0) == 1
    # ordinal of nationkey 5 inside region 0's file (sorted append order)
    pos5 = bounded_rows(
        spark.read.parquet(region0[0]["file_path"])
        .withColumn("_pos", F.col("_metadata.row_index"))
        .filter("n_nationkey = 5")
        .select("_pos")
    )[0]["_pos"]
    w.delete_positions([(region0[0]["file_path"], int(pos5))])
    w.delete_keys(["n_nationkey", "n_regionkey"], [(10, 0), (15, 0)])
    # partition pruning covers DELETE manifests too: region 3's walk sees
    # no delete files, region 0's sees exactly its two
    _, d3 = iceberg_snapshot_files(tmp, partition_filter={"n_regionkey": 3})
    assert d3 == []
    _, d0 = iceberg_snapshot_files(tmp, partition_filter={"n_regionkey": 0})
    assert len(d0) == 2
    assert scan_iceberg_table(
        spark, tmp, partition_filter={"n_regionkey": 0}
    ).count() == 2  # region 0 = {0, 20} after the three MoR deletes
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_transform_mor",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1995-03-01' AND TIMESTAMP '1995-03-05'
  AND o_totalprice >= 100000
""",
)
def source_iceberg_transform_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETEs over a TRANSFORM-partitioned (hidden
    partitioning) Iceberg v2 table — the default shape of a real v2
    event table: days(o_orderdate) spec + row-level deletes (VERDICT
    r10 #3; previously refused). The predicate-level MoR delete groups
    matched (file, pos) pairs by each target file's manifest partition
    tuple — ALREADY the transformed day ordinal, no transform
    re-applied — one position-delete file per touched day, entries
    carrying the day-typed partition struct, so hidden_filter prunes
    DELETE manifests/files alongside data (asserted mid-flow by the
    filtered walk's delete-file tuples and the scan's input-file count).

    Scale: a DELETE over one week of a 100 TB time-partitioned table
    writes per-day delete files executor-side; a day-filtered scan
    opens one day's data + delete files and nothing else."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )
    from .util import bounded_rows

    o = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between("1995-03-01 00:00:00", "1995-03-05 00:00:00")
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )
    days = sorted(
        r[0] for r in bounded_rows(o.select("o_orderdate").distinct(), 10)
    )
    assert len(days) >= 2, "fixture window must span multiple days"
    tmp = tempfile.mkdtemp(prefix="iceberg-hiddenmor-")
    w = IcebergTableWriter(spark, tmp, partition_by=["days(o_orderdate)"])
    # one staged write job for all per-day appends (footer-derived
    # day-transform tuples — append_many round 16)
    w.append_many([o.filter(F.col("o_orderdate") == day) for day in days])
    # cross-day MoR delete: cheap orders die in every touched partition
    w.delete_where_mor("o_totalprice < 100000")
    data, dels = iceberg_snapshot_files(tmp)
    tuples = {(f.get("partition") or {}).get("o_orderdate_day") for f in dels}
    assert dels and None not in tuples  # per-day transformed tuples
    # hidden pruning covers DELETE files: the last day's walk sees only
    # its own delete file(s) — its ordinal read from the data manifests
    # (appends are day-sorted, so max tuple == last day)
    day_ord = max((f["partition"] or {}).get("o_orderdate_day") for f in data)
    _, d_last = iceberg_snapshot_files(
        tmp, partition_filter={"o_orderdate_day": day_ord}
    )
    assert {(f["partition"] or {}).get("o_orderdate_day") for f in d_last} <= {day_ord}
    pruned = scan_iceberg_table(
        spark, tmp, hidden_filter={"o_orderdate": days[-1]}
    )
    assert len(pruned.inputFiles()) <= 2  # 1 data + ≤1 delete file of N days
    back = scan_iceberg_table(spark, tmp).select(
        "o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_global_eq_deletes",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (4, 11, 23)
""",
)
def source_iceberg_global_eq_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL equality deletes on a PARTITIONED Iceberg v2 table — the
    delete key does NOT include the partition column (VERDICT r10 #4;
    previously refused): the writer emits ONE delete file in a manifest
    under an UNPARTITIONED spec reference (spec-legal — the manifest's
    spec scopes its delete files table-wide), registered in metadata's
    partition-specs; scans apply it to every data file with a strictly
    older sequence number via the existing sequence scoping, and
    partition-filtered walks KEEP it (asserted mid-flow: the global
    delete survives a partition_filter that prunes all scoped files).

    Scale: a delete-by-user-id over a date-partitioned 100 TB table is
    exactly this shape — one key-proportional delete file, zero data
    rewritten, no partition enumeration."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        read_table_metadata,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-globeq-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many([n.filter(F.col("n_regionkey") == rk) for rk in range(5)])
    # the key excludes the partition source column → GLOBAL delete
    w.delete_keys(["n_nationkey"], [(4,), (11,), (23,)])
    m = read_table_metadata(tmp)
    empty_specs = [s for s in m["partition-specs"] if s["fields"] == []]
    assert len(empty_specs) == 1  # the lazily-registered global reference
    _, dels = iceberg_snapshot_files(tmp)
    assert [f["_spec_id"] for f in dels] == [empty_specs[0]["spec-id"]]
    # a partition-filtered walk keeps the global delete (table-wide scope)
    _, d2 = iceberg_snapshot_files(tmp, partition_filter={"n_regionkey": 2})
    assert len(d2) == 1
    pr = scan_iceberg_table(spark, tmp, partition_filter={"n_regionkey": 2})
    assert pr.filter("n_nationkey = 11").count() == 0  # applied when pruned
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_evolved_spec_mor",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (0, 13)
""",
)
def source_iceberg_evolved_spec_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position deletes AFTER partition-spec evolution (VERDICT r10 #5;
    previously refused): the table starts identity-partitioned on
    n_regionkey (regions 0-1 appended), evolves to
    truncate(n_nationkey, 10) (metadata-only), appends the rest under
    the new spec, then one MoR DELETE hits rows in BOTH generations.
    The delete writer groups each position-delete file under its TARGET
    file's OWN spec — one content=1 manifest per spec id, each entry
    carrying that spec's partition struct (asserted mid-flow) — exactly
    how stock Iceberg scopes delete manifests on spec-evolved tables.

    Scale: spec evolution never rewrites data, so deletes over mixed
    generations are the steady state of any long-lived table; per-spec
    manifests keep both generations prunable by their own layout."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-evodel-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many([n.filter(F.col("n_regionkey") == rk) for rk in (0, 1)])
    w.evolve_partition_spec(["truncate(n_nationkey, 10)"])
    rest = n.filter("n_regionkey >= 2")
    w.append_many(
        [
            rest.filter(
                (F.col("n_nationkey") >= lo) & (F.col("n_nationkey") < lo + 10)
            )
            for lo in (0, 10, 20)
        ]
    )
    # key 0 lives in an old-spec file (region 0), key 13 in a new-spec one
    w.delete_where_mor("n_nationkey = 0 or n_nationkey = 13")
    _, dels = iceberg_snapshot_files(tmp)
    tuples = {f["_spec_id"]: f.get("partition") for f in dels}
    assert tuples == {0: {"n_regionkey": 0}, 1: {"n_nationkey_trunc": 10}}
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_changelog",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey,
       'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_seq
FROM nation WHERE n_regionkey >= 2
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'delete', CAST(3 AS BIGINT)
FROM nation WHERE n_nationkey IN (2, 14)
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'delete', CAST(4 AS BIGINT)
FROM nation WHERE n_nationkey = 5
UNION ALL
SELECT n_nationkey, 'UPDATED-5' AS n_name, n_regionkey,
       'insert', CAST(4 AS BIGINT)
FROM nation WHERE n_nationkey = 5
UNION ALL
SELECT CAST(25 AS INTEGER), 'ATLANTIS', n_regionkey, 'insert',
       CAST(4 AS BIGINT)
FROM nation WHERE n_nationkey = 4
""",
)
def source_iceberg_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGELOG scan over a real Iceberg v2 snapshot window — the
    Iceberg dual of ``source_delta_cdf`` (stock Iceberg's
    create_changelog_view): each snapshot in ``(from, to]`` contributes
    exactly its own row-level changes. The fixture commits an append
    (seq 2), a merge-on-read position DELETE spanning both earlier files
    (seq 3), and a MoR merge upsert (equality delete + new data file,
    seq 4); the changelog reports the appended rows as inserts, the
    position-delete victims as deletes, and the merge as the old
    version's delete plus the new rows' inserts — every row stamped with
    its deterministic ``_commit_seq``.

    Scale: derivation is metadata-driven and change-proportional —
    appends read only the added files, position deletes only the target
    files at the deleted ordinals, equality deletes one key-filtered
    pre-snapshot scan; compaction (`replace`) snapshots contribute
    nothing, like Delta's dataChange=false."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        scan_iceberg_changelog,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-changelog-")
    w = IcebergTableWriter(spark, tmp)
    v1, _ = w.append_many(
        [n.filter("n_regionkey < 2"), n.filter("n_regionkey >= 2")]
    )
    w.delete_where_mor("n_nationkey in (2, 14)")
    src = n.filter("n_nationkey = 5").withColumn(
        "n_name", F.lit("UPDATED-5")
    ).unionByName(
        n.filter("n_nationkey = 4").withColumns(
            {
                "n_nationkey": F.lit(25).cast("int"),
                "n_name": F.lit("ATLANTIS"),
            }
        )
    )
    w.merge_upsert_mor(src, ["n_nationkey"])
    back = scan_iceberg_changelog(spark, tmp, from_snapshot_id=v1)
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_changelog_cow",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey,
       'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_seq
FROM nation WHERE n_regionkey >= 2
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'delete', CAST(3 AS BIGINT)
FROM nation WHERE n_nationkey IN (6, 7)
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'delete', CAST(4 AS BIGINT)
FROM nation WHERE n_nationkey = 9
""",
)
def source_iceberg_changelog_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog across a COPY-ON-WRITE rewrite (VERDICT r11 #1;
    previously a loud refusal): a CoW DELETE removes data files and
    re-adds survivors, so the changelog derives the snapshot's NET row
    changes by diffing the pre-snapshot visible rows of the removed
    files against the post-snapshot rows of the added files (exceptAll
    both ways — carried-over rows cancel), matching stock
    ``create_changelog_view``'s overwrite semantics. The fixture spans
    the deleted keys across BOTH files (multi-file rewrite), then a MoR
    position delete lands on a REWRITTEN file to prove the mixed history
    keeps composing.

    Scale: the diff reads only the rewritten files — change-bounded,
    never a table scan; mixing CoW and MoR DML is the steady state of a
    real table, which is why the refusal had to go."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        scan_iceberg_changelog,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-changelog-cow-")
    w = IcebergTableWriter(spark, tmp)
    v1, _ = w.append_many(
        [n.filter("n_regionkey < 2"), n.filter("n_regionkey >= 2")]
    )
    # keys 6 (region 1) and 7 (region 2) live in DIFFERENT files
    w.delete_where_cow("n_nationkey in (6, 7)")
    w.delete_where_mor("n_nationkey = 9")  # targets a rewritten file
    back = scan_iceberg_changelog(spark, tmp, from_snapshot_id=v1)
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_changelog_evolved",
    oracle="""
SELECT n_nationkey, n_name AS nation_name, n_regionkey, 'new' AS note,
       'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_seq
FROM nation WHERE n_nationkey >= 12
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, CAST(NULL AS VARCHAR),
       'delete', CAST(3 AS BIGINT)
FROM nation WHERE n_nationkey = 2
""",
)
def source_iceberg_changelog_evolved(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Changelog ACROSS SCHEMA EVOLUTION (VERDICT r11 #2; previously a
    refusal): a rename + add-column lands inside the window, then an
    append under the new schema and a MoR position delete whose victim
    row lives in an OLD-schema file. Every change row projects to the
    CURRENT schema by FIELD ID — the same manifest-embedded write-schema
    projection the snapshot scan uses — so the old file's renamed column
    re-aliases and its missing `note` reads as a typed NULL.

    Scale: evolution commits are metadata-only at any table size; the
    changelog's per-file projection is a select, no shuffle — an
    incremental consumer survives the rename without re-bootstrapping."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        scan_iceberg_changelog,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-changelog-evo-")
    w = IcebergTableWriter(spark, tmp)
    v1 = w.append(n.filter("n_nationkey < 12"))
    w.rename_column("n_name", "nation_name")  # metadata-only
    w.add_column("note", "string")
    w.append(
        n.filter("n_nationkey >= 12")
        .withColumnRenamed("n_name", "nation_name")
        .withColumn("note", F.lit("new"))
    )
    w.delete_where_mor("n_nationkey = 2")  # victim in the OLD-schema file
    back = scan_iceberg_changelog(spark, tmp, from_snapshot_id=v1)
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_changelog_orc",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey,
       'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_seq
FROM nation WHERE n_nationkey BETWEEN 10 AND 17
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'insert', CAST(3 AS BIGINT)
FROM nation WHERE n_nationkey >= 18
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'delete', CAST(4 AS BIGINT)
FROM nation WHERE n_nationkey IN (0, 3)
""",
)
def source_iceberg_changelog_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog over a MIXED parquet+ORC table (VERDICT r11 #3;
    previously a refusal): an ORC append contributes inserts through the
    per-format dispatch, and a position delete whose TARGET is an ORC
    file derives its victims through the executor-side pyarrow ordinal
    reader (`_metadata.row_index` is parquet-only) — the same machinery
    the MoR scan path uses (dml_iceberg_delete_orc_mor).

    Scale: per-format grouped reads keep pushdown intact in each source;
    ordinal stamping is one sequential streamed task per ORC file, and
    only the files the window touches are read."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_changelog,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-changelog-orc-")
    w = IcebergTableWriter(spark, tmp, file_format="orc")
    v1 = w.append(n.filter("n_nationkey < 10").orderBy("n_nationkey"))
    w.append(
        n.filter("n_nationkey between 10 and 17").orderBy("n_nationkey")
    )
    w.append(n.filter("n_nationkey >= 18"), file_format="parquet")
    files, _ = iceberg_snapshot_files(tmp)
    low = next(f for f in files if f["record_count"] == 10)
    assert low["file_format"].upper() == "ORC"
    # ordinals {0, 3} of the key-ordered low ORC file == keys 0 and 3
    w.delete_positions([(low["file_path"], 0), (low["file_path"], 3)])
    back = scan_iceberg_changelog(spark, tmp, from_snapshot_id=v1)
    return _materialize(spark, back, tmp)


@register(
    "maint_iceberg_rewrite_deletes",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (1, 2, 11, 15)
""",
)
def maint_iceberg_rewrite_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``rewrite_position_delete_files`` — the delete-side
    compaction: two overlapping MoR DELETEs leave four small position-
    delete files (one per touched target, key 11 marked twice), then a
    copy-on-write DELETE rewrites one data file so its delete rows DANGLE
    against the dead path. The rewrite drops the dangling rows, collapses
    the duplicate, and consolidates to ONE delete file per still-covered
    target under a `replace` snapshot (delete-file count and surviving
    row count asserted mid-flow); the visible rows are provably unchanged
    and value-checked against the oracle.

    Scale: IO is delete-row-proportional — one distributed read of the
    old delete files, one shuffle per target file, zero data reads; the
    nightly job that keeps scan-time delete-merge cost flat as MoR DML
    accumulates (pairs with rewrite_data + expire_snapshots for the full
    maintenance story)."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-rewritedel-")
    w = IcebergTableWriter(spark, tmp)
    w.append_many(
        [
            n.filter(
                (F.col("n_nationkey") >= lo) & (F.col("n_nationkey") < lo + 10)
            ).orderBy("n_nationkey")
            for lo in (0, 10, 20)
        ]
    )
    w.delete_where_mor("n_nationkey in (1, 11)")
    w.delete_where_mor("n_nationkey in (2, 11)")  # key 11 marked TWICE
    _, dels0 = iceberg_snapshot_files(tmp)
    assert len(dels0) == 4 and sum(f["record_count"] for f in dels0) == 4
    w.delete_where_cow("n_nationkey = 15")  # kills file B: 11's rows dangle
    w.rewrite_position_deletes()
    _, dels1 = iceberg_snapshot_files(tmp)
    # consolidated: ONE delete file (file A's), duplicate + dangling gone
    assert len(dels1) == 1 and dels1[0]["record_count"] == 2
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "sink_iceberg_branch_write",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def sink_iceberg_branch_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRANCH WRITES + FAST-FORWARD on the real Iceberg layout (stock's
    ``writeTo(t).toBranch("audit").append()`` + the ``fast_forward``
    procedure — the branch lifecycle that completes the refs story next
    to tags and write-audit-publish): two appends land on an ``audit``
    branch ref forked from main (asserted mid-flow: main scans stay at
    the fork point while ``ref="audit"`` reads the branch head, and the
    branch chain carries proper parent links), then main FAST-FORWARDS
    to the branch — pure metadata, refusing if main had diverged. After
    the fast-forward a changelog window from the old main head reports
    the branch commits as ordinary inserts (they joined the ancestry).

    Scale: branch writes cost what any append costs; audit reads are
    normal distributed scans of the branch head; fast-forward is one
    metadata.json write — the isolation pattern that lets a 100 TB
    nightly ingest be inspected before it becomes `main`."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        read_table_metadata,
        scan_iceberg_changelog,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-branch-")
    w = IcebergTableWriter(spark, tmp)
    v1 = w.append(n.filter("n_nationkey < 10"))
    b1 = w.append(n.filter("n_nationkey between 10 and 17"), branch="audit")
    b2 = w.append(n.filter("n_nationkey >= 18"), branch="audit")
    meta = read_table_metadata(tmp)
    assert meta["refs"]["audit"]["snapshot-id"] == b2
    assert meta["refs"]["main"]["snapshot-id"] == v1
    sn2 = next(s for s in meta["snapshots"] if s["snapshot-id"] == b2)
    assert sn2["parent-snapshot-id"] == b1  # branch chain, not main
    assert scan_iceberg_table(spark, tmp).count() == 10  # main untouched
    assert scan_iceberg_table(spark, tmp, ref="audit").count() == 25
    w.fast_forward("audit")
    meta2 = read_table_metadata(tmp)
    assert meta2["refs"]["main"]["snapshot-id"] == b2
    # the branch commits joined main's ancestry: the changelog window
    # from the old head reports them as plain inserts
    ch = scan_iceberg_changelog(spark, tmp, from_snapshot_id=v1)
    assert ch.filter("_change_type = 'insert'").count() == 15
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "sink_iceberg_wap_publish",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def sink_iceberg_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH on the real Iceberg v2 layout (VERDICT r11 #9
    stretch — completes the refs story next to tags/branches): an append
    staged with a ``wap.id`` lands in table metadata WITHOUT moving
    ``current-snapshot-id``/``main`` (asserted mid-flow: the head scan
    stays at the pre-stage rows while the auditor reads the staged
    snapshot directly by id), then ``cherry_pick_snapshot`` publishes it
    as a fresh snapshot whose summary records ``published-wap-id`` —
    stock Iceberg's ``write.wap.enabled`` + cherry-pick procedure. A
    duplicate publish of the same wap id refuses (the audit pipeline's
    replay gate), as does cherry-picking an unknown id.

    Scale: staging writes the data once; audit and publish are pure
    metadata at any table size — the pattern that lets a 100 TB ingest
    run quality checks BEFORE its rows become visible."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        read_table_metadata,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-wap-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12"))
    staged = w.append(n.filter("n_nationkey >= 12"), wap_id="audit-1")
    # staged rows invisible to main; auditable by snapshot id
    assert scan_iceberg_table(spark, tmp).count() == 12
    assert (
        scan_iceberg_table(spark, tmp, snapshot_id=staged).count() == 25
    )
    meta = read_table_metadata(tmp)
    assert meta["refs"]["main"]["snapshot-id"] != staged
    sn = next(s for s in meta["snapshots"] if s["snapshot-id"] == staged)
    assert sn["summary"]["wap.id"] == "audit-1"
    pub = w.cherry_pick_snapshot(wap_id="audit-1")
    meta2 = read_table_metadata(tmp)
    assert meta2["refs"]["main"]["snapshot-id"] == pub
    sn2 = next(s for s in meta2["snapshots"] if s["snapshot-id"] == pub)
    assert sn2["summary"]["published-wap-id"] == "audit-1"
    try:
        w.cherry_pick_snapshot(wap_id="audit-1")
        raise AssertionError("duplicate publish must refuse")
    except ValueError:
        pass
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "maint_iceberg_rewrite_deletes_mixed",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (1, 2, 11, 15)
""",
)
def maint_iceberg_rewrite_deletes_mixed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``rewrite_position_delete_files`` over a delete manifest MIXING
    position and equality files (VERDICT r11 #4; previously a refusal):
    the spec allows one MERGE commit to land both flavors in one
    content=1 manifest — external writers do — so the fixture commits
    exactly that shape (position ordinals {1,2} of the low file + an
    equality delete on key 15 in ONE manifest), overlaps it with a
    second plain MoR delete (key 2 marked twice, plus key 11), then
    compacts. The mixed manifest SPLITS: its position entries are
    superseded by the consolidated rewrite, its equality entry survives
    in a rewritten manifest with its inherited sequence number resolved
    explicitly — post-compaction the table carries one consolidated
    position-delete file per still-covered target plus the intact
    equality delete, and the visible rows are provably unchanged.

    Scale: same delete-row-proportional cost as the plain rewrite — one
    distributed read of the old position files, zero data reads; the
    split adds one metadata-sized manifest rewrite."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..catalog.iceberg_format import (
        CONTENT_EQUALITY_DELETES,
        CONTENT_POSITION_DELETES,
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-rewritedel-mixed-")
    w = IcebergTableWriter(spark, tmp)
    w.append_many(  # both appends staged in ONE write job
        [
            n.filter("n_nationkey < 10").orderBy("n_nationkey"),
            n.filter("n_nationkey >= 10").orderBy("n_nationkey"),
        ]
    )
    files, _ = iceberg_snapshot_files(tmp)
    low = next(f for f in files if f["record_count"] == 10)
    # ONE snapshot, ONE manifest, BOTH delete flavors — the external-
    # writer shape the compactor must split (internal seams used to craft
    # the layout; the operator under test is the public rewrite)
    import uuid as _uuid

    w._version += 1
    w._sequence += 1
    sid = int(_uuid.uuid4().int % (1 << 62))
    pos_path = os.path.join(
        w.data_dir, f"00000-{w._version}-{w._uuid}-deletes-00001.parquet"
    )
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([low["file_path"]] * 2, pa.string()),
                "pos": pa.array([1, 2], pa.int64()),
            }
        ),
        pos_path,
    )
    _, eq_files = w._eq_delete_files(["n_nationkey"], [(15,)])
    w._append_delete_manifest(
        sid, [(pos_path, 2, {}, CONTENT_POSITION_DELETES, None)] + eq_files
    )
    w._commit_snapshot(sid, "delete")
    w.delete_where_mor("n_nationkey in (2, 11)")  # key 2 marked TWICE
    _, dels0 = iceberg_snapshot_files(tmp)
    assert {f["content"] for f in dels0} == {
        CONTENT_POSITION_DELETES,
        CONTENT_EQUALITY_DELETES,
    }
    w.rewrite_position_deletes()
    _, dels1 = iceberg_snapshot_files(tmp)
    by_content = {}
    for f in dels1:
        by_content.setdefault(f["content"], []).append(f)
    # consolidated: ONE position file per covered target (low + high),
    # duplicate collapsed; the equality delete survives the split with
    # its original sequence number
    pos1 = by_content[CONTENT_POSITION_DELETES]
    assert len(pos1) == 2 and sum(f["record_count"] for f in pos1) == 3
    eq1 = by_content[CONTENT_EQUALITY_DELETES]
    # the split preserves the eq entry's ORIGINAL sequence number (the
    # mixed snapshot's, seq 3 — after the two appends), not the replace's
    assert len(eq1) == 1 and int(eq1[0]["sequence_number"]) == 3
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "ddl_iceberg_properties",
    oracle="""
SELECT * FROM (VALUES
  ('commit.retry.num-retries', '4'),
  ('write.metadata.compression-codec', 'none')
) AS t(key, value)
""",
)
def ddl_iceberg_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE PROPERTIES on the real Iceberg layout (ALTER TABLE SET /
    UNSET TBLPROPERTIES): properties live in metadata.json's
    ``properties`` map and a change is a NEW METADATA VERSION WITHOUT a
    snapshot — the fixture asserts the snapshot list is untouched by two
    property commits, that an unset of an unknown key refuses, and reads
    the surviving properties back through the normal metadata chain.

    Scale: pure metadata at any table size — the knob surface
    (commit retries, compression codecs, wap.enabled) every deployment
    tunes without touching data."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        read_table_metadata,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-props-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n)
    n_snaps = len(read_table_metadata(tmp)["snapshots"])
    w.set_properties(
        {
            "commit.retry.num-retries": "4",
            "write.metadata.compression-codec": "none",
            "history.expire.max-snapshot-age-ms": "3600000",
        }
    )
    w.remove_properties(["history.expire.max-snapshot-age-ms"])
    try:
        w.remove_properties(["no.such.key"])
        raise AssertionError("unknown-key unset must refuse")
    except ValueError:
        pass
    meta = read_table_metadata(tmp)
    assert len(meta["snapshots"]) == n_snaps  # no snapshot from properties
    props = meta["properties"]
    back = local_df(
        spark,
        sorted(props.items()),
        "key string, value string",
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return back


@register(
    "source_iceberg_entries_table",
    oracle="""
SELECT * FROM (VALUES
  (1, 0, 'PARQUET', CAST(11 AS BIGINT)),
  (1, 0, 'PARQUET', CAST(13 AS BIGINT)),
  (1, 1, 'PARQUET', CAST(1 AS BIGINT)),
  (2, 0, 'PARQUET', CAST(12 AS BIGINT))
) AS t(status, content, file_format, record_count)
""",
)
def source_iceberg_entries_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``t.entries`` METADATA TABLE — the raw manifest-
    entry view the files/delete_files tables aggregate over: one row per
    current-snapshot entry with its STATUS (EXISTING=0/ADDED=1/
    DELETED=2), resolved sequence number, content, and file metrics.
    The fixture's history makes the statuses non-trivial: a CoW DELETE
    rewrites one manifest (its victim carried as DELETED, the survivor
    file ADDED in a fresh manifest) while the untouched append and a
    MoR position-delete entry stay ADDED — exactly the reconciliation
    view an engine debugging a scan plan reads.

    Scale: zero data IO — O(manifest entries) driver-side metadata, the
    same walk every scan plans with."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-entries-")
    w = IcebergTableWriter(spark, tmp)
    w.append_many(  # both appends staged in ONE write job
        [
            n.filter("n_nationkey < 12").orderBy("n_nationkey"),
            n.filter("n_nationkey >= 12"),
        ]
    )
    w.delete_where_cow("n_nationkey = 3")  # rewrites manifest 1
    w.delete_where_mor("n_nationkey = 20")  # content=1 ADDED entry
    back = iceberg_metadata_table(spark, tmp, "entries").select(
        "status", "content", "file_format", "record_count"
    )
    return _materialize(spark, back, tmp)


@register(
    "maint_iceberg_rewrite_manifests",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey <> 7
""",
)
def maint_iceberg_rewrite_manifests(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stock Iceberg's ``rewrite_manifests`` — the METADATA compaction
    that keeps planning fast as commits pile up: five per-region appends
    leave five data manifests, a MoR DELETE adds a content=1 manifest,
    then the rewrite consolidates the data manifests into ONE (entries
    carried as EXISTING with resolved sequence numbers, partition
    summaries rebuilt so manifest-level pruning keeps working — asserted
    mid-flow), the delete manifest untouched, under a `replace`
    snapshot. The visible rows are provably unchanged and a changelog
    window across the rewrite contributes nothing.

    Scale: zero data IO — O(manifest entries) driver-side metadata,
    exactly where stock plans it; the nightly pair of rewrite_data for
    tables taking thousands of small commits."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        read_table_metadata,
        scan_iceberg_changelog,
        scan_iceberg_table,
    )
    from ..catalog.avro_io import read_container

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-rewritemf-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many([n.filter(F.col("n_regionkey") == rk) for rk in range(5)])
    v_del = w.delete_where_mor("n_nationkey = 7")
    meta = read_table_metadata(tmp)
    head = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mfs0 = read_container(head["manifest-list"])
    assert sum(1 for m in mfs0 if m.get("content", 0) == 0) == 5
    w.rewrite_manifests()
    meta1 = read_table_metadata(tmp)
    head1 = next(
        s for s in meta1["snapshots"]
        if s["snapshot-id"] == meta1["current-snapshot-id"]
    )
    _, mfs1 = read_container(head1["manifest-list"])
    data_mfs = [m for m in mfs1 if m.get("content", 0) == 0]
    assert len(data_mfs) == 1  # consolidated
    assert sum(1 for m in mfs1 if m.get("content", 0) == 1) == 1  # kept
    # manifest-level partition pruning still works off the rebuilt
    # summaries + per-entry tuples
    pruned = scan_iceberg_table(spark, tmp, partition_filter={"n_regionkey": 2})
    assert pruned.count() == 4  # region 2 holds keys 2,7,12,17,22 minus 7
    # per-entry tuples survived the consolidation: the scan's exact
    # per-file pruning (and the walker's exact delete-entry pruning)
    # still resolve each entry's own partition value
    files2, dels2 = iceberg_snapshot_files(
        tmp, partition_filter={"n_regionkey": 2}
    )
    assert {f["partition"]["n_regionkey"] for f in files2} == {0, 1, 2, 3, 4}
    assert {f["partition"]["n_regionkey"] for f in dels2} == {2}
    # replace snapshot: a changelog window across it is empty
    assert (
        scan_iceberg_changelog(spark, tmp, from_snapshot_id=v_del).count() == 0
    )
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_delete_files_table",
    oracle="""
SELECT * FROM (VALUES
  (1, 'PARQUET', CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS INTEGER)),
  (2, 'PARQUET', CAST(1 AS BIGINT), CAST(3 AS BIGINT), 2)
) AS t(content, file_format, record_count, sequence_number, first_eq_id)
""",
)
def source_iceberg_delete_files_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stock Iceberg's ``t.delete_files`` METADATA TABLE — the MoR-debt
    dashboard: one row per live delete file with content (1=position,
    2=equality), record count, sequence number, and equality_ids. The
    fixture commits a position delete (2 ordinals) and an equality
    delete (1 key on n_name, field id 2); the key projects the
    deterministic columns. Zero data-file IO — rows come from the same
    manifest walk every scan plans with; a maintenance scheduler reads
    this table to decide when rewrite_position_deletes runs.

    Scale: O(delete files) metadata rows at any table size."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
        iceberg_snapshot_files,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-delfiles-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.orderBy("n_nationkey"))
    files, _ = iceberg_snapshot_files(tmp)
    w.delete_positions([(files[0]["file_path"], 3), (files[0]["file_path"], 8)])
    w.delete_keys(["n_name"], [("NATION_17",)])
    mt = iceberg_metadata_table(spark, tmp, "delete_files")
    back = mt.select(
        "content",
        "file_format",
        "record_count",
        "sequence_number",
        F.element_at("equality_ids", 1).alias("first_eq_id"),
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_stats_pruning",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey BETWEEN 7 AND 12
""",
)
def source_iceberg_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max FILE SKIPPING on a real Iceberg v2 layout: the writer
    records per-column bounds in each manifest entry (spec fields
    125/128, single-value serialized from the parquet footer — zero
    extra data IO), and the scan's ``stats_filter`` prunes data files
    whose [lower, upper] range cannot overlap the predicate, then applies
    the exact row residual. The fixture writes nation as five key-ranged
    appends; a BETWEEN 7 AND 12 scan must open only the two straddling
    files (input-file count asserted mid-flow).

    Scale: this is Iceberg's core selective-scan mechanism at 100 TB —
    on a sorted/clustered column the planner touches only boundary
    files; all skipping happens in the driver-side metadata walk before
    any executor IO. Cites the spec's manifest bounds (Appendix D
    single-value serialization), as stock Iceberg writers populate from
    the same footer stats."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-stats-")
    w = IcebergTableWriter(spark, tmp)
    w.append_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 4)) for lo in range(0, 25, 5)]
    )
    pruned = scan_iceberg_table(spark, tmp, stats_filter={"n_nationkey": (7, 12)})
    assert len(pruned.inputFiles()) == 2  # files [5-9] and [10-14] of 5
    back = pruned.select("n_nationkey", "n_name", "n_regionkey")
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_transform_partitioned",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders
WHERE o_orderdate = (
  SELECT max(o_orderdate) FROM orders
  WHERE o_orderdate BETWEEN TIMESTAMP '1995-03-01' AND TIMESTAMP '1995-03-05'
)
""",
)
def source_iceberg_transform_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HIDDEN PARTITIONING on the real Iceberg layout — the spec's
    signature feature: the table is partitioned by days(o_orderdate)
    (TRANSFORMED values in the manifest partition structs, `day`
    transform in partition-specs), and the query filters on the SOURCE
    column; the scan projects the predicate through the transform
    (apply_iceberg_transform) so only the matching day's file opens
    (input-file count asserted) with the exact row residual applied.
    The user never names the partition layout.

    Scale: this is how a WHERE ts = ... touches one day of a 100 TB
    time-partitioned table — transform projection happens in the driver
    metadata walk; bucket()/truncate() take the same path (spec-vector-
    tested murmur3 for bucket)."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table
    from .util import bounded_rows

    o = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between("1995-03-01 00:00:00", "1995-03-05 00:00:00")
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )
    days = sorted(
        r[0] for r in bounded_rows(o.select("o_orderdate").distinct(), 10)
    )
    assert len(days) >= 2, "fixture window must span multiple days"
    tmp = tempfile.mkdtemp(prefix="iceberg-hidden-")
    w = IcebergTableWriter(spark, tmp, partition_by=["days(o_orderdate)"])
    # one staged write job for all per-day appends (footer-derived
    # day-transform tuples — append_many round 16)
    w.append_many([o.filter(F.col("o_orderdate") == day) for day in days])
    pruned = scan_iceberg_table(spark, tmp, hidden_filter={"o_orderdate": days[-1]})
    assert len(pruned.inputFiles()) == 1  # 1 of len(days) — hidden pruning
    back = pruned.select(
        "o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_month_partitioned",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_orderdate = TIMESTAMP '1995-03-05'
""",
)
def source_iceberg_month_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MONTHLY hidden partitioning — the single most common event-table
    layout after daily (VERDICT r13 #4): the table is partitioned by
    months(o_orderdate), manifest partition structs carry the spec's
    epoch-month encoding ((year−1970)·12 + month−1; 1995-03 → 302,
    asserted), and a query filtering on the SOURCE column opens only the
    matching month's file (input-file count asserted, 1 of 4) with the
    exact row residual applied. years()/hours() take the same dispatch
    (spec-vector unit tests pin all three encodings incl. pre-1970
    floors).

    Scale: a WHERE ts = ... on a 100 TB month-partitioned table touches
    one month's files via the driver metadata walk — identical cost
    shape to the days() twin above."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        read_table_metadata,
        scan_iceberg_table,
    )

    o = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between(
                "1995-01-01 00:00:00", "1995-04-30 23:59:59"
            )
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )
    tmp = tempfile.mkdtemp(prefix="iceberg-monthly-")
    w = IcebergTableWriter(spark, tmp, partition_by=["months(o_orderdate)"])
    # one append per month, a real writer's tuples — all four staged in
    # ONE write job (footer-derived month-transform tuples, round 16)
    w.append_many([o.filter(F.month("o_orderdate") == m) for m in (1, 2, 3, 4)])
    spec = read_table_metadata(tmp)["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "month" and spec["name"] == "o_orderdate_month"
    months = sorted(
        f["partition"]["o_orderdate_month"]
        for f in iceberg_snapshot_files(tmp)[0]
    )
    assert months == [300, 301, 302, 303]  # (1995−1970)·12 + (m−1)
    import datetime

    pruned = scan_iceberg_table(
        spark, tmp,
        hidden_filter={"o_orderdate": datetime.datetime(1995, 3, 5)},
    )
    assert len(pruned.inputFiles()) == 1  # March only — month pruning
    back = pruned.select(
        "o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_files_table",
    oracle="""
SELECT CAST(0 AS INTEGER) AS content, 'PARQUET' AS file_format,
       n_regionkey, CAST(count(*) AS BIGINT) AS record_count
FROM nation GROUP BY n_regionkey
""",
)
def source_iceberg_files_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``t.files`` METADATA TABLE over the real v2 layout:
    content/path/format/partition/record_count/size/sequence_number rows
    built from one manifest walk — zero data-file IO, like Iceberg's own
    FilesTable. The fixture is a region-partitioned nation (five appends);
    the key projects the deterministic columns (content, format, typed
    partition value, per-file record count) and the oracle recomputes the
    per-region counts relationally.

    Scale: a 100 TB table's files table is O(files) metadata rows — the
    same walk every scan plans with, parallelized via createDataFrame,
    never touching data bytes."""
    from ..catalog.iceberg_format import IcebergTableWriter, iceberg_metadata_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-files-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many([n.filter(F.col("n_regionkey") == rk) for rk in range(5)])
    mt = iceberg_metadata_table(spark, tmp, "files")
    back = mt.select(
        "content",
        "file_format",
        F.element_at("partition", "n_regionkey").cast("int").alias("n_regionkey"),
        "record_count",
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_snapshots_table",
    oracle="""
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'append',  false),
  (CAST(2 AS BIGINT), 'append',  true),
  (CAST(3 AS BIGINT), 'replace', true)
) AS t(sequence_number, operation, has_parent)
""",
)
def source_iceberg_snapshots_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``t.snapshots`` / ``t.history`` metadata tables
    over the real layout: the fixture commits append → append →
    rewrite_data (a ``replace`` snapshot), and the key returns each
    snapshot's sequence number, operation, and parent linkage
    (parent-snapshot-id chains every snapshot to its predecessor — the
    lineage ``t.history``'s is_current_ancestor walks). The history
    table's full-ancestry invariant is asserted mid-flow; timestamps stay
    out of the compared columns (engine-run-dependent).

    Scale: O(snapshots) metadata rows from the already-loaded
    metadata.json — no manifest or data IO at any table size."""
    from ..catalog.iceberg_format import IcebergTableWriter, iceberg_metadata_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-snaps-")
    w = IcebergTableWriter(spark, tmp)
    # both appends staged in ONE write job
    w.append_many([n.filter("n_nationkey < 12"), n.filter("n_nationkey >= 12")])
    w.rewrite_data()
    from .util import bounded_rows

    hist = iceberg_metadata_table(spark, tmp, "history")
    assert [bool(r["is_current_ancestor"]) for r in bounded_rows(hist)] == [True] * 3
    back = iceberg_metadata_table(spark, tmp, "snapshots").select(
        "sequence_number",
        "operation",
        F.col("parent_id").isNotNull().alias("has_parent"),
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_partitioned",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def source_delta_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a PARTITIONED Delta table (metaData.partitionColumns): per the
    protocol the partition column lives only in the log's per-file
    partitionValues, NOT in the data files — the reader re-injects it as a
    typed literal column per partition group, and `partition_filter`
    prunes files straight from the log metadata (asserted mid-flow: the
    filtered scan's input files are exactly one partition's). Completes
    the Delta reader scope the round-6 verdict called honest-but-refused.

    Scale: the log IS the partition index — a selective scan reads only
    matching partitions' files, zero IO on the rest; injected literals
    constant-fold residual partition predicates in Catalyst."""
    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-part-")
    w = DeltaTableWriter(spark, tmp)
    from .util import bounded_rows

    regions = sorted(
        r["n_regionkey"] for r in bounded_rows(n.select("n_regionkey").distinct())
    )
    for i, rk in enumerate(regions):
        w.commit(
            add_dfs=[n.filter(F.col("n_regionkey") == rk)],
            partition_cols=["n_regionkey"] if i == 0 else None,
        )
    pruned = scan_delta_table(spark, tmp, partition_filter={"n_regionkey": "2"})
    assert len(pruned.inputFiles()) == 1  # log-level pruning: 1 of 5 files
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "sink_iceberg_add_files",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def sink_iceberg_add_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_files on the REAL layout (stock Iceberg's CALL
    system.add_files): pre-existing parquet registers as one append
    snapshot at metadata cost — a footer read per file for the schema
    gate, record count, and manifest column bounds; zero data rewritten
    (the imported file's path is referenced in place, asserted mid-flow).
    Legacy-lake import: a parquet directory becomes an Iceberg table for
    the price of its footers; the imported files immediately join stats
    skipping and time travel like any written file.

    Scale: O(files) footer reads and one manifest write — table size
    never enters the cost."""
    import re as _re

    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table
    from ..catalog.parquet_io import write_single_parquet

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-addfiles-")
    legacy = f"{tmp}/legacy-low.parquet"
    write_single_parquet(n.filter("n_nationkey < 12"), legacy)
    w = IcebergTableWriter(spark, f"{tmp}/table")
    w.append(n.filter("n_nationkey >= 12"))
    w.add_files([legacy])
    full = scan_iceberg_table(spark, f"{tmp}/table")
    norm = {_re.sub("^file:/+", "/", p) for p in full.inputFiles()}
    assert legacy in norm  # referenced IN PLACE — no copy, no rewrite
    back = full.select("n_nationkey", "n_name", "n_regionkey")
    return _materialize(spark, back, tmp)


@register(
    "sink_iceberg_add_files_transform",
    oracle="""
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20
""",
)
def sink_iceberg_add_files_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_files into TRANSFORM-partitioned Iceberg tables (VERDICT r8
    #7): the partition value derives from the file's own footer bounds —
    bucket[N] demands min == max (the murmur3 hash is not monotone, a
    range proves nothing) and hashes the proven single value; days() is
    MONOTONE, so transform(min) == transform(max) proves single-day
    membership even when the raw timestamps span hours. Imported files
    join hidden_filter pruning immediately (asserted: a source-column
    predicate opens only the matching file). Straddling files refuse
    loudly.

    Scale: still footer-cost registration — the transform applies to two
    bound values per file, never to rows."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_bucket,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )
    from ..catalog.parquet_io import write_single_parquet

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="iceberg-addtransform-")
    # bucket[4]: legacy single-key files hash to their proven value
    wb = IcebergTableWriter(
        spark, f"{tmp}/bucketed", partition_by=["bucket(n_nationkey, 4)"]
    )
    wb.append(n.filter("n_nationkey = 0"))
    legacy7 = f"{tmp}/legacy-7.parquet"
    write_single_parquet(n.filter("n_nationkey = 7"), legacy7)
    wb.add_files([legacy7])
    files, _ = iceberg_snapshot_files(f"{tmp}/bucketed")
    by_path = {f["file_path"]: f["partition"] for f in files}
    assert by_path[legacy7] == {
        "n_nationkey_bucket": iceberg_bucket(7, 4, "int")
    }
    pruned = scan_iceberg_table(
        spark, f"{tmp}/bucketed", hidden_filter={"n_nationkey": 7}
    )
    assert legacy7 in {
        __import__("re").sub("^file:/+", "/", p) for p in pruned.inputFiles()
    }
    # days(ts): seed day 1, import an hour-spanning day-2 file — the
    # monotone proof accepts min != max within one day. The legacy file
    # is written by pyarrow (an external writer with TIMESTAMP_MICROS
    # footer stats — Spark's INT96 default writes none, and a statless
    # ts column refuses loudly, the right behavior for a derivation)
    import datetime as _dt

    import pyarrow as _pa
    import pyarrow.parquet as _papq

    wd = IcebergTableWriter(spark, f"{tmp}/daily", partition_by=["days(ts)"])
    wd.append(
        n.filter(F.col("n_nationkey") < 10).withColumn(
            "ts",
            F.to_timestamp(F.lit("1994-01-01 00:00:00"))
            + F.make_interval(hours=F.col("n_nationkey") % 10),
        )
    )
    day2 = sorted(
        (int(r["n_nationkey"]), r["n_name"])
        for r in bounded_rows(
            n.filter(F.col("n_nationkey").between(10, 19))
        )
    )
    base = _dt.datetime(1994, 1, 2)
    legacy_day2 = f"{tmp}/legacy-day2.parquet"
    _papq.write_table(
        _pa.table(
            {
                "n_nationkey": _pa.array([k for k, _ in day2], _pa.int32()),
                "n_name": _pa.array([v for _, v in day2], _pa.string()),
                "ts": _pa.array(
                    [base + _dt.timedelta(hours=k % 10) for k, _ in day2],
                    _pa.timestamp("us"),
                ),
            }
        ),
        legacy_day2,
    )
    wd.add_files([legacy_day2])
    dfiles, _ = iceberg_snapshot_files(f"{tmp}/daily")
    days = sorted(f["partition"]["ts_day"] for f in dfiles)
    assert days[1] == days[0] + 1  # day-2 import landed in its own tuple
    back = scan_iceberg_table(spark, f"{tmp}/daily").select(
        "n_nationkey", "n_name"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_iceberg_merge_cow",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey IN (3, 13)
            THEN 'UPDATED_' || CAST(n_nationkey AS VARCHAR)
            ELSE n_name END AS n_name
FROM nation
UNION ALL
SELECT CAST(25 AS INTEGER), 'NEW_25'
""",
)
def dml_iceberg_merge_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the real Iceberg layout, copy-on-write at
    TOUCHED-FILE granularity (the Iceberg pair of dml_delta_merge_cow):
    upserting keys {3, 13} and inserting 25 into a 3-file table rewrites
    ONLY the two files holding matched keys — affected manifests carry
    DELETED/EXISTING statuses, the untouched file survives in place
    (asserted) — and the surviving + source rows land in one ADDED file
    under an `overwrite` snapshot.

    Scale: cost tracks touched files; the key probe is one pushdown
    broadcast semi-join emitting file paths."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_data_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="iceberg-mergecow-")
    w = IcebergTableWriter(spark, tmp)
    w.append_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    source = local_df(spark, 
        [(3, "UPDATED_3"), (13, "UPDATED_13"), (25, "NEW_25")],
        "n_nationkey int, n_name string",
    )
    pre_paths = {f["file_path"] for f in iceberg_data_files(tmp)}
    w.merge_upsert_cow(source, ["n_nationkey"])
    post_paths = {f["file_path"] for f in iceberg_data_files(tmp)}
    assert len(pre_paths & post_paths) == 1  # only the 20-24 file untouched
    back = scan_iceberg_table(spark, tmp).select("n_nationkey", "n_name")
    return _materialize(spark, back, tmp)


@register(
    "dml_iceberg_merge_mor",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey IN (3, 13)
            THEN 'UPDATED_' || CAST(n_nationkey AS VARCHAR)
            ELSE n_name END AS n_name
FROM nation
UNION ALL
SELECT CAST(25 AS INTEGER), 'NEW_25'
""",
)
def dml_iceberg_merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ upsert on the real Iceberg layout — the shape
    Iceberg's streaming/CDC writers (Flink equality-delete mode) emit,
    and the dual of dml_iceberg_merge_cow: ONE ``overwrite`` snapshot
    carries an EQUALITY delete file for the source keys plus the source
    rows as a new data file; ZERO existing files are read or rewritten
    (asserted: every pre-merge data file is still live). The delete
    kills old key versions only in STRICTLY older sequence numbers, so
    the new file's own rows survive — the spec's sequence scoping is
    what makes the one-snapshot upsert sound.

    Scale: commit cost is source-proportional; a 10-row upsert into a
    100 TB table writes one tiny delete file + one data file and touches
    no data — the write-amplification-free path CoW can't offer."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        read_table_metadata,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="iceberg-mergemor-")
    w = IcebergTableWriter(spark, tmp)
    w.append_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    pre_data, pre_del = iceberg_snapshot_files(tmp)
    assert pre_del == []
    source = local_df(spark,
        [(3, "UPDATED_3"), (13, "UPDATED_13"), (25, "NEW_25")],
        "n_nationkey int, n_name string",
    )
    w.merge_upsert_mor(source, ["n_nationkey"])
    post_data, post_del = iceberg_snapshot_files(tmp)
    pre_paths = {f["file_path"] for f in pre_data}
    assert pre_paths <= {f["file_path"] for f in post_data}  # zero rewrites
    assert len(post_del) == 1 and post_del[0]["content"] == 2
    assert post_del[0]["equality_ids"] == [1]  # n_nationkey's field id
    meta = read_table_metadata(tmp)
    assert len(meta["snapshots"]) == 4  # 3 appends + ONE merge snapshot
    back = scan_iceberg_table(spark, tmp).select("n_nationkey", "n_name")
    return _materialize(spark, back, tmp)


@register(
    "dml_iceberg_merge_mor_partitioned",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey IN (3, 13)
            THEN 'UPDATED_' || CAST(n_nationkey AS VARCHAR)
            ELSE n_name END AS n_name,
       n_regionkey
FROM nation
UNION ALL
SELECT CAST(25 AS INTEGER), 'NEW_25', CAST(2 AS INTEGER)
""",
)
def dml_iceberg_merge_mor_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGE-ON-READ upsert on an identity-PARTITIONED Iceberg table
    (VERDICT r9 #2) — the Flink/CDC equality-delete upsert writer's
    default production shape (Iceberg 1.4.3 v2, the version the
    reference pins in pom.xml:18): ONE ``overwrite`` snapshot carries
    per-partition-tuple data files AND partition-scoped equality-delete
    files (partition source columns required in the merge key, so each
    delete file's scope derives from its own rows), all written in ONE
    distributed job grouped by tuple; ZERO existing files rewritten
    (asserted). Scans prune the delete manifests with the data manifests
    under partition filters — the typed partition struct rides every
    delete-file manifest entry.

    Scale: commit cost is source-proportional with one shuffle; a
    cross-partition CDC batch touching 10k tuples is one Spark job, not
    10k driver-loop writes."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-mergemor-part-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many([n.filter(F.col("n_regionkey") == rk) for rk in range(5)])
    pre_data, pre_del = iceberg_snapshot_files(tmp)
    assert pre_del == []
    source = n.filter(F.col("n_nationkey").isin(3, 13)).withColumn(
        "n_name",
        F.concat(F.lit("UPDATED_"), F.col("n_nationkey").cast("string")),
    ).unionByName(
        local_df(
            spark,
            [(25, "NEW_25", 2)],
            "n_nationkey int, n_name string, n_regionkey int",
        )
    )
    w.merge_upsert_mor(source, ["n_nationkey", "n_regionkey"])
    post_data, post_del = iceberg_snapshot_files(tmp)
    pre_paths = {f["file_path"] for f in pre_data}
    assert pre_paths <= {f["file_path"] for f in post_data}  # zero rewrites
    src_rks = {
        r["n_regionkey"]
        for r in bounded_rows(source.select("n_regionkey").distinct())
    }
    assert all(f["content"] == 2 for f in post_del)
    assert {
        f["partition"]["n_regionkey"] for f in post_del
    } == src_rks  # one partition-scoped delete file per touched tuple
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_iceberg_delete_mor",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (5, 11)
""",
)
def dml_iceberg_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-level merge-on-read DELETE on the real Iceberg layout —
    what stock Iceberg's DELETE FROM plans in merge-on-read mode (the
    MoR dual of dml_iceberg_delete_cow): the probe finds matching rows'
    (file, ordinal) pairs and commits POSITION delete files, partition-
    scoped per the target files' tuples on this identity-partitioned
    fixture; ZERO data files are read again or rewritten (every
    pre-delete file still live, asserted), and the delete files carry
    typed partition structs so partition-filtered scans prune them too.

    Scale: one pushdown probe + deleted-row-proportional delete
    metadata — the rewrite-free DELETE shape."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-delmor-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many([n.filter(F.col("n_regionkey") == rk) for rk in range(5)])
    pre, _ = iceberg_snapshot_files(tmp)
    w.delete_where_mor("n_nationkey in (5, 11)")
    post, dels = iceberg_snapshot_files(tmp)
    assert {f["file_path"] for f in pre} <= {f["file_path"] for f in post}
    # one partition-scoped delete file per touched tuple (5->r0, 11->r1)
    assert sorted(
        f["partition"]["n_regionkey"] for f in dels
    ) == [0, 1]
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_iceberg_delete_cow",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (13, 14)
""",
)
def dml_iceberg_delete_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY-ON-WRITE DELETE on the real Iceberg layout — the spec's
    delete-by-rewrite (what stock Iceberg plans in copy-on-write mode,
    the MoR position/equality delete files' dual): only the file holding
    the matched keys rewrites; its manifest is rewritten with
    DELETED/EXISTING statuses and resolved sequence numbers, the two
    untouched files survive in place (asserted), the surviving rows land
    in one new ADDED file under an `overwrite` snapshot, and time travel
    to the pre-delete snapshot still sees every row (asserted).

    Scale: touched-file-proportional — the probe pushes the predicate
    into the scan; manifest rewrites are metadata-sized."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_data_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-cow-")
    w = IcebergTableWriter(spark, tmp)
    w.append_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    pre_paths = {f["file_path"] for f in iceberg_data_files(tmp)}
    pre_snap = w._current_snapshot_id
    w.delete_where_cow("n_nationkey in (13, 14)")
    post_paths = {f["file_path"] for f in iceberg_data_files(tmp)}
    assert len(pre_paths & post_paths) == 2  # untouched files in place
    assert scan_iceberg_table(spark, tmp, snapshot_id=pre_snap).count() == n.count()
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_delta_merge_cow",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey IN (3, 13)
            THEN 'UPDATED_' || CAST(n_nationkey AS VARCHAR)
            ELSE n_name END AS n_name
FROM nation
UNION ALL
SELECT CAST(25 AS INTEGER), 'NEW_25'
""",
)
def dml_delta_merge_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE on the real Delta log, copy-on-write at TOUCHED-FILE
    granularity (stock Delta's merge planning): upserting keys {3, 13}
    and inserting key 25 into a 3-file table rewrites ONLY the two files
    holding the matched keys (removed-file count asserted; the untouched
    file keeps serving reads in place) and records cdc change rows
    (update_postimage + insert) in the same commit so CDF readers see the
    merge without derivation.

    Scale: cost tracks touched files, never table size — a 10-row upsert
    into a 100 TB table rewrites the handful of files those keys live in;
    the touched-file probe is one pushdown semi-join emitting paths."""
    import json as _json

    from ..catalog.delta_format import (
        DeltaTableWriter,
        _commit_path,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="delta-merge-")
    w = DeltaTableWriter(spark, tmp)
    w.commit_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    source = local_df(spark, 
        [(3, "UPDATED_3"), (13, "UPDATED_13"), (25, "NEW_25")],
        "n_nationkey int, n_name string",
    )
    v = w.merge_upsert(source, ["n_nationkey"])
    acts = [
        _json.loads(line)
        for line in open(_commit_path(tmp, v)).read().splitlines()
        if line.strip()
    ]
    removed = [a["remove"]["path"] for a in acts if "remove" in a]
    assert len(removed) == 2  # only the two touched files rewrote
    back = scan_delta_table(spark, tmp).select("n_nationkey", "n_name")
    return _materialize(spark, back, tmp)


@register(
    "dml_delta_merge_conditional",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey = 3 THEN 'UPD_3' ELSE n_name END AS n_name
FROM nation
WHERE n_nationkey <> 13
UNION ALL
SELECT CAST(25 AS INTEGER), 'NEW_25'
""",
)
def dml_delta_merge_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General-clause MERGE on the real Delta log (round 15 —
    DeltaTableWriter.merge_clauses over the shared clause engine): the
    CDC-consumer shape ``WHEN MATCHED AND s.op = 'D' THEN DELETE / WHEN
    MATCHED THEN UPDATE SET n_name = s.n_name / WHEN NOT MATCHED AND
    s.op <> 'D' THEN INSERT (...)`` — copy-on-write at touched-file
    granularity: only the two files holding victim keys {3, 13} rewrite
    (removed-file count asserted), the third file is never read twice.
    The commit's CDC change file carries stock's exact MERGE rows —
    asserted PAIRED: one update_preimage + one update_postimage (key 3),
    one delete (key 13), one insert (key 25); the not-matched 'D' row
    (key 26) appears nowhere.

    Scale: victim-file-proportional, same cost shape as
    dml_delta_merge_cow; the conditional resolution adds no extra scan
    — victims, survivors, images, and CDC rows all derive from ONE
    rescan of the touched files."""
    import json as _json

    from ..catalog.delta_format import (
        DeltaTableWriter,
        _commit_path,
        scan_delta_table,
    )
    from ..catalog.merge_clauses import MergeClause

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="delta-mergecond-")
    w = DeltaTableWriter(spark, tmp)
    w.commit_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    source = local_df(spark,
        [(3, "UPD_3", "U"), (13, "GONE", "D"),
         (25, "NEW_25", "U"), (26, "SKIP", "D")],
        "n_nationkey int, n_name string, op string",
    )
    v = w.merge_clauses(source, ["n_nationkey"], [
        MergeClause("matched", "delete", condition="s.op = 'D'"),
        MergeClause("matched", "update", assignments={"n_name": "s.n_name"}),
        MergeClause("not_matched", "insert", condition="s.op <> 'D'",
                    assignments={"n_nationkey": "s.n_nationkey",
                                 "n_name": "s.n_name"}),
    ])
    acts = [
        _json.loads(line)
        for line in open(_commit_path(tmp, v)).read().splitlines()
        if line.strip()
    ]
    removed = [a["remove"]["path"] for a in acts if "remove" in a]
    assert len(removed) == 2  # only the two victim files rewrote
    cdc_rels = [a["cdc"]["path"] for a in acts if "cdc" in a]
    assert cdc_rels
    changes = spark.read.parquet(
        *[os.path.join(tmp, rel) for rel in cdc_rels]
    )
    by_type = {
        r["_change_type"]: r["count"]
        for r in bounded_rows(changes.groupBy("_change_type").count())
    }
    assert by_type == {
        "update_preimage": 1, "update_postimage": 1,
        "delete": 1, "insert": 1,
    }, by_type
    back = scan_delta_table(spark, tmp).select("n_nationkey", "n_name")
    return _materialize(spark, back, tmp)


@register(
    "dml_delta_merge_dv",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey = 13 THEN 'UPDATED_13' ELSE n_name END AS n_name
FROM nation WHERE n_nationkey NOT IN (5, 12)
UNION ALL SELECT CAST(5 AS INTEGER), 'NEW_5'
UNION ALL SELECT CAST(25 AS INTEGER), 'NEW_25'
""",
)
def dml_delta_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE over a Delta table carrying DELETION VECTORS (VERDICT r8 #1
    — DVs are default-on in modern Delta and MERGE is the #1 DML; stock
    merge-on-DV semantics per PROTOCOL.md): rows 5 and 12 are first
    MoR-deleted via DVs (two files gain descriptors), then the merge
    upserts {5, 13, 25}. The DV-masked rows are LIVE-ROW-invisible to
    the probe, so key 5 classifies as an INSERT (its only physical row
    is deleted — no match, no resurrection), key 13 matches live and
    updates, and the touched file's rewrite MATERIALIZES its DV away
    (row 12 stays gone, the new add carries no descriptor) while the
    untouched file keeps its DV serving reads in place.

    Scale: identical cost shape to dml_delta_merge_cow — the DV
    anti-join adds one deleted-row-proportional equi-join to the
    touched-file probe, never a second table scan."""
    import json as _json
    import os as _os

    from ..catalog.delta_format import (
        DeltaTableWriter,
        _commit_path,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="delta-merge-dv-")
    w = DeltaTableWriter(spark, tmp)
    w.commit_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    # locate (file, ordinal) for keys 5 and 12 in ONE metadata-column scan
    state = read_delta_log(tmp)
    raw = spark.read.parquet(
        *[_os.path.join(tmp, rel) for rel in state["files"]]
    ).withColumns(
        {
            "_file": F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/+", "/"
            ),
            "_pos": F.col("_metadata.row_index"),
        }
    )
    abs_to_rel = {_os.path.join(tmp, rel): rel for rel in state["files"]}
    hits = bounded_rows(
        raw.filter(F.col("n_nationkey").isin(5, 12)).select("_file", "_pos")
    )
    for r in hits:
        w.delete_rows(abs_to_rel[r["_file"]], [r["_pos"]])
    source = local_df(spark,
        [(5, "NEW_5"), (13, "UPDATED_13"), (25, "NEW_25")],
        "n_nationkey int, n_name string",
    )
    v = w.merge_upsert(source, ["n_nationkey"])
    acts = [
        _json.loads(line)
        for line in open(_commit_path(tmp, v)).read().splitlines()
        if line.strip()
    ]
    # only the file holding LIVE key 13 rewrote; masked key 5 touched nothing
    assert len([a for a in acts if "remove" in a]) == 1
    post = read_delta_log(tmp)
    dv_files = {
        rel for rel, a in post["files"].items() if a.get("deletionVector")
    }
    assert len(dv_files) == 1  # untouched file keeps its DV ...
    new_adds = [a["add"]["path"] for a in acts if "add" in a]
    assert not (dv_files & set(new_adds))  # ... the rewrite carries none
    back = scan_delta_table(spark, tmp).select("n_nationkey", "n_name")
    return _materialize(spark, back, tmp)


@register(
    "dml_delta_delete_dv",
    oracle="""
SELECT n_nationkey, n_name FROM nation WHERE n_nationkey NOT IN (5, 12)
""",
)
def dml_delta_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE WHERE via DELETION VECTORS — stock Delta's merge-on-read
    DELETE plan on DV-enabled tables: the matching rows' ordinals fold
    into their files' DVs (remove + re-add of the same paths, ZERO data
    rewritten — every pre-delete data file is still live, asserted) and
    protocol cdc ``delete`` rows ride the same commit for CDF readers.

    Scale: one pushdown probe scan; DV payload + cdc bytes are
    deleted-row-proportional — the write-amplification-free DELETE a
    100 TB table needs."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="delta-deldv-")
    w = DeltaTableWriter(spark, tmp)
    w.commit_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    pre = set(read_delta_log(tmp)["files"])
    w.delete_where_dv("n_nationkey in (5, 12)")
    post = read_delta_log(tmp)["files"]
    assert set(post) == pre  # zero rewrites: same live paths, now DV'd
    assert sum(1 for a in post.values() if a.get("deletionVector")) == 2
    back = scan_delta_table(spark, tmp).select("n_nationkey", "n_name")
    return _materialize(spark, back, tmp)


@register(
    "dml_delta_update_dv",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey IN (7, 13)
            THEN 'UP_' || CAST(n_nationkey AS VARCHAR)
            ELSE n_name END AS n_name
FROM nation
""",
)
def dml_delta_update_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE WHERE via DELETION VECTORS — stock Delta's merge-on-read
    UPDATE on DV-enabled tables: matched rows' OLD ordinals fold into
    their files' DVs and the UPDATED values append as ONE new data file
    in the same commit; untouched rows are never rewritten (every
    pre-update file still live, asserted; exactly one new file). Paired
    cdc update_preimage/update_postimage rows ride the commit.

    Scale: matched-rows-proportional — the rewrite-free UPDATE dual of
    dml_delta_delete_dv."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="delta-updv-")
    w = DeltaTableWriter(spark, tmp)
    w.commit_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    pre = set(read_delta_log(tmp)["files"])
    w.update_where_dv(
        "n_nationkey in (7, 13)",
        {"n_name": "concat('UP_', n_nationkey)"},
    )
    post = read_delta_log(tmp)["files"]
    assert pre <= set(post)  # old files all live (DV'd), none rewritten
    assert len(post) == len(pre) + 1  # plus ONE updated-rows file
    back = scan_delta_table(spark, tmp).select("n_nationkey", "n_name")
    return _materialize(spark, back, tmp)


@register(
    "maint_delta_reorg_purge",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (5, 11)
""",
)
def maint_delta_reorg_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORG TABLE ... APPLY (PURGE) — stock Delta's targeted DV
    materialization: after MoR deletes leave vectors on two partitions'
    files, the purge rewrites ONLY those files into DV-free ones (per
    tuple, one partitionBy job) under a dataChange=false commit;
    untouched partitions keep their original files in place (asserted),
    the post state carries no deletionVector anywhere, and the visible
    rows are provably unchanged.

    Scale: IO tracks the DV-carrying files, never table size — the
    targeted dual of full OPTIMIZE and the protocol's path to dropping
    the deletionVectors reader requirement."""
    import json as _json
    import os as _os

    from ..catalog.delta_format import (
        DeltaTableWriter,
        _commit_path,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="delta-reorg-")
    w = DeltaTableWriter(spark, tmp)
    for i, rk in enumerate(range(5)):
        w.commit(
            add_dfs=[n.filter(F.col("n_regionkey") == rk)],
            partition_cols=["n_regionkey"] if i == 0 else None,
        )
    pre = read_delta_log(tmp)["files"]
    w.delete_where_dv("n_nationkey in (5, 11)")  # DVs on regions 0 and 1
    v = w.reorg_purge()
    post = read_delta_log(tmp)["files"]
    assert all(a.get("deletionVector") is None for a in post.values())
    untouched = {
        rel
        for rel, a in pre.items()
        if a["partitionValues"]["n_regionkey"] not in ("0", "1")
    }
    assert untouched <= set(post)  # other partitions never rewrote
    acts = [
        _json.loads(line)
        for line in open(_commit_path(tmp, v)).read().splitlines()
        if line.strip()
    ]
    assert all(
        a["add"]["dataChange"] is False for a in acts if "add" in a
    ) and all(
        a["remove"]["dataChange"] is False for a in acts if "remove" in a
    )
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_delta_merge_partitioned",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey IN (0, 1)
            THEN 'UPDATED_' || CAST(n_nationkey AS VARCHAR)
            ELSE n_name END AS n_name,
       n_regionkey
FROM nation WHERE n_regionkey < 3
UNION ALL
SELECT CAST(25 AS INTEGER), 'NEW_25', CAST(2 AS INTEGER)
""",
)
def dml_delta_merge_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE over a PARTITIONED real Delta table (VERDICT r7 #4 — real
    tables are partitioned, MERGE is the #1 DML): with the partition
    column in the merge key, the touched-file probe is PARTITION-PRUNED
    from the log before any data IO — upserting nations 0 (region 0) and
    1 (region 1) plus inserting key 25 into region 2 removes ONLY the two
    matched partitions' files (asserted); region 2's original file keeps
    serving reads in place, and the insert lands as a NEW per-tuple file
    beside it. CDC preimage + postimage + insert rows ride the same
    commit, derived from touched files only.

    Scale: probe IO = candidate partitions' files, rewrite IO = touched
    files — both independent of table size; the log is the partition
    index (stock Delta's merge planning)."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    n = n.filter("n_regionkey < 3")
    tmp = tempfile.mkdtemp(prefix="delta-mergepart-")
    w = DeltaTableWriter(spark, tmp)
    for i, rk in enumerate(range(3)):
        w.commit(
            add_dfs=[n.filter(F.col("n_regionkey") == rk)],
            partition_cols=["n_regionkey"] if i == 0 else None,
        )
    pre = read_delta_log(tmp)["files"]
    source = local_df(spark, 
        [(0, "UPDATED_0", 0), (1, "UPDATED_1", 1), (25, "NEW_25", 2)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    w.merge_upsert(source, ["n_nationkey", "n_regionkey"])
    post = read_delta_log(tmp)["files"]
    removed = set(pre) - set(post)
    assert len(removed) == 2  # only regions 0 and 1's files rewrote
    assert {pre[r]["partitionValues"]["n_regionkey"] for r in removed} == {
        "0",
        "1",
    }
    # region 2 keeps its original file AND gains the insert's new file
    by_region: dict[str, int] = {}
    for a in post.values():
        rk = a["partitionValues"]["n_regionkey"]
        by_region[rk] = by_region.get(rk, 0) + 1
    assert by_region == {"0": 1, "1": 1, "2": 2}
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_delta_merge_column_mapping",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey = 13 THEN 'UP_13' ELSE n_name END
         AS nation_name
FROM nation
UNION ALL
SELECT CAST(30 AS INTEGER), 'NEW_30'
""",
)
def dml_delta_merge_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE over a COLUMN-MAPPED Delta table (the second half of
    VERDICT r7's 'DML over partitioned / column-mapped Delta' gap): the
    touched-file probe rides the logical-name scan — physical col-uuid
    names stay in the data files, commit maps the rewritten rows back —
    and renames COMPOSE with DML: after a metadata-only rename, the merge
    addresses the NEW logical name. Only the matched key's file rewrites
    (asserted); paired CDC rows ride the commit.

    Scale: identical to the unmapped merge — touched-file-proportional;
    the name mapping is a projection in the scan/commit, zero extra IO."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="delta-mergecm-")
    w = DeltaTableWriter(spark, tmp, column_mapping=True)
    w.commit_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    w.rename_column("n_name", "nation_name")  # metadata-only
    pre = set(read_delta_log(tmp)["files"])
    source = local_df(spark, 
        [(13, "UP_13"), (30, "NEW_30")], "n_nationkey int, nation_name string"
    )
    w.merge_upsert(source, ["n_nationkey"])
    post = read_delta_log(tmp)["files"]
    assert len(pre & set(post)) == 2  # only the 10-19 file rewrote
    back = scan_delta_table(spark, tmp).select("n_nationkey", "nation_name")
    return _materialize(spark, back, tmp)


@register(
    "dml_delta_merge_column_mapping_id",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey = 13 THEN 'UP_13' ELSE n_name END
         AS nation_name
FROM nation
WHERE n_nationkey NOT IN (4, 7)
UNION ALL
SELECT CAST(30 AS INTEGER), 'NEW_30'
""",
)
def dml_delta_merge_column_mapping_id(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DML over an ID-MODE column-mapped Delta table (columnMapping.mode=
    id — file columns resolve by PARQUET FIELD ID, physicalName never
    consulted): a deletion-vector DELETE then a MERGE, both riding the
    field-id read schema (_file_read_schema), with a metadata-only RENAME
    in between proving the merge addresses the NEW logical name while the
    data files keep their original col-uuid names and footer ids. The
    DV-masked rows are invisible to the merge probe; only the matched
    key's file rewrites (asserted) and its DV materializes away.

    Scale: identical to the name-mode merge — touched-file-proportional;
    id resolution is Spark's native parquet field-id matching, zero extra
    IO (VERDICT r9 #3 read path, extended to the DML matrix)."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="delta-mergecmid-")
    w = DeltaTableWriter(spark, tmp, column_mapping="id")
    w.commit_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    w.delete_where_dv("n_nationkey in (4, 7)")  # MoR: DVs on the 0-9 file
    w.rename_column("n_name", "nation_name")  # metadata-only
    pre = set(read_delta_log(tmp)["files"])
    source = local_df(spark,
        [(13, "UP_13"), (30, "NEW_30")], "n_nationkey int, nation_name string"
    )
    w.merge_upsert(source, ["n_nationkey"])
    post = read_delta_log(tmp)["files"]
    assert len(pre & set(post)) == 2  # only the 10-19 file rewrote
    back = scan_delta_table(spark, tmp).select("n_nationkey", "nation_name")
    return _materialize(spark, back, tmp)


@register(
    "source_delta_history",
    oracle="""
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'WRITE',    1, 0, true),
  (CAST(1 AS BIGINT), 'WRITE',    1, 0, true),
  (CAST(2 AS BIGINT), 'DELETE',   1, 1, true),
  (CAST(3 AS BIGINT), 'OPTIMIZE', 1, 2, false),
  (CAST(4 AS BIGINT), 'RESTORE',  2, 1, true)
) AS t(version, operation, n_added_files, n_removed_files, data_change)
""",
)
def source_delta_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY on the real Delta log — the audit listing every
    table owner reads first: per-commit operation (commitInfo), derived
    add/remove file counts, and the dataChange flag distinguishing
    logical changes from pure maintenance (the OPTIMIZE row shows
    false — the same signal CDF uses to skip it). The fixture's history
    is two writes, a deletion-vector DELETE (remove + DV re-add), an
    OPTIMIZE (2 files collapse to 1, dataChange=false), and a RESTORE
    (the file-set flip back: 2 re-adds, 1 tombstone).

    Scale: O(commits) driver-side JSON metadata, zero data IO — the
    listing stock Delta serves from the same log."""
    from ..catalog.delta_format import DeltaTableWriter, delta_table_history

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="delta-history-")
    w = DeltaTableWriter(spark, tmp)
    w.commit_many(  # both commits staged in ONE write job
        [n.filter("n_nationkey < 12").orderBy("n_nationkey"),
         n.filter("n_nationkey >= 12")]
    )
    w.delete_where_dv("n_nationkey = 3")
    w.optimize()
    w.restore(2)
    back = delta_table_history(spark, tmp).select(
        "version", "operation", "n_added_files", "n_removed_files",
        "data_change",
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_detail",
    oracle="""
SELECT 'parquet' AS format, CAST(3 AS BIGINT) AS num_files,
       'n_regionkey' AS partition_columns,
       'delta.columnMapping.maxColumnId,delta.columnMapping.mode'
         AS configuration_keys,
       CAST(2 AS BIGINT) AS version
""",
)
def source_delta_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE DETAIL on the real Delta log — stock Delta's one-row
    table summary, completing the utility-command triad next to
    DESCRIBE HISTORY and RESTORE: live file count, total bytes,
    partition columns, and configuration keys, all from one metadata
    fold (zero data IO). The fixture is a COLUMN-MAPPED, PARTITIONED
    table (three per-region commits), so the summary surfaces both the
    logical partition column and the protocol's columnMapping
    configuration; the key projects the deterministic columns and
    asserts non-zero bytes mid-flow.

    Scale: the same log fold every scan plans with — O(commits +
    files) metadata at any table size."""
    from ..catalog.delta_format import DeltaTableWriter, delta_table_detail

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="delta-detail-")
    w = DeltaTableWriter(spark, tmp, column_mapping=True)
    for rk in range(3):
        w.commit(
            add_dfs=[n.filter(F.col("n_regionkey") == rk)],
            partition_cols=["n_regionkey"] if rk == 0 else None,
        )
    det = delta_table_detail(spark, tmp)
    assert bounded_rows(det)[0]["size_in_bytes"] > 0
    back = det.select(
        "format",
        "num_files",
        F.concat_ws(",", "partition_columns").alias("partition_columns"),
        F.concat_ws(",", "configuration_keys").alias("configuration_keys"),
        "version",
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_cdc_files",
    oracle="""
SELECT 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version,
       n_nationkey, n_name
FROM nation WHERE n_nationkey >= 12
UNION ALL
SELECT 'delete', CAST(2 AS BIGINT), n_nationkey, n_name
FROM nation WHERE n_nationkey < 5
""",
)
def source_delta_cdc_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Change Data Files (protocol 'Add CDC File'): DML commits
    write their exact change rows under _change_data/ with `cdc` actions,
    and the CDF reader returns those rows directly — pre-empting file-set
    derivation, so a window CROSSING an OPTIMIZE (dataChange=false, no
    cdc) reads cleanly where the derivation reader must refuse. Fixture:
    insert commit (cdc inserts), a partial delete rewriting one file (cdc
    deletes for exactly the removed rows), then OPTIMIZE; the (0, head]
    window returns the inserts + deletes only.

    Scale: CDF IO is the window's change files alone — change-volume-
    proportional at any table size, the protocol's whole point."""
    import json as _json

    from ..catalog.delta_format import (
        DeltaTableWriter,
        _commit_path,
        delta_changes_from_cdc,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="delta-cdc-")
    w = DeltaTableWriter(spark, tmp)
    w.commit(add_dfs=[n.filter("n_nationkey < 12")])  # v0: CDF base
    w.commit_with_cdc(  # v1: insert batch with its cdc rows
        add_dfs=[n.filter("n_nationkey >= 12")],
        cdc_df=n.filter("n_nationkey >= 12").withColumn(
            "_change_type", F.lit("insert")
        ),
    )
    v0_files = [
        _json.loads(line)["add"]["path"]
        for line in open(_commit_path(tmp, 0)).read().splitlines()
        if '"add"' in line
    ]
    w.commit_with_cdc(  # v2: delete keys < 5 = rewrite v0's file
        add_dfs=[n.filter("n_nationkey >= 5 and n_nationkey < 12")],
        remove=v0_files,
        cdc_df=n.filter("n_nationkey < 5").withColumn(
            "_change_type", F.lit("delete")
        ),
    )
    w.optimize()  # v3: dataChange=false — contributes no changes
    assert scan_delta_table(spark, tmp).count() == n.count() - 5
    changes = delta_changes_from_cdc(spark, tmp, 0, 3)
    back = changes.select("_change_type", "_commit_version", "n_nationkey", "n_name")
    return _materialize(spark, back, tmp)


@register(
    "maint_delta_restore",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def maint_delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE ... TO VERSION AS OF on the real Delta log: after a
    destructive remove commit, one METADATA-ONLY restore commit flips the
    live file set back to the pre-delete version (original add actions
    re-added with their stats, newer files tombstoned) — zero data copied,
    history preserved (the pre-restore version stays readable, asserted
    mid-flow), full nation rows back.

    Scale: O(changed files) log actions at any table size — why stock
    RESTORE is instant on 100 TB tables."""
    import json as _json

    from ..catalog.delta_format import (
        DeltaTableWriter,
        _commit_path,
        scan_delta_table,
    )

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-restore-")
    w = DeltaTableWriter(spark, tmp)
    # both commits staged in ONE write job
    w.commit_many([n.filter("n_nationkey < 12"), n.filter("n_nationkey >= 12")])
    v0_files = [
        _json.loads(line)["add"]["path"]
        for line in open(_commit_path(tmp, 0)).read().splitlines()
        if '"add"' in line
    ]
    w.commit(remove=v0_files)  # destructive delete of the low keys
    assert scan_delta_table(spark, tmp).count() < n.count()
    w.restore(1)
    assert scan_delta_table(spark, tmp, version=2).count() < n.count()
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "maint_iceberg_rollback",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey < 12
""",
)
def maint_iceberg_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLBACK on the real Iceberg layout (the rollback_to_snapshot CALL
    procedure): current-snapshot-id and main point back at the first
    snapshot in ONE metadata.json write — zero data or manifest IO, later
    snapshots stay in history (asserted mid-flow), and the next append
    would chain its parent to the rollback target.

    Scale: state is a pointer — rollback of a 100 TB table costs one
    small JSON write, the core of Iceberg's time-travel story."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        read_table_metadata,
        scan_iceberg_table,
    )

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-rollback-")
    w = IcebergTableWriter(spark, tmp)
    # both appends staged in ONE write job
    s1 = w.append_many(
        [n.filter("n_nationkey < 12"), n.filter("n_nationkey >= 12")]
    )[0]
    assert scan_iceberg_table(spark, tmp).count() == n.count()
    w.rollback_to_snapshot(s1)
    md = read_table_metadata(tmp)
    assert md["current-snapshot-id"] == s1
    assert len(md["snapshots"]) == 2  # history intact, pointer moved
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_spec_evolution",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey BETWEEN 10 AND 13
""",
)
def source_iceberg_spec_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION SPEC EVOLUTION on the real layout (ALTER TABLE ADD/DROP
    PARTITION FIELD): identity(n_regionkey) files for regions 0-1 are
    frozen under spec 0, a metadata-only commit installs
    truncate(n_nationkey, 10) as spec 1, and the remaining rows append
    under the new layout — zero data rewritten (spec ids per manifest,
    globally unique partition field ids). hidden_filter then prunes EACH
    FILE BY ITS OWN SPEC: old-spec files are kept and row-filtered, only
    the matching new-spec range file opens (input-file count asserted);
    partition_filter prunes per-file under each file's OWN spec too
    (old-spec identity values compare exactly, field-less files are kept
    and row-filtered).

    Scale: spec evolution is THE mechanism for repartitioning a 100 TB
    table without rewriting it — per-file spec dispatch costs nothing in
    the driver walk, and every spec's transforms keep pruning."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-specevo-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many([n.filter(F.col("n_regionkey") == rk) for rk in (0, 1)])
    w.evolve_partition_spec(["truncate(n_nationkey, 10)"])
    rest = n.filter(F.col("n_regionkey") >= 2)
    w.append_many(
        [rest.filter(F.col("n_nationkey").between(lo, lo + 9)) for lo in (0, 10, 20)]
    )
    assert scan_iceberg_table(spark, tmp).count() == n.count()
    pruned = scan_iceberg_table(spark, tmp, hidden_filter={"n_nationkey": 10})
    # 2 kept old-spec files + exactly 1 of 3 new-spec range files
    assert len(pruned.inputFiles()) == 3
    back = None
    for k in (10, 11, 12, 13):
        part = scan_iceberg_table(
            spark, tmp, hidden_filter={"n_nationkey": k}
        ).select("n_nationkey", "n_name", "n_regionkey")
        back = part if back is None else back.unionByName(part)
    return _materialize(spark, back, tmp)


@register(
    "maint_delta_zorder",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_totalprice <= 60000
""",
)
def maint_delta_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY on the real Delta layout: four interleaved
    commits leave every file spanning the full value space (stats
    skipping provably inert on both dimensions — asserted), then a
    Morton-interleave optimize (8-bit bins over global min/max,
    equal-count key ranges, dataChange=false commit) re-clusters so the
    SAME stats_filter opens strictly fewer files on EITHER dimension
    (asserted) — multi-dimensional skipping linear clustering can't give.

    Scale: one distributed scan+write plus a single min/max pre-pass;
    the Morton key is integer codegen and never reaches the data pages;
    all skipping afterwards is log-fold metadata work."""
    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tmp = tempfile.mkdtemp(prefix="delta-zorder-")
    w = DeltaTableWriter(spark, tmp)
    w.commit_many([o.filter(F.col("o_orderkey") % 4 == m) for m in range(4)])
    pre = scan_delta_table(spark, tmp, stats_filter={"o_totalprice": (None, 60000.0)})
    assert len(pre.inputFiles()) == 4  # interleaved: bounds skip nothing
    w.optimize(zorder_by=["o_custkey", "o_totalprice"], target_files=4)
    n_files = len(scan_delta_table(spark, tmp).inputFiles())
    post = scan_delta_table(
        spark, tmp, stats_filter={"o_totalprice": (None, 60000.0)}
    )
    assert len(post.inputFiles()) < n_files  # z-clustering makes bounds bite
    back = post.select(
        "o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, back, tmp)


@register(
    "maint_iceberg_sort_rewrite",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey BETWEEN 0 AND 5
""",
)
def maint_iceberg_sort_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORT-ORDER compaction on the real layout (stock Iceberg's
    rewrite_data_files sort strategy): three interleaved appends leave
    every file spanning the whole keyspace (stats skipping provably
    inert — asserted), then set_sort_order + rewrite_data(target_files=3)
    produces range-clustered files whose tight manifest bounds let the
    same stats_filter open strictly fewer files (asserted). The persisted
    order lands in metadata's sort-orders.

    Scale: clustering is WHY bounds skipping works at 100 TB — the
    rewrite is one distributed range-partitioned sort-and-write per
    partition, and every later selective scan pays only boundary files."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-sortrw-")
    w = IcebergTableWriter(spark, tmp)
    w.append_many([n.filter(F.col("n_nationkey") % 3 == m) for m in range(3)])
    pre = scan_iceberg_table(spark, tmp, stats_filter={"n_nationkey": (0, 5)})
    assert len(pre.inputFiles()) == 3  # interleaved: bounds skip nothing
    w.set_sort_order(["n_nationkey"])
    w.rewrite_data(target_files=3)
    n_files = len(scan_iceberg_table(spark, tmp).inputFiles())
    post = scan_iceberg_table(spark, tmp, stats_filter={"n_nationkey": (0, 5)})
    assert len(post.inputFiles()) < n_files  # clustering makes bounds bite
    back = post.select("n_nationkey", "n_name", "n_regionkey")
    return _materialize(spark, back, tmp)


@register(
    "maint_iceberg_zorder",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_totalprice <= 60000
""",
)
def maint_iceberg_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER rewrite on the real Iceberg layout (round 15 — stock's
    ``rewrite_data_files(strategy => 'sort', sort_order => zorder(
    c1, c2))``, the Iceberg dual of maint_delta_zorder and the last
    clustering flavor after maint_iceberg_sort_rewrite's linear range
    sort): four interleaved appends leave every file spanning the full
    value space on BOTH probe dimensions (stats skipping provably inert
    — asserted on each), then ``rewrite_data(zorder_by=[o_custkey,
    o_totalprice])`` Morton-clusters through the SHARED z-order engine
    (zorder.py) under a replace snapshot, after which the SAME
    stats_filter opens strictly fewer files on EITHER dimension
    (asserted on each) and the visible rows are unchanged — the
    standard answer to two-column probe workloads.

    Scale: one min/max pre-pass + one quantile pass + one clustered
    distributed write; the Morton key is integer codegen and never
    reaches the data pages; all skipping afterwards is manifest-bounds
    metadata work."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tmp = tempfile.mkdtemp(prefix="iceberg-zorder-")
    w = IcebergTableWriter(spark, tmp)
    w.append_many([o.filter(F.col("o_orderkey") % 4 == m) for m in range(4)])
    for dim, hi in (("o_totalprice", 60000.0), ("o_custkey", 150.0)):
        pre = scan_iceberg_table(spark, tmp, stats_filter={dim: (None, hi)})
        assert len(pre.inputFiles()) == 4  # interleaved: bounds skip nothing
    w.rewrite_data(target_files=4, zorder_by=["o_custkey", "o_totalprice"])
    n_files = len(scan_iceberg_table(spark, tmp).inputFiles())
    for dim, hi in (("o_totalprice", 60000.0), ("o_custkey", 150.0)):
        post = scan_iceberg_table(spark, tmp, stats_filter={dim: (None, hi)})
        assert len(post.inputFiles()) < n_files  # z-clustering bites BOTH dims
    back = scan_iceberg_table(
        spark, tmp, stats_filter={"o_totalprice": (None, 60000.0)}
    ).select("o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("total"))
    return _materialize(spark, back, tmp)


@register(
    "sink_delta_identity_columns",
    oracle="""
SELECT n_nationkey, CAST(10 + 2 * n_nationkey AS BIGINT) AS row_id
FROM nation WHERE n_nationkey < 10
UNION ALL
SELECT n_nationkey, CAST(30 + 2 * (n_nationkey - 10) AS BIGINT)
FROM nation WHERE n_nationkey BETWEEN 10 AND 14
UNION ALL SELECT CAST(98 AS INTEGER), CAST(100 AS BIGINT)
UNION ALL
SELECT n_nationkey, CAST(102 + 2 * (n_nationkey - 15) AS BIGINT)
FROM nation WHERE n_nationkey BETWEEN 15 AND 19
""",
)
def sink_delta_identity_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta IDENTITY COLUMNS (round 15 — protocol ``delta.identity.*``
    field metadata, writer version >= 6 asserted): ``row_id BIGINT
    GENERATED BY DEFAULT AS IDENTITY (START WITH 10 INCREMENT BY 2)``.
    Three writer-allocating appends and one EXPLICIT insert interleave;
    allocation is monotonic from the high-water mark PERSISTED in the
    log's schema metadata (re-stamped by a fresh metaData action on
    every allocating commit — asserted to read back 110), the explicit
    value (100) advances the mark so the next allocation starts past it,
    and all ids are asserted collision-free. Allocation itself is
    distributed: per-partition offsets (O(partitions) driver rows) + a
    partition-local row_number — no global sort, no single-partition
    window; the fixture pins determinism by pre-sorting each add into
    one partition.

    Scale: the high-water-mark protocol is WHY sequential appends never
    collide at any parallelism — each commit reserves
    [hwm + step, hwm + step * n] in metadata before the next reads it."""
    import json as _json

    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey")
    tmp = tempfile.mkdtemp(prefix="delta-identity-")
    w = DeltaTableWriter(spark, tmp)

    def one_part(df):
        return df.repartition(1).sortWithinPartitions("n_nationkey")

    w.commit(
        add_dfs=[one_part(n.filter("n_nationkey < 10"))],
        identity={"row_id": {"start": 10, "step": 2,
                             "allowExplicitInsert": True}},
    )
    w.commit(add_dfs=[one_part(n.filter("n_nationkey between 10 and 14"))])
    w.commit(add_dfs=[local_df(spark, [(98, 100)],
                               "n_nationkey int, row_id long")])
    w.commit(add_dfs=[one_part(n.filter("n_nationkey between 15 and 19"))])
    v0 = [
        _json.loads(line)
        for line in open(
            os.path.join(tmp, "_delta_log", "00000000000000000000.json")
        ).read().splitlines()
        if line.strip()
    ]
    proto = next(a["protocol"] for a in v0 if "protocol" in a)
    assert proto["minWriterVersion"] >= 6  # identity writer feature gate
    schema = _json.loads(read_delta_log(tmp)["schema_json"])
    idmeta = next(
        f["metadata"] for f in schema["fields"] if f["name"] == "row_id"
    )
    assert idmeta["delta.identity.highWaterMark"] == 110  # persisted mark
    back = scan_delta_table(spark, tmp).select("n_nationkey", "row_id")
    n_rows = back.count()
    assert back.select("row_id").distinct().count() == n_rows  # no collisions
    return _materialize(spark, back, tmp)


@register(
    "source_delta_stats_skipping",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey BETWEEN 7 AND 12
""",
)
def source_delta_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DATA SKIPPING (protocol 'Per-file Statistics'): every add
    action carries minValues/maxValues aggregated from the parquet footer
    (zero extra data IO), and the scan's ``stats_filter`` prunes files
    whose range provably misses the predicate — from the log alone, before
    any executor IO — then applies the exact row residual. Five key-ranged
    commits; a BETWEEN 7 AND 12 scan opens only the two straddling files
    (asserted). The Delta pair of source_iceberg_stats_pruning.

    Scale: on a sorted/clustered column this is the difference between
    opening every file of a 100 TB table and opening the boundary files;
    stats ride the log (and its checkpoints), so skipping costs one fold."""
    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-stats-")
    w = DeltaTableWriter(spark, tmp)
    w.commit_many(
        [n.filter(F.col("n_nationkey").between(lo, lo + 4)) for lo in range(0, 25, 5)]
    )
    pruned = scan_delta_table(spark, tmp, stats_filter={"n_nationkey": (7, 12)})
    assert len(pruned.inputFiles()) == 2  # files [5-9] and [10-14] of 5
    back = pruned.select("n_nationkey", "n_name", "n_regionkey")
    return _materialize(spark, back, tmp)


@register(
    "source_delta_generated_partition",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders
WHERE o_orderdate = (
  SELECT max(o_orderdate) FROM orders
  WHERE o_orderdate BETWEEN TIMESTAMP '1995-03-01' AND TIMESTAMP '1995-03-05'
)
""",
)
def source_delta_generated_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED partition columns — Delta's hidden-partitioning analog
    (protocol 'Generated Columns'): the table partitions on
    p_date GENERATED ALWAYS AS (CAST(o_orderdate AS DATE)), recorded as
    ``delta.generationExpression`` field metadata with writer version 4;
    the writer computes the value for each add's partitionValues, and the
    scan's hidden_filter derives partition pruning by EVALUATING the same
    expression over the predicate's literal (exact for equality) — only
    the matching day's file opens (asserted), with the exact source-column
    residual. The Delta pair of source_iceberg_transform_partitioned.

    Scale: the log is the partition index; a WHERE ts = ... over a 100 TB
    generated-date-partitioned table reads one partition's files, the
    derivation being one local one-row projection at plan time."""
    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table
    from .util import bounded_rows

    o = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between("1995-03-01 00:00:00", "1995-03-05 00:00:00")
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )
    days = sorted(
        r[0] for r in bounded_rows(o.select("o_orderdate").distinct(), 10)
    )
    assert len(days) >= 2, "fixture window must span multiple days"
    tmp = tempfile.mkdtemp(prefix="delta-genpart-")
    w = DeltaTableWriter(spark, tmp)
    for i, day in enumerate(days):
        w.commit(
            add_dfs=[o.filter(F.col("o_orderdate") == day)],
            partition_cols=["p_date"] if i == 0 else None,
            generated={"p_date": "CAST(o_orderdate AS DATE)"} if i == 0 else None,
        )
    pruned = scan_delta_table(spark, tmp, hidden_filter={"o_orderdate": days[-1]})
    assert len(pruned.inputFiles()) == 1  # 1 of len(days) — log-level pruning
    back = pruned.select(
        "o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_equality_deletes",
    oracle="""
WITH base AS (
  SELECT n_nationkey, n_name, n_regionkey FROM nation
  WHERE n_nationkey NOT IN (4, 9)
)
SELECT * FROM base
UNION ALL
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey = 4
""",
)
def source_iceberg_equality_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a real Iceberg v2 table carrying an EQUALITY delete file
    (content=2, the value-based delete UPSERT/CDC writers emit): the
    fixture appends nation, commits delete_keys(n_nationkey ∈ {4, 9}),
    then RE-APPENDS key 4 — the scan must drop 4 and 9 from the OLDER
    file (sequence scoping: equality deletes hit strictly-older data
    files only) while the re-appended 4 survives. That asymmetry is the
    spec behavior that makes equality deletes usable as upserts; getting
    it wrong silently loses re-inserted rows.

    Scale: ONE data scan regardless of snapshot count — each row's file
    sequence number attaches via an O(files) broadcast map on
    `_metadata.file_path`, then each delete file is one broadcast
    null-safe anti-join on its equality_ids key columns with the
    `data_seq < delete_seq` residual."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-eqdel-")
    w = IcebergTableWriter(spark, tmp)
    s1 = w.append(n.orderBy("n_nationkey"))
    w.delete_keys(["n_nationkey"], [(4,), (9,)])
    assert scan_iceberg_table(spark, tmp, snapshot_id=s1).count() == 25
    w.append(n.filter(F.col("n_nationkey") == 4))  # newer seq: survives
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_log",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey >= 12
""",
)
def source_delta_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a real Delta Lake transaction log (the second open-table-format
    ingest beside source_iceberg_metadata, per the public Delta PROTOCOL):
    the fixture writes nation as a genuine _delta_log chain — commit 0 adds
    low nations (+protocol/metaData), commit 1 adds the rest, commit 2
    REMOVES commit 0's file — then the engine folds add/remove actions in
    version order (catalog/delta_format.py) and reads the live file set
    through the distributed parquet source. Time travel (version pin before
    the delete) is asserted mid-flow.

    Scale: the log fold is driver-side planning, O(commits+files) small
    JSON reads (real deployments bound the tail with checkpoints — the
    same fold from a parquet base); data files read distributed."""
    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-rt-")
    w = DeltaTableWriter(spark, tmp)
    # both commits staged in ONE write job
    w.commit_many(
        [n.filter(F.col("n_nationkey") < 12), n.filter(F.col("n_nationkey") >= 12)]
    )
    # files added at version 0 (the low nations) get removed at version 2
    import json as _json
    import os as _os

    with open(_os.path.join(tmp, "_delta_log", f"{0:020d}.json")) as f:
        v0_adds = [
            _json.loads(line)["add"]["path"]
            for line in f.read().splitlines()
            if '"add"' in line
        ]
    w.commit(remove=v0_adds)
    assert scan_delta_table(spark, tmp, version=1).count() == 25  # pre-delete
    back = scan_delta_table(spark, tmp).select("n_nationkey", "n_name", "n_regionkey")
    return _materialize(spark, back, tmp)


@register(
    "source_delta_checkpoint",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey >= 12 OR n_nationkey < 3
""",
)
def source_delta_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a CHECKPOINTED Delta log (VERDICT r6 #6 — the mechanism that
    bounds the log walk at scale): the fixture builds the source_delta_log
    chain (adds, then a remove), writes a checkpoint parquet +
    `_last_checkpoint` at version 2, TRUNCATES the pre-checkpoint JSON
    commits (legal once checkpointed — exactly what real Delta log
    cleanup does), then commits one more add. The reader folds checkpoint
    base state + only the post-checkpoint JSON tail; time travel to the
    checkpoint version itself is asserted mid-flow, and the truncated
    pre-checkpoint versions raise loudly (pinned in
    tests/test_delta_format.py).

    Scale: a 10M-commit table folds ONE O(live files)-row parquet plus the
    JSON tail since the last checkpoint — not 10M JSON reads; data files
    still stream through the distributed parquet source."""
    import os as _os

    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-cp-")
    w = DeltaTableWriter(spark, tmp)
    # both add commits staged in ONE write job; v0's add paths read from
    # the already-written v0 log afterwards (same bytes either order)
    w.commit_many(
        [n.filter(F.col("n_nationkey") < 12), n.filter(F.col("n_nationkey") >= 12)]
    )
    import json as _json

    with open(_os.path.join(tmp, "_delta_log", f"{0:020d}.json")) as f:
        v0_adds = [
            _json.loads(line)["add"]["path"]
            for line in f.read().splitlines()
            if '"add"' in line
        ]
    w.commit(remove=v0_adds)
    cp_v = w.checkpoint()
    assert cp_v == 2
    for v in (0, 1):  # truncate pre-checkpoint JSON commits
        _os.remove(_os.path.join(tmp, "_delta_log", f"{v:020d}.json"))
    w.commit(add_dfs=[n.filter(F.col("n_nationkey") < 3)])  # post-cp tail
    assert scan_delta_table(spark, tmp, version=cp_v).count() == 13
    back = scan_delta_table(spark, tmp).select("n_nationkey", "n_name", "n_regionkey")
    return _materialize(spark, back, tmp)


@register(
    "source_delta_deletion_vectors",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (0, 1, 7, 24)
""",
)
def source_delta_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a Delta table carrying DELETION VECTORS — the protocol's
    merge-on-read row deletes (PROTOCOL.md "Deletion Vectors"), the Delta
    analog of Iceberg's position-delete files: the fixture appends nation,
    commits a stored DV (z85-uuid-named `deletion_vector_*.bin` sidecar,
    framed <size><RoaringBitmapArray><crc32>) deleting ordinals {0,7,24},
    then an INLINE DV (storageType "i", z85 payload in the log itself)
    deleting ordinal 1 — which must MERGE with the stored one, not replace
    it — then a checkpoint, whose add rows must carry the descriptor
    through. Pre-delete time travel is asserted mid-flow. The bitmap
    codecs (catalog/roaring.py) are from-scratch implementations of the
    public RoaringFormatSpec + ZeroMQ Z85 specs, checked against the
    specs' own test vectors.

    Scale: DV descriptors are log metadata (O(files) rows, payloads
    bounded by sizeInBytes); bitmaps decode on the EXECUTORS (Arrow-
    batched pandas UDF over the binary payload column) and apply as the
    same deleted-row-proportional (file, row ordinal) anti-join the
    Iceberg MoR path runs — data files still stream through the
    distributed parquet source with pushdown intact."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
    )

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-dv-")
    w = DeltaTableWriter(spark, tmp)
    w.commit(add_dfs=[n.orderBy("n_nationkey")])  # ordinal == n_nationkey
    rel = next(iter(read_delta_log(tmp)["files"]))
    w.delete_rows(rel, [0, 7, 24])  # stored sidecar DV
    assert scan_delta_table(spark, tmp, version=0).count() == 25  # pre-delete
    w.delete_rows(rel, [1], inline=True)  # inline DV, merges with stored
    w.checkpoint()  # descriptor must survive the checkpoint round-trip
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_column_mapping",
    oracle="""
SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation
""",
)
def source_delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a Delta table using COLUMN MAPPING (PROTOCOL.md, mode=name) —
    the spec feature that makes column RENAMES metadata-only: data files
    store columns under stable physical names (`col-<uuid>`, asserted on
    the raw parquet footer mid-flow), logical names live in the log's
    schemaString field metadata, and the reader projects physical →
    logical for the version being read. The fixture writes nation mapped,
    renames n_name → nation_name WITHOUT touching any data file (file
    list asserted unchanged), and returns the head scan; time travel to
    the pre-rename version still shows the old logical name. The
    checkpoint metaData struct carries configuration + schemaString, so
    the mapping survives log truncation (pinned in
    tests/test_delta_format.py).

    Scale: a rename on a 100 TB table is one metaData action — zero data
    IO — which is the entire reason the mapping indirection exists; the
    read-side projection is a zero-cost alias in the scan plan."""
    import pyarrow.parquet as _pq

    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-cm-")
    w = DeltaTableWriter(spark, tmp, column_mapping=True)
    w.commit(add_dfs=[n])
    import os as _os

    data_files = sorted(f for f in _os.listdir(tmp) if f.endswith(".parquet"))
    phys = [f.name for f in _pq.read_schema(_os.path.join(tmp, data_files[0]))]
    assert all(c.startswith("col-") for c in phys)  # physical names on disk
    w.rename_column("n_name", "nation_name")
    assert (
        sorted(f for f in _os.listdir(tmp) if f.endswith(".parquet"))
        == data_files
    )  # the rename rewrote NOTHING
    assert "n_name" in scan_delta_table(spark, tmp, version=0).columns
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "nation_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_column_mapping_id",
    oracle="""
SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation
""",
)
def source_delta_column_mapping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a Delta table using COLUMN MAPPING mode=id (VERDICT r8 #6 —
    tables written with delta.columnMapping.mode=id were unreadable):
    the reader's contract is the PARQUET FIELD ID — each log schema
    field's delta.columnMapping.id matches the footer field_id stamped
    in the data files, and the scan resolves columns by id via Spark's
    native field-id resolution (read schema carries the LOGICAL names +
    parquet.field.id metadata; the files' col-uuid physical names are
    never consulted, asserted mid-flow: the read schema's names don't
    exist in the file, so a correct non-null read proves id matching).
    Renames stay metadata-only and time-travel correctly, same as mode
    name.

    Scale: identical to the name-mode scan — resolution happens in the
    reader's schema matching, zero extra IO or shuffle."""
    import os as _os

    import pyarrow.parquet as _pq

    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-cmid-")
    w = DeltaTableWriter(spark, tmp, column_mapping="id")
    w.commit(add_dfs=[n])
    data_files = sorted(f for f in _os.listdir(tmp) if f.endswith(".parquet"))
    sch = _pq.read_schema(_os.path.join(tmp, data_files[0]))
    assert all(c.startswith("col-") for c in sch.names)  # not logical names
    assert all(
        sch.field(i).metadata and b"PARQUET:field_id" in sch.field(i).metadata
        for i in range(len(sch.names))
    )  # footers carry the ids the reader resolves by
    w.rename_column("n_name", "nation_name")
    assert "n_name" in scan_delta_table(spark, tmp, version=0).columns
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "nation_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_column_mapping_id_partitioned",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey = 7 THEN 'MERGED_7' ELSE n_name END AS n_name,
       CASE WHEN n_nationkey = 7 THEN 2 ELSE n_regionkey END AS region_id
FROM nation
UNION ALL
SELECT CAST(30 AS INTEGER), 'NEW_30', CAST(2 AS INTEGER)
""",
)
def source_delta_column_mapping_id_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COLUMN MAPPING mode=id on a PARTITIONED Delta table + DML over it
    (VERDICT r9 #3 — both were loud refusals): partitionValues stay
    keyed by the partition column's PHYSICAL col-uuid name (the
    protocol's rule for both mapping modes) while the data files' value
    columns resolve by PARQUET FIELD ID under the logical read schema
    (_file_read_schema); a MERGE upserts through the same field-id
    probe scan, and renaming the PARTITION column itself stays
    metadata-only — partition_filter prunes from the log under the new
    logical name (asserted: the pruned scan sees one region's rows
    only). id-mode tables are partitioned in the wild as often as
    name-mode ones; this is the composition stock Delta ships.

    Scale: resolution happens in reader schema matching; pruning is the
    log-as-partition-index path — zero extra IO vs name mode."""
    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="delta-cmid-part-")
    w = DeltaTableWriter(spark, tmp, column_mapping="id")
    for i, rk in enumerate(range(5)):
        w.commit(
            add_dfs=[n.filter(F.col("n_regionkey") == rk)],
            partition_cols=["n_regionkey"] if i == 0 else None,
        )
    # MERGE through the field-id probe scan (update one key, insert one)
    w.merge_upsert(
        local_df(
            spark,
            [(7, "MERGED_7", 2), (30, "NEW_30", 2)],
            "n_nationkey int, n_name string, n_regionkey int",
        ),
        ["n_nationkey"],
    )
    # renaming the PARTITION column is metadata-only in id mode too
    w.rename_column("n_regionkey", "region_id")
    pruned = bounded_rows(
        scan_delta_table(spark, tmp, partition_filter={"region_id": "2"})
    )
    assert {r["region_id"] for r in pruned} == {2}
    assert "MERGED_7" in {r["n_name"] for r in pruned}
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "region_id"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_refs",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey < 12
""",
)
def source_iceberg_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a real Iceberg v2 table BY NAMED REF — the table-spec `refs`
    map (tags + branches beside the writer-managed `main`) that stock
    Iceberg serves `VERSION AS OF 'name'` from: the fixture appends low
    nations, TAGS that snapshot `v1.0` (a metadata-only commit — new
    v<N>.metadata.json, zero data/manifest IO), appends the rest, then
    pins an `audit` branch back at the first snapshot. The scan resolves
    `ref → snapshot-id → manifest list` through the independent walker
    and returns the tagged snapshot's rows; `main` tracking head and the
    unknown-ref refusal are asserted mid-flow. This is the lakeFS-style
    named-commit workflow (the reference's raison d'être) expressed in
    Iceberg's own metadata.

    Scale: ref resolution is one metadata.json read — the same O(1)
    driver-side planning step as version pinning; data files stream
    distributed as always."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-refs-")
    w = IcebergTableWriter(spark, tmp)
    s1 = w.append(n.filter(F.col("n_nationkey") < 12))
    w.set_ref("v1.0", ref_type="tag")
    w.append(n.filter(F.col("n_nationkey") >= 12))
    w.set_ref("audit", snapshot_id=s1, ref_type="branch")
    assert scan_iceberg_table(spark, tmp, ref="main").count() == 25
    try:
        scan_iceberg_table(spark, tmp, ref="nope")
        raise AssertionError("unknown ref must refuse")
    except ValueError:
        pass
    back = scan_iceberg_table(spark, tmp, ref="v1.0").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "maint_delta_vacuum",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey >= 12
""",
)
def maint_delta_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM a Delta layout — the retention-gated PHYSICAL deletion of
    tombstoned data files (a `remove` action only un-references; vacuum
    reclaims): the fixture builds the add/add/remove chain, vacuums with
    an infinite window (nothing deleted — tombstones too young), then
    with window 0 (exactly the removed files deleted from disk, asserted
    by listing), and proves the head scan is IDENTICAL before and after —
    vacuum must never change current-version results. The safety
    invariants (live set dominates tombstones; re-added paths survive;
    idempotence) are pinned in tests/test_delta_format.py.

    Scale: one metadata-sized log fold + one unlink per expired
    tombstone — zero data reads; on a 100 TB table vacuum cost tracks
    churn, not table size."""
    import os as _os

    from ..catalog.delta_format import (
        DeltaTableWriter,
        scan_delta_table,
        vacuum_delta_table,
    )

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-vac-")
    w = DeltaTableWriter(spark, tmp)
    # both add commits staged in ONE write job; v0's add paths read from
    # the already-written v0 log afterwards (same bytes either order)
    w.commit_many(
        [n.filter(F.col("n_nationkey") < 12), n.filter(F.col("n_nationkey") >= 12)]
    )
    import json as _json

    with open(_os.path.join(tmp, "_delta_log", f"{0:020d}.json")) as f:
        v0_adds = sorted(
            _json.loads(line)["add"]["path"]
            for line in f.read().splitlines()
            if '"add"' in line
        )
    w.commit(remove=v0_adds)
    from .util import bounded_rows

    before = sorted(
        r[0] for r in bounded_rows(scan_delta_table(spark, tmp).select("n_nationkey"))
    )
    assert vacuum_delta_table(tmp, retention_ms=10**12) == []  # too young
    assert all(_os.path.exists(_os.path.join(tmp, p)) for p in v0_adds)
    assert vacuum_delta_table(tmp, retention_ms=0) == v0_adds  # expired now
    assert not any(_os.path.exists(_os.path.join(tmp, p)) for p in v0_adds)
    back = scan_delta_table(spark, tmp)
    after = sorted(r[0] for r in bounded_rows(back.select("n_nationkey")))
    assert after == before  # vacuum never changes current results
    return _materialize(
        spark, back.select("n_nationkey", "n_name", "n_regionkey"), tmp
    )


@register(
    "source_iceberg_orc",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def source_iceberg_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a real Iceberg v2 table whose data files are ORC — the spec's
    second data format (manifest entries carry file_format=ORC; readers
    must dispatch per entry, not assume parquet): the fixture writes low
    nations as ORC appends and — in the SAME table — high nations as a
    parquet append via a second writer handle, so the scan must group
    files by format, read each through its own distributed source, and
    union by name (mixed-format tables are exactly what a long-lived
    table that switched formats mid-life looks like). Merge-on-read
    deletes over ORC apply through the executor-side pyarrow ordinal
    reader (dml_iceberg_delete_orc_mor; pinned in tests).

    Scale: per-format grouped reads keep pushdown/pruning intact in each
    source; the union is plan-level, no shuffle."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-orc-")
    w = IcebergTableWriter(spark, tmp, file_format="orc")
    w.append(n.filter(F.col("n_nationkey") < 12))
    # the same table continues in parquet — format is per data file
    w.append(n.filter(F.col("n_nationkey") >= 12), file_format="parquet")
    back = scan_iceberg_table(spark, tmp)
    fmts = {p.rsplit(".", 1)[-1] for p in back.inputFiles()}
    assert fmts == {"orc", "parquet"}, fmts  # genuinely mixed-format scan
    return _materialize(
        spark, back.select("n_nationkey", "n_name", "n_regionkey"), tmp
    )


@register(
    "source_iceberg_partitions_table",
    oracle="""
SELECT CAST(n_regionkey AS VARCHAR) AS region,
       COUNT(*) AS record_count,
       CAST(1 AS INTEGER) AS file_count,
       CAST(CASE WHEN n_regionkey = 1 THEN 1 ELSE 0 END AS INTEGER)
         AS delete_file_count
FROM nation GROUP BY n_regionkey
""",
)
def source_iceberg_partitions_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stock Iceberg's ``t.partitions`` METADATA TABLE on the real
    layout — the partition-health dashboard: one row per live partition
    tuple with record count, data-file count, and delete-file count,
    derived from the same manifest walk every scan plans with (zero
    data IO). The fixture partitions nation by region, appends one file
    per region, lands a MoR position delete in region 1 only, and
    projects the typed partition value out of the partition map.

    Scale: O(manifest entries) driver-side metadata — the table a
    compaction scheduler reads to pick skewed or delete-heavy
    partitions, never touching data."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-partitions-")
    w = IcebergTableWriter(spark, tmp, partition_by=["n_regionkey"])
    w.append_many([n.filter(F.col("n_regionkey") == rk) for rk in range(5)])
    w.delete_where_mor("n_nationkey = 1")  # region 1 only
    back = iceberg_metadata_table(spark, tmp, "partitions").select(
        F.col("partition")["n_regionkey"].alias("region"),
        "record_count",
        "file_count",
        "delete_file_count",
    )
    # record_count reflects the manifest counts (deletes are MoR debt,
    # not subtracted — stock semantics); the fixture's counts match the
    # raw per-region row counts
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_avro",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (3, 14)
""",
)
def source_iceberg_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 with AVRO data files — the spec's THIRD data format
    (round 12; previously a loud refusal): no avro DataSource ships in
    this deployment, so data files write through the from-scratch Avro
    container ENCODER (avro_io.write_container — executor-side, block-
    buffered, deflate) and read through the from-scratch block-streaming
    READER, one task per file stamping (_file, _pos) ordinals. The
    fixture writes low nations as Avro, high nations as parquet in the
    SAME table, runs one predicate MoR DELETE whose victims span BOTH
    formats (the probe unions per-format ordinal scans), and
    cross-checks the written container against the REAL Apache Avro
    Java library mid-flow — writer and reader cannot share a bug.

    Scale: per-file tasks parallelize like any scan; blocks stream
    (peak task memory one block), and the anti-join stays delete-
    proportional — the same cost shape as the parquet/ORC MoR paths."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-avro-")
    w = IcebergTableWriter(spark, tmp, file_format="avro")
    w.append(n.filter("n_nationkey < 12").orderBy("n_nationkey"))
    w.append(n.filter("n_nationkey >= 12"), file_format="parquet")
    files, _ = iceberg_snapshot_files(tmp)
    fmts = {f["file_format"].upper() for f in files}
    assert fmts == {"AVRO", "PARQUET"}, fmts
    # cross-implementation check: the Apache Avro JVM reader reads our
    # from-scratch encoder's container and agrees on the row count
    avro_path = next(
        f["file_path"] for f in files if f["file_format"].upper() == "AVRO"
    )
    jvm = spark.sparkContext._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(avro_path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    n_jvm = 0
    while fr.hasNext():
        fr.next()
        n_jvm += 1
    fr.close()
    assert n_jvm == 12, n_jvm
    # predicate MoR delete spanning BOTH formats (avro key 3, parquet 14)
    w.delete_where_mor("n_nationkey in (3, 14)")
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_iceberg_delete_orc_mor",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (0, 3)
""",
)
def dml_iceberg_delete_orc_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read POSITION DELETES over ORC data files (VERDICT r7 #9
    — the last MoR format gap): Spark's `_metadata.row_index` ordinal
    column is parquet-only, so the scan stamps ORC rows with their
    (file, ordinal) identity via an executor-side pyarrow reader — one
    Arrow-batched task per file, sequential read = the spec's
    position-delete ordinal space — and the usual (file, pos) anti-join
    applies the deletes. The fixture writes an ORC table in key order,
    position-deletes ordinals {0, 3} of the low file (= nations 0 and
    3), and the merged scan returns everything else.

    Scale: per-file tasks parallelize like any scan; pyarrow streams
    stripes (Arrow batches), the anti-join stays metadata-sized on the
    delete side — same cost shape as the parquet MoR path."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-orcmor-")
    w = IcebergTableWriter(spark, tmp, file_format="orc")
    w.append(n.filter("n_nationkey < 12").orderBy("n_nationkey"))
    w.append(n.filter("n_nationkey >= 12").orderBy("n_nationkey"))
    files, _ = iceberg_snapshot_files(tmp)
    # ORC footers yield no manifest bounds — pick the low file by its
    # record count (12 low nations vs 13 high)
    low = next(f for f in files if f["record_count"] == 12)
    w.delete_positions([(low["file_path"], 0), (low["file_path"], 3)])
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_constraints",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def source_delta_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta CHECK CONSTRAINTS (protocol "CHECK Constraints":
    ``delta.constraints.<name>`` in metaData configuration, writer
    version >= 3): ADD CONSTRAINT validates the existing rows first and
    lands as a metadata-only commit; every later add-path commit
    re-validates its incoming rows and REFUSES the whole commit when any
    row fails the expression (null counts as a violation — the
    row-never-enters guarantee engines that trust the constraint rely
    on). The fixture adds a constraint, appends conforming rows, proves
    a violating append and a constraint the current data violates both
    refuse without moving the version, drops the constraint, and reads
    the table back.

    Scale: validation is one pushdown probe over the NEW rows per
    commit — table size never enters; the constraint itself is a config
    string in the log."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="delta-constraints-")
    w = DeltaTableWriter(spark, tmp)
    w.commit(add_dfs=[n.filter("n_nationkey < 12")])
    v_add = w.add_check_constraint(
        "valid_key", "n_nationkey >= 0 AND n_name IS NOT NULL"
    )
    st = read_delta_log(tmp)
    assert (
        st["metadata"]["configuration"]["delta.constraints.valid_key"]
        == "n_nationkey >= 0 AND n_name IS NOT NULL"
    )
    w.commit(add_dfs=[n.filter("n_nationkey >= 12")])  # conforming
    # violating append refuses without advancing the version
    bad = n.withColumn("n_nationkey", F.lit(-1) - F.col("n_nationkey"))
    try:
        w.commit(add_dfs=[bad])
        raise AssertionError("violating commit must refuse")
    except ValueError:
        pass
    # a constraint the CURRENT data violates refuses at ADD time
    try:
        w.add_check_constraint("too_strict", "n_nationkey >= 5")
        raise AssertionError("constraint over violating data must refuse")
    except ValueError:
        pass
    assert w._version == v_add + 1  # only the conforming append landed
    w.drop_check_constraint("valid_key")
    assert not any(
        k.startswith("delta.constraints.")
        for k in read_delta_log(tmp)["metadata"]["configuration"]
    )
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_append_only",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def source_delta_append_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta's ``delta.appendOnly`` table property — the immutability
    contract audit/event-log tables rely on: after one SET TBLPROPERTIES
    commit, appends keep working while every row-mutating operation
    (DV DELETE, DV UPDATE, CoW MERGE) refuses loudly without moving the
    version. Flipping the property back re-enables them. The fixture
    proves all three refusals mid-flow and reads the table back.

    Scale: enforcement is a metadata lookup — zero cost on the write
    path; the property rides the same metaData configuration map as
    constraints and column mapping."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="delta-appendonly-")
    w = DeltaTableWriter(spark, tmp)
    w.commit(add_dfs=[n.filter("n_nationkey < 12")])
    w.set_table_property("delta.appendOnly", "true")
    assert (
        read_delta_log(tmp)["metadata"]["configuration"]["delta.appendOnly"]
        == "true"
    )
    w.commit(add_dfs=[n.filter("n_nationkey >= 12")])  # appends still fine
    v = w._version
    for attempt in (
        lambda: w.delete_where_dv("n_nationkey = 3"),
        lambda: w.update_where_dv("n_nationkey = 3", {"n_name": "'X'"}),
        lambda: w.merge_upsert(
            n.filter("n_nationkey = 3"), ["n_nationkey"]
        ),
    ):
        try:
            attempt()
            raise AssertionError("append-only violation must refuse")
        except ValueError as e:
            assert "append-only" in str(e)
    assert w._version == v  # nothing moved
    w.set_table_property("delta.appendOnly", "false")  # re-enable
    w.delete_where_dv("n_nationkey = 99")  # no-op match, but permitted
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_cdf",
    oracle="""
SELECT n_nationkey, n_name, 'insert' AS _change_type
FROM nation WHERE n_nationkey >= 12
UNION ALL
SELECT n_nationkey, n_name, 'delete' AS _change_type
FROM nation WHERE n_nationkey IN (0, 1)
""",
)
def source_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED over a Delta log — reconstruct per-row changes
    between two versions from file-set + deletion-vector diffs (the
    fallback stock Delta readers use when commits carry no _change_data
    files): the fixture writes low nations (v0), appends high nations
    (v1), then DV-deletes ordinals {0,1} from the v0 file (v2); changes
    v0→v2 must be exactly the appended rows as 'insert' plus the two
    DV'd rows as 'delete' — nothing else, in particular NOT the v0 rows
    that never changed. A DV that SHRINKS (a RESTORE re-added the path
    with the target's smaller vector) re-surfaces exactly the restored
    ordinals as 'insert' rows — stock CDF's restored-row semantics
    (asserted mid-flow across a restore() of the fixture table).

    Scale: the version diff is two metadata-sized log folds; data IO
    touches only changed files, and DV deletes read one file filtered by
    `_metadata.row_index` — change-proportional, the CDF contract that
    makes downstream incremental consumers (sync, CDC apply, audit)
    cheaper than rescans."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        delta_table_changes,
        read_delta_log,
    )

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-cdf-")
    w = DeltaTableWriter(spark, tmp)
    w.commit(add_dfs=[n.filter(F.col("n_nationkey") < 12).orderBy("n_nationkey")])
    rel0 = next(iter(read_delta_log(tmp)["files"]))
    w.commit(add_dfs=[n.filter(F.col("n_nationkey") >= 12)])
    w.delete_rows(rel0, [0, 1])  # ordinals == n_nationkey 0 and 1
    back = delta_table_changes(spark, tmp, 0, 2).select(
        "n_nationkey", "n_name", "_change_type"
    )
    rows = bounded_rows(back)
    # RESTORE to the pre-delete version shrinks rel0's DV back to empty:
    # CDF across the restore window surfaces exactly the two resurrected
    # ordinals as inserts (stock restored-row semantics)
    v3 = w.restore(1)
    restored = bounded_rows(
        delta_table_changes(spark, tmp, 2, v3).select(
            "n_nationkey", "_change_type"
        )
    )
    assert sorted((r["n_nationkey"], r["_change_type"]) for r in restored) == [
        (0, "insert"),
        (1, "insert"),
    ]
    import shutil as _shutil

    _shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, rows, back.schema)


@register(
    "source_delta_cdf_partitioned",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey, 'insert' AS _change_type
FROM nation WHERE n_nationkey >= 20 AND n_regionkey < 3
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'delete' AS _change_type
FROM nation WHERE n_regionkey = 2 AND n_nationkey < 20
""",
)
def source_delta_cdf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED over a PARTITIONED Delta table (VERDICT r7 #5 —
    real Delta tables are partitioned; the refusal lifted): the file-set
    diff re-injects each changed file's LOG-ONLY partition values as
    typed literal columns, exactly like the scan path — an appended
    per-region batch surfaces as 'insert' rows WITH their region, and a
    dropped partition file's rows surface as 'delete' rows with theirs.
    The fixture also proves the COLUMN-MAPPED path in-flow: a mid-window
    rename projects every change row to the to-version logical name via
    the stable physical col-uuid names.

    Scale: two metadata-sized log folds + IO on exactly the changed
    files — change-proportional at any table size."""
    from ..catalog.delta_format import (
        DeltaTableWriter,
        delta_table_changes,
        read_delta_log,
    )

    nfull = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    n = nfull.filter("n_regionkey < 3")
    tmp = tempfile.mkdtemp(prefix="delta-cdfpart-")
    w = DeltaTableWriter(spark, tmp)
    low = n.filter("n_nationkey < 20")
    for i, rk in enumerate(range(3)):  # v0..v2: one file per region
        w.commit(
            add_dfs=[low.filter(F.col("n_regionkey") == rk)],
            partition_cols=["n_regionkey"] if i == 0 else None,
        )
    hi = n.filter("n_nationkey >= 20")
    w.commit(  # v3: one per-region add for each appended key
        add_dfs=[hi.filter(F.col("n_regionkey") == rk) for rk in range(3)]
    )
    files = read_delta_log(tmp, 2)["files"]
    region2 = [
        rel
        for rel, a in files.items()
        if a["partitionValues"]["n_regionkey"] == "2"
    ]
    w.commit(remove=region2)  # v4: drop region 2's original file
    back = delta_table_changes(spark, tmp, 2, 4).select(
        "n_nationkey", "n_name", "n_regionkey", "_change_type"
    )
    # column-mapped sub-proof: a mid-window rename surfaces change rows
    # under the NEW logical name (physical col-uuid is the identity)
    cm = DeltaTableWriter(spark, f"{tmp}/cm", column_mapping=True)
    cm.commit(
        add_dfs=[nfull.filter("n_nationkey < 5").select("n_nationkey", "n_name")]
    )
    rel0 = next(iter(read_delta_log(f"{tmp}/cm")["files"]))
    cm.rename_column("n_name", "nation_name")
    cm.commit(remove=[rel0])
    ch = delta_table_changes(spark, f"{tmp}/cm", 0, 2)
    assert set(ch.columns) == {"n_nationkey", "nation_name", "_change_type"}
    assert ch.count() == 5  # the dropped file's rows, renamed, as deletes
    return _materialize(spark, back, tmp)


@register(
    "maint_iceberg_expire_snapshots",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey <> 7
""",
)
def maint_iceberg_expire_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACT + EXPIRE on the real Iceberg v2 layout — the two-step space
    reclamation every large Iceberg deployment runs (stock
    rewrite_data_files + expire_snapshots; the Iceberg pair of
    maint_delta_vacuum): the fixture builds three append snapshots plus a
    merge-on-read position delete (4 data/delete-debt files), compacts
    them into ONE data file via a `replace` snapshot (deletes applied,
    row set provably unchanged), then expires all but the head snapshot —
    reclaiming every file only expired snapshots reach (3 data files, the
    delete file, their manifests and manifest lists; counts asserted
    mid-flow, and the data/ dir physically shrinks to the single
    compacted file). Ref-protection is pinned in tests: expiry refuses
    while a tag still points at a to-be-expired snapshot.

    Scale: compaction is one distributed scan+write sized by live rows;
    expiry is O(retained manifests) metadata reads + one unlink per
    orphaned file, ZERO data reads — reclamation cost tracks churn, not
    table size. Expired time travel refuses loudly."""
    import os as _os

    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-expire-")
    w = IcebergTableWriter(spark, tmp)
    s1 = w.append(n.filter(F.col("n_nationkey") < 8))
    w.append(n.filter((F.col("n_nationkey") >= 8) & (F.col("n_nationkey") < 17)))
    w.append(n.filter(F.col("n_nationkey") >= 17))
    files, _ = iceberg_snapshot_files(tmp, snapshot_id=s1)
    w.delete_positions([(files[0]["file_path"], 7)])  # ordinal 7 == key 7
    w.rewrite_data()  # compaction: 3 data files + 1 delete file -> 1 file
    data_dir = _os.path.join(tmp, "data")
    assert len(_os.listdir(data_dir)) == 5  # 4 originals + compacted, pre-GC
    stats = w.expire_snapshots(retain_last=1)
    assert stats["expired"] == 4 and stats["removed_data_files"] == 4
    assert len(_os.listdir(data_dir)) == 1  # bytes actually reclaimed
    try:
        scan_iceberg_table(spark, tmp, snapshot_id=s1)
        raise AssertionError("expired snapshot must refuse")
    except ValueError:
        pass
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_schema_evolution",
    oracle="""
SELECT n_nationkey,
       n_name AS nation_name,
       CASE WHEN n_nationkey >= 12 THEN 'new' END AS note
FROM nation
WHERE n_nationkey <> 3
""",
)
def source_iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on the real Iceberg v2 layout — rename/add/drop as
    metadata-ONLY commits, read back through FIELD-ID projection (the
    spec's column identity): the fixture appends under the original
    schema, renames n_name→nation_name, adds a `note` string column,
    appends a second file under the new schema, drops n_regionkey, and
    applies a merge-on-read position delete across the evolution. The
    scan projects EVERY data file to the CURRENT schema by matching field ids
    against its manifest's embedded write-time schema — the old file's
    renamed column re-aliases, its missing `note` reads as a typed NULL,
    and the dropped column stops being projected with zero data IO.

    Scale: evolution commits touch ONE metadata.json (no data rewrite at
    any table size — the point of id-based columns); the read-side
    projection is a per-file select, no shuffle, and files written under
    the current schema pass through untouched."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="iceberg-evo-")
    w = IcebergTableWriter(spark, tmp)
    s1 = w.append(n.filter(F.col("n_nationkey") < 12))
    w.rename_column("n_name", "nation_name")  # metadata-only commit
    w.add_column("note", "string")  # fresh field id, never reused
    w.append(
        n.filter(F.col("n_nationkey") >= 12)
        .withColumnRenamed("n_name", "nation_name")
        .withColumn("note", F.lit("new"))
    )
    w.drop_column("n_regionkey")  # bytes stay; projection stops
    files, _ = iceberg_snapshot_files(tmp, snapshot_id=s1)
    w.delete_positions([(files[0]["file_path"], 3)])  # ordinal 3 == key 3
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "nation_name", "note"
    )
    return _materialize(spark, back, tmp)


@register(
    "maint_delta_optimize",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey <> 3
""",
)
def maint_delta_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE + VACUUM on the real Delta layout — the two-step space
    reclamation every large Delta deployment runs (the Delta pair of
    maint_iceberg_expire_snapshots): the fixture builds two small data
    files plus a deletion-vector delete (delete debt), bin-packs them
    into ONE data file via a dataChange=false OPTIMIZE commit (DVs
    materialized away, row set provably unchanged), then vacuums the
    tombstoned files — the table physically shrinks to the compacted
    file. CDF windows crossing the maintenance commit refuse loudly
    (stock Delta CDF skips dataChange=false commits; the endpoint
    file-set diff here would misreport rewritten rows), pinned with the
    protocol invariants in tests/test_delta_format.py.

    Scale: OPTIMIZE is one distributed scan+write sized by live rows
    (per-partition bins on partitioned tables); vacuum is a metadata-
    sized log fold + one unlink per expired tombstone, zero data reads —
    reclamation cost tracks churn, not table size."""
    import os as _os

    from ..catalog.delta_format import (
        DeltaTableWriter,
        read_delta_log,
        scan_delta_table,
        vacuum_delta_table,
    )

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-opt-")
    w = DeltaTableWriter(spark, tmp)
    w.commit(add_dfs=[n.filter(F.col("n_nationkey") < 8).orderBy("n_nationkey")])
    w.commit(add_dfs=[n.filter(F.col("n_nationkey") >= 8)])
    rel = sorted(read_delta_log(tmp)["files"])[0]
    w.delete_rows(rel, [3])  # DV: ordinal 3 == key 3
    w.optimize()
    state = read_delta_log(tmp)
    assert len(state["files"]) == 1  # bin-packed
    assert all(a.get("deletionVector") is None for a in state["files"].values())
    gone = vacuum_delta_table(tmp, retention_ms=0)
    # both pre-OPTIMIZE files reclaimed, plus the materialized-away DV
    # sidecar (round 9: orphaned bins join the tombstone lifecycle)
    assert len([g for g in gone if g.endswith(".parquet")]) == 2
    assert len([g for g in gone if g.endswith(".bin")]) == 1
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_delta_add_column",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey,
       CASE WHEN n_nationkey >= 12 THEN 'new' END AS note
FROM nation
""",
)
def source_delta_add_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ADD COLUMNS as a metadata-ONLY commit (the Delta pair of
    source_iceberg_schema_evolution's add): only the log's schemaString
    grows — zero data IO at any table size — and the scan reads every
    data file with the LOG's schema, so files written before the commit
    surface the new column as typed NULLs while post-commit files carry
    real values. Time travel before the commit keeps the old shape
    (schema is part of the versioned log fold). RENAME/DROP stay gated
    behind column mapping per the protocol — source_delta_column_mapping
    covers that path, including mapped ADD with fresh stable ids.

    Scale: the evolution cost is one metadata.json-sized log commit; the
    read-side null-fill is Spark's parquet reader given an explicit
    schema — per-file, no shuffle, pushdown intact."""
    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    n = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="delta-addcol-")
    w = DeltaTableWriter(spark, tmp)
    w.commit(add_dfs=[n.filter(F.col("n_nationkey") < 12)])
    v_add = w.add_column("note", "string")
    w.commit(
        add_dfs=[
            n.filter(F.col("n_nationkey") >= 12).withColumn("note", F.lit("new"))
        ]
    )
    assert scan_delta_table(spark, tmp, version=v_add - 1).columns == [
        "n_nationkey", "n_name", "n_regionkey",
    ]
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey", "note"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_all_data_files",
    oracle="""
SELECT * FROM (VALUES
  (0, 'PARQUET', CAST(12 AS BIGINT), CAST(1 AS BIGINT), 0),
  (0, 'PARQUET', CAST(13 AS BIGINT), CAST(2 AS BIGINT), 0),
  (0, 'PARQUET', CAST(11 AS BIGINT), CAST(3 AS BIGINT), 0)
) AS t(content, file_format, record_count, sequence_number, spec_id)
""",
)
def source_iceberg_all_data_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``t.all_data_files`` METADATA TABLE (the reference
    inherits it via its iceberg-spark-runtime dependency, pom.xml:83-88):
    data files across ALL snapshots, not just the current one — the
    orphan-audit view. The fixture's CoW DELETE makes the difference
    visible: the rewritten victim (12 rows, seq 1) is gone from ``files``
    but still listed here because older snapshots' manifests reference
    it, alongside the untouched append (13 rows) and the rewrite
    survivor (11 rows).

    Scale: zero data-file IO — O(unique manifests) metadata reads
    (manifests shared across snapshots are read once)."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-alldf-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12").orderBy("n_nationkey"))
    w.append(n.filter("n_nationkey >= 12").orderBy("n_nationkey"))
    w.delete_where_cow("n_nationkey = 3")
    # current files ≠ all files: the CoW victim only shows in all_*
    cur = iceberg_metadata_table(spark, tmp, "files")
    assert cur.filter("content = 0").count() == 2
    back = iceberg_metadata_table(spark, tmp, "all_data_files").select(
        "content", "file_format", "record_count", "sequence_number", "spec_id"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_all_manifests",
    oracle="""
SELECT * FROM (VALUES
  (0, 1, 0, 0, CAST(1 AS BIGINT)),
  (0, 1, 0, 0, CAST(2 AS BIGINT)),
  (0, 1, 0, 0, CAST(2 AS BIGINT)),
  (0, 0, 0, 1, CAST(3 AS BIGINT)),
  (0, 1, 0, 0, CAST(3 AS BIGINT)),
  (0, 1, 0, 0, CAST(3 AS BIGINT)),
  (1, 1, 0, 0, CAST(4 AS BIGINT)),
  (0, 0, 0, 1, CAST(4 AS BIGINT)),
  (0, 1, 0, 0, CAST(4 AS BIGINT)),
  (0, 1, 0, 0, CAST(4 AS BIGINT))
) AS t(content, added_files, existing_files, deleted_files, ref_seq)
""",
)
def source_iceberg_all_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``t.all_manifests`` METADATA TABLE: one row per
    (snapshot, manifest) across EVERY snapshot with the referencing
    snapshot attached — the planning-debt dashboard (how many manifests
    each historical snapshot's scan opens). The fixture (2 appends → CoW
    delete → MoR delete) yields 1+2+3+4 rows; reference_snapshot_id is
    random per run, so the key projects the referencing snapshot's
    SEQUENCE NUMBER via a metadata-sized broadcast join with the
    snapshots table.

    Scale: zero data IO — O(snapshots × manifests) metadata rows."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-allmf-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12").orderBy("n_nationkey"))
    w.append(n.filter("n_nationkey >= 12").orderBy("n_nationkey"))
    w.delete_where_cow("n_nationkey = 3")
    w.delete_where_mor("n_nationkey = 20")
    mt = iceberg_metadata_table(spark, tmp, "all_manifests")
    snap_seq = iceberg_metadata_table(spark, tmp, "snapshots").select(
        F.col("snapshot_id").alias("reference_snapshot_id"),
        F.col("sequence_number").alias("ref_seq"),
    )
    back = mt.join(F.broadcast(snap_seq), "reference_snapshot_id").select(
        "content",
        F.col("added_data_files_count").alias("added_files"),
        F.col("existing_data_files_count").alias("existing_files"),
        F.col("deleted_data_files_count").alias("deleted_files"),
        "ref_seq",
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_all_entries",
    oracle="""
SELECT * FROM (VALUES
  (1, 0, 'PARQUET', CAST(12 AS BIGINT), CAST(1 AS BIGINT)),
  (2, 0, 'PARQUET', CAST(12 AS BIGINT), CAST(1 AS BIGINT)),
  (1, 0, 'PARQUET', CAST(13 AS BIGINT), CAST(2 AS BIGINT)),
  (1, 0, 'PARQUET', CAST(11 AS BIGINT), CAST(3 AS BIGINT)),
  (1, 1, 'PARQUET', CAST(1 AS BIGINT), CAST(4 AS BIGINT))
) AS t(status, content, file_format, record_count, sequence_number)
""",
)
def source_iceberg_all_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``t.all_entries`` METADATA TABLE: manifest entries
    across ALL snapshots' manifests (deduplicated by manifest path), all
    statuses included — the raw reconciliation view behind
    all_data_files. The fixture's CoW DELETE shows the same data file
    twice: ADDED (seq 1, by the first append's manifest) and DELETED
    (seq 1 resolved explicitly, by the rewrite's manifest); the MoR
    delete contributes the content=1 ADDED entry.

    Scale: zero data IO — O(unique manifests) metadata reads."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-allent-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12").orderBy("n_nationkey"))
    w.append(n.filter("n_nationkey >= 12").orderBy("n_nationkey"))
    w.delete_where_cow("n_nationkey = 3")
    w.delete_where_mor("n_nationkey = 20")
    back = iceberg_metadata_table(spark, tmp, "all_entries").select(
        "status", "content", "file_format", "record_count", "sequence_number"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_position_deletes_table",
    oracle="""
SELECT * FROM (VALUES
  (CAST(3 AS BIGINT), CAST(12 AS BIGINT), 0),
  (CAST(8 AS BIGINT), CAST(12 AS BIGINT), 0),
  (CAST(5 AS BIGINT), CAST(13 AS BIGINT), 0)
) AS t(pos, target_rows, spec_id)
""",
)
def source_iceberg_position_deletes_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stock Iceberg's row-level ``t.position_deletes`` METADATA TABLE:
    the CONTENT of every live position-delete file — one row per
    (data file, ordinal) with the delete file, partition and spec id
    attached. The one metadata table that reads data (that is its
    purpose: row-level MoR-debt audit); the read is ONE distributed scan
    over the delete files, joined to a broadcast O(delete files) sidecar
    for partition/spec — rows never touch the driver. File paths are
    tmp-dir-random, so the key projects each ordinal against its target
    data file's record_count (12/13 disambiguate the two appends) via
    the files table."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
        iceberg_snapshot_files,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-posdel-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12").orderBy("n_nationkey"))
    w.append(n.filter("n_nationkey >= 12").orderBy("n_nationkey"))
    files, _ = iceberg_snapshot_files(tmp)
    # pick targets by row count, not list position (manifest order is
    # not append order): 12-row file gets ordinals {3, 8}, 13-row gets {5}
    f12 = next(f for f in files if f["record_count"] == 12)["file_path"]
    f13 = next(f for f in files if f["record_count"] == 13)["file_path"]
    w.delete_positions([(f12, 3), (f12, 8), (f13, 5)])
    mt = iceberg_metadata_table(spark, tmp, "position_deletes")
    targets = iceberg_metadata_table(spark, tmp, "files").filter(
        "content = 0"
    ).select("file_path", F.col("record_count").alias("target_rows"))
    back = mt.join(F.broadcast(targets), "file_path").select(
        "pos", "target_rows", "spec_id"
    )
    return _materialize(spark, back, tmp)


@register(
    "ddl_delta_drop_column",
    oracle="""
SELECT n_nationkey, n_regionkey, CAST(NULL AS VARCHAR) AS n_name
FROM nation
""",
)
def ddl_delta_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Delta's ALTER TABLE ... DROP COLUMN under COLUMN MAPPING —
    the metadata-only drop (delta_format.py drop_column; Iceberg twin
    already covered by ddl_schema_evolution): drop n_name, keep
    writing, then RE-ADD a column with the same logical name. The
    protocol's point: the re-added column gets a FRESH id + physical
    name, so the old files' bytes must NOT resurrect — every row reads
    n_name as NULL at the head, while time travel to the pre-drop
    version (asserted mid-flow) still shows the original values through
    the old metaData.

    Scale: drop/re-add are zero-data-IO commits at any table size."""
    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="delta-dropcol-")
    w = DeltaTableWriter(spark, tmp, column_mapping=True)
    w.commit(add_dfs=[n.filter("n_nationkey < 12")])
    v_drop = w.drop_column("n_name")
    # post-drop writes carry only the surviving columns
    w.commit(
        add_dfs=[
            n.filter("n_nationkey >= 12").select("n_nationkey", "n_regionkey")
        ]
    )
    # pre-drop time travel still surfaces the column's values
    pre = scan_delta_table(spark, tmp, version=v_drop - 1)
    assert pre.columns == ["n_nationkey", "n_name", "n_regionkey"]
    assert pre.filter("n_name IS NULL").count() == 0
    # re-add the same logical name: fresh physical name, old bytes stay dead
    w.add_column("n_name", "string")
    back = scan_delta_table(spark, tmp).select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_iceberg_delete_cow_avro",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_nationkey NOT IN (3, 20)
""",
)
def dml_iceberg_delete_cow_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE over a MIXED parquet + AVRO Iceberg table —
    the r12 refusal lifted (VERDICT r12 #4): the touched-file probe now
    rides the scan assembler's uniform `_file` lineage, so the avro
    block reader's files participate in CoW exactly like parquet's
    `_metadata.file_path`. One key lives in each format; both files
    rewrite (victims DELETED in their manifests, survivors re-added),
    and the result is the same rows stock copy-on-write would keep.

    Scale: touched-file-proportional — the probe is one scan with the
    predicate applied; only the two hit files' survivors are copied."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-cowavro-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12"))  # parquet
    w.append(n.filter("n_nationkey >= 12"), file_format="avro")
    w.delete_where_cow("n_nationkey in (3, 20)")
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_iceberg_update_cow",
    oracle="""
SELECT
  n_nationkey,
  CASE WHEN n_nationkey IN (3, 20)
       THEN 'UPDATED_' || CAST(n_nationkey AS VARCHAR)
       ELSE n_name END AS n_name,
  n_regionkey
FROM nation
""",
)
def dml_iceberg_update_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... WHERE via COPY-ON-WRITE on the real Iceberg layout —
    stock's write.update.mode=copy-on-write plan, completing the CoW DML
    trio beside delete/merge (iceberg_format.py update_where_cow): the
    matched rows live in two different files (keys 3 and 20 straddle the
    two appends), both rewrite at touched-file granularity under one
    `overwrite` snapshot, survivors carried, no-match calls are no-ops
    (asserted mid-flow: no new snapshot).

    Scale: touched-file-proportional, like the delete/merge twins."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        read_table_metadata,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-updcow-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12"))
    w.append(n.filter("n_nationkey >= 12"))
    w.update_where_cow(
        "n_nationkey in (3, 20)",
        {"n_name": "concat('UPDATED_', n_nationkey)"},
    )
    n_snaps = len(read_table_metadata(tmp)["snapshots"])
    w.update_where_cow("n_nationkey = 999", {"n_name": "'NOPE'"})
    assert len(read_table_metadata(tmp)["snapshots"]) == n_snaps  # no-op
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "dml_iceberg_update_mor",
    oracle="""
SELECT
  n_nationkey,
  CASE WHEN n_nationkey IN (3, 14, 20)
       THEN 'UPDATED_' || CAST(n_nationkey AS VARCHAR)
       ELSE n_name END AS n_name,
  n_regionkey
FROM nation
""",
)
def dml_iceberg_update_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... WHERE via MERGE-ON-READ on the real Iceberg layout —
    stock's write.update.mode=merge-on-read plan (VERDICT r13 #3), the
    MoR dual of dml_iceberg_update_cow: matched rows' (file, ordinal)
    pairs become file-scoped POSITION delete files and the updated row
    images append as a new data file, both under ONE `overwrite`
    snapshot (iceberg_format.py update_where_mor). ZERO-REWRITE is
    asserted in-flow: every pre-existing data file survives the commit
    untouched (the old images just go invisible under the deletes), and
    exactly one data file is added. The fixture spans all three data
    formats — parquet, ORC and AVRO appends — exercising the lineage
    scan's per-format ordinal readers; a no-match call is a no-op
    (no snapshot, asserted).

    Scale: one pushdown probe + matched-row-proportional delete/data
    writes, all executor-side; untouched files are never rewritten."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        read_table_metadata,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-updmor-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 10"))  # parquet
    w.append(n.filter("n_nationkey between 10 and 17"), file_format="orc")
    w.append(n.filter("n_nationkey > 17"), file_format="avro")
    pre_files = {f["file_path"] for f in iceberg_snapshot_files(tmp)[0]}
    w.update_where_mor(
        "n_nationkey in (3, 14, 20)",
        {"n_name": "concat('UPDATED_', n_nationkey)"},
    )
    post_data, post_deletes = iceberg_snapshot_files(tmp)
    post_files = {f["file_path"] for f in post_data}
    assert pre_files <= post_files  # zero-rewrite: nothing removed
    assert len(post_files - pre_files) == 1  # the updated images
    assert len(post_deletes) == 3  # one file-scoped delete per hit file
    n_snaps = len(read_table_metadata(tmp)["snapshots"])
    w.update_where_mor("n_nationkey = 999", {"n_name": "'NOPE'"})
    assert len(read_table_metadata(tmp)["snapshots"]) == n_snaps  # no-op
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_all_delete_files",
    oracle="""
SELECT * FROM (VALUES
  (1, 'PARQUET', CAST(1 AS BIGINT), CAST(3 AS BIGINT)),
  (1, 'PARQUET', CAST(1 AS BIGINT), CAST(4 AS BIGINT)),
  (1, 'PARQUET', CAST(2 AS BIGINT), CAST(5 AS BIGINT))
) AS t(content, file_format, record_count, sequence_number)
""",
)
def source_iceberg_all_delete_files(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stock Iceberg's ``t.all_delete_files`` METADATA TABLE: delete
    files across ALL snapshots — the MoR-debt history view. The fixture
    makes it differ from ``delete_files``: two 1-row position deletes,
    then rewrite_position_deletes consolidates them into one 2-row file
    — the CURRENT table shows only the consolidated file, while all_*
    still lists both originals (referenced by pre-compaction
    snapshots).

    Scale: zero data IO — O(unique manifests) metadata reads."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-alldel-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12").orderBy("n_nationkey"))
    w.append(n.filter("n_nationkey >= 12").orderBy("n_nationkey"))
    w.delete_where_mor("n_nationkey = 3")
    w.delete_where_mor("n_nationkey = 7")
    w.rewrite_position_deletes()
    cur = iceberg_metadata_table(spark, tmp, "delete_files")
    assert cur.count() == 1  # consolidated file only
    back = iceberg_metadata_table(spark, tmp, "all_delete_files").select(
        "content", "file_format", "record_count", "sequence_number"
    )
    return _materialize(spark, back, tmp)


@register(
    "maint_iceberg_remove_orphans",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def maint_iceberg_remove_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``remove_orphan_files`` procedure
    (iceberg_format.py remove_orphan_files): files under the table
    prefix that NO snapshot references — aborted-write leftovers — are
    deleted; referenced files, the metadata chain, and files younger
    than the ``older_than`` cutoff survive. The fixture plants two fake
    orphans (one aged past the cutoff, one fresh) plus the real table;
    the sweep removes exactly the aged orphan (asserted mid-flow) and
    the table reads back unchanged.

    Scale: O(all manifests) metadata reads + one listing pass; stock
    distributes the listing anti-join — semantics identical."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-orphans-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12"))
    w.append(n.filter("n_nationkey >= 12"))
    old_orphan = os.path.join(tmp, "data", "orphan-aborted-write.parquet")
    fresh_orphan = os.path.join(tmp, "data", "orphan-inflight.parquet")
    for p in (old_orphan, fresh_orphan):
        with open(p, "wb") as fh:
            fh.write(b"PAR1 aborted")
    week_ago = (int(__import__("time").time()) - 7 * 24 * 3600)
    os.utime(old_orphan, (week_ago, week_ago))
    res = w.remove_orphan_files()  # default cutoff: now - 3 days
    assert res["removed_paths"] == [old_orphan], res
    assert res["kept_young"] >= 1 and os.path.exists(fresh_orphan)
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_metadata_log",
    oracle="""
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 0),
  (CAST(2 AS BIGINT), 0),
  (CAST(2 AS BIGINT), 1)
) AS t(latest_sequence_number, latest_schema_id)
""",
)
def source_iceberg_metadata_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``t.metadata_log_entries`` METADATA TABLE: one row
    per previous metadata file plus the current one, each carrying the
    latest snapshot/schema/sequence at that point — the metadata
    time-travel index (completes the stock metadata-table family). The
    fixture's two appends then a column RENAME make the trail
    non-trivial: sequence advances on the appends (1, 2) and holds on
    the metadata-only evolution while the schema id steps to 1.

    Scale: O(metadata versions) driver-side metadata reads, zero data
    IO — the same chain the catalog's version recovery already walks."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-metalog-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12"))
    w.append(n.filter("n_nationkey >= 12"))
    w.rename_column("n_name", "nation_name")
    mt = iceberg_metadata_table(spark, tmp, "metadata_log_entries")
    assert mt.filter("file IS NULL OR timestamp_ms IS NULL").count() == 0
    back = mt.select("latest_sequence_number", "latest_schema_id")
    return _materialize(spark, back, tmp)


@register(
    "sink_delta_shallow_clone",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey = 5 THEN 'CLONED' ELSE n_name END AS n_name,
       n_regionkey
FROM nation WHERE n_nationkey <> 3
""",
)
def sink_delta_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE on the real Delta log (VERDICT r13 #7, stock's
    CREATE TABLE ... SHALLOW CLONE): one metadata commit whose add
    actions reference the source's live files by ABSOLUTE path — the
    protocol's zero-copy clone. Asserted in-flow: the clone directory
    holds ZERO data files after cloning; DML on the clone (a DV delete
    and a merge) diverges while the source scan is bit-identical before
    and after; and VACUUM on the clone (retention 0, far-future clock)
    deletes nothing under the source root — tombstoned absolute paths
    outside the clone's root are protected by vacuum's root guard.

    Scale: cloning a 100 TB table is O(live files) metadata rows in one
    log write, zero data IO; the clone's own rewrites produce its own
    files, and the shared originals stay safe because vacuum never
    reaches outside its table root."""
    import time as _time

    from ..catalog.delta_format import (
        DeltaTableWriter,
        scan_delta_table,
        vacuum_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    src = tempfile.mkdtemp(prefix="delta-clone-src-")
    ws = DeltaTableWriter(spark, src)
    # both source commits staged in ONE write job
    ws.commit_many([n.filter("n_nationkey < 12"), n.filter("n_nationkey >= 12")])

    dst = tempfile.mkdtemp(prefix="delta-clone-dst-")
    wc = DeltaTableWriter(spark, dst)
    wc.shallow_clone(src)
    assert not [f for f in os.listdir(dst) if f.endswith(".parquet")]

    # the clone diverges; the source must not move
    wc.delete_where_dv("n_nationkey = 3")
    wc.merge_upsert(
        n.filter("n_nationkey = 5").withColumn("n_name", F.lit("CLONED")),
        ["n_nationkey"],
    )
    pre_src = set(os.listdir(src))
    vacuum_delta_table(
        dst, retention_ms=0, now_ms=int(_time.time() * 1000) + 10**9
    )
    assert set(os.listdir(src)) == pre_src  # VACUUM never crossed roots
    assert scan_delta_table(spark, src).count() == 25
    back = scan_delta_table(spark, dst).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, dst)


@register(
    "dml_iceberg_merge_mor_positions",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey IN (3, 14)
            THEN 'UPSERT_' || CAST(n_nationkey AS VARCHAR)
            ELSE n_name END AS n_name,
       n_regionkey
FROM nation
UNION ALL
SELECT CAST(25 AS INTEGER), 'UPSERT_25', CAST(2 AS INTEGER)
""",
)
def dml_iceberg_merge_mor_positions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGE the way STOCK SPARK plans it in merge-on-read mode
    (write.merge.mode=merge-on-read): matched target rows become
    file-scoped POSITION delete files and ALL source rows append as new
    data — one overwrite snapshot, zero rewrites
    (iceberg_format.py merge_upsert_mor_positions). This is the
    position-delete dual of dml_iceberg_merge_mor (the Flink/CDC
    EQUALITY flavor): both are spec-legal, but Spark's own MoR MERGE
    emits this one, so a stock-written table history replays exactly.
    Zero-rewrite asserted in-flow: every pre-existing data file survives
    untouched; the matched keys straddle a parquet and an ORC file
    (lineage-scan ordinal readers), and exactly 2 file-scoped delete
    files + 1 new data file appear.

    Scale: one pushdown semi-probe + matched-proportional delete writes
    + source-proportional data writes, all executor-side."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-mergemorpos-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12"))  # parquet
    w.append(n.filter("n_nationkey >= 12"), file_format="orc")
    pre_files = {f["file_path"] for f in iceberg_snapshot_files(tmp)[0]}
    src = local_df(spark,
        [(3, "UPSERT_3", 3), (14, "UPSERT_14", 4), (25, "UPSERT_25", 2)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    w.merge_upsert_mor_positions(src, ["n_nationkey"])
    post_data, post_dels = iceberg_snapshot_files(tmp)
    post_files = {f["file_path"] for f in post_data}
    assert pre_files <= post_files  # zero-rewrite
    assert len(post_files - pre_files) == 1  # the source rows
    assert len(post_dels) == 2 and all(f["content"] == 1 for f in post_dels)
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "maint_iceberg_snapshot_migrate",
    oracle="""
SELECT 'snap' AS src, n_nationkey, n_name FROM nation WHERE n_nationkey <> 3
UNION ALL SELECT 'snap', CAST(25 AS INTEGER), 'NEW_25'
UNION ALL SELECT 'migrated', n_nationkey, n_name FROM nation
""",
)
def maint_iceberg_snapshot_migrate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stock Iceberg's ``CALL system.snapshot`` + ``system.migrate``
    (round 15 — the legacy-lake conversion front door, built over
    add_files): ``snapshot`` registers a plain-parquet table's files in
    place as a NEW Iceberg table elsewhere — asserted footer-cost-only
    (source byte-identical after snapshot AND after DML on the
    snapshot: MoR delete + append both land in the new table's own
    tree); stats skipping works on the snapshot IMMEDIATELY (file-prune
    asserted via input-file count — add_files wrote the footer bounds
    into the manifest). ``migrate`` is the identity swap: the SOURCE
    directory itself becomes an Iceberg table (metadata/ beside the
    original files, zero bytes moved), time travel live from v1.

    Scale: both are METADATA procedures — one footer read per file, no
    data IO; a 100 TB parquet lake converts for the price of its
    footers."""
    import hashlib as _hl

    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        migrate_parquet_to_iceberg,
        scan_iceberg_table,
    )
    from ..catalog.parquet_io import write_single_parquet

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name")

    def _digest(d):
        out = {}
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if os.path.isfile(p):
                out[name] = _hl.md5(open(p, "rb").read()).hexdigest()
        return out

    legacy = tempfile.mkdtemp(prefix="legacy-parquet-")
    write_single_parquet(
        n.filter("n_nationkey < 12").orderBy("n_nationkey"),
        os.path.join(legacy, "part-0.parquet"),
    )
    write_single_parquet(
        n.filter("n_nationkey >= 12").orderBy("n_nationkey"),
        os.path.join(legacy, "part-1.parquet"),
    )
    before = _digest(legacy)

    # ---- snapshot: new table elsewhere, source provably untouched ----
    snap_dir = tempfile.mkdtemp(prefix="iceberg-snapshot-")
    w = IcebergTableWriter(spark, snap_dir)
    w.snapshot_source_parquet(legacy)
    # stats skipping live immediately: the low file holds keys 0-11
    pruned = scan_iceberg_table(spark, snap_dir, stats_filter={"n_nationkey": (20, 24)})
    assert len(pruned.inputFiles()) == 1
    # DML on the snapshot: MoR delete + append — source must not change
    w.delete_where_mor("n_nationkey = 3")
    w.append(local_df(spark, [(25, "NEW_25")], "n_nationkey int, n_name string"))
    assert _digest(legacy) == before  # byte-identical source
    data_files, _ = iceberg_snapshot_files(snap_dir)
    new_files = [f for f in data_files if not f["file_path"].startswith(legacy)]
    assert len(new_files) == 1 and new_files[0]["file_path"].startswith(snap_dir)
    snap = scan_iceberg_table(spark, snap_dir).select("n_nationkey", "n_name")

    # ---- migrate: the legacy dir ITSELF becomes the Iceberg table ----
    legacy2 = tempfile.mkdtemp(prefix="legacy-parquet2-")
    write_single_parquet(n.orderBy("n_nationkey"), os.path.join(legacy2, "part-0.parquet"))
    migrate_parquet_to_iceberg(spark, legacy2)
    assert os.path.isdir(os.path.join(legacy2, "metadata"))  # identity swap
    mig = scan_iceberg_table(spark, legacy2).select("n_nationkey", "n_name")

    out = (
        snap.withColumn("src", F.lit("snap"))
        .unionByName(mig.withColumn("src", F.lit("migrated")))
        .select("src", "n_nationkey", "n_name")
    )
    out = _materialize(spark, out, snap_dir)
    shutil.rmtree(legacy, ignore_errors=True)
    shutil.rmtree(legacy2, ignore_errors=True)
    return out


@register(
    "dml_iceberg_merge_conditional",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey = 3 THEN 'UPD_3' ELSE n_name END AS n_name,
       n_regionkey
FROM nation
WHERE n_nationkey <> 7
UNION ALL
SELECT CAST(25 AS INTEGER), 'NEW_25', CAST(2 AS INTEGER)
""",
)
def dml_iceberg_merge_conditional(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """General-clause MERGE on the real Iceberg layout in merge-on-read
    mode (round 15 — IcebergTableWriter.merge_clauses_mor over the
    shared clause engine): the CDC-consumer shape ``WHEN MATCHED AND
    s.op = 'D' THEN DELETE / WHEN MATCHED THEN UPDATE SET n_name = ... /
    WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT (...)``. The op flag is
    an EXTRA source column that steers clauses and never lands; the
    column-level UPDATE keeps n_regionkey from the target. Zero-rewrite
    asserted in-flow: every pre-existing data file survives, victims
    (the matched delete AND the updated row's pre-image) land as
    position-delete rows, update images + the conditional insert land
    as one new data file.

    Scale: one key-partitioned inner probe for the MATCHED family +
    victim-proportional delete writes + write-proportional appends —
    the same cost shape as the whole-row MoR MERGE."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_snapshot_files,
        scan_iceberg_table,
    )
    from ..catalog.merge_clauses import MergeClause

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-mergecond-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12"))
    w.append(n.filter("n_nationkey >= 12"))
    pre_files = {f["file_path"] for f in iceberg_snapshot_files(tmp)[0]}
    src = local_df(spark,
        [(3, "UPD_3", 9, "U"), (7, "GONE", 9, "D"),
         (25, "NEW_25", 2, "U"), (26, "SKIP", 9, "D")],
        "n_nationkey int, n_name string, n_regionkey int, op string",
    )
    w.merge_clauses_mor(src, ["n_nationkey"], [
        MergeClause("matched", "delete", condition="s.op = 'D'"),
        MergeClause("matched", "update", assignments={"n_name": "s.n_name"}),
        MergeClause("not_matched", "insert", condition="s.op <> 'D'",
                    assignments={"n_nationkey": "s.n_nationkey",
                                 "n_name": "s.n_name",
                                 "n_regionkey": "s.n_regionkey"}),
    ])
    post_data, post_dels = iceberg_snapshot_files(tmp)
    post_files = {f["file_path"] for f in post_data}
    assert pre_files <= post_files  # zero-rewrite
    assert len(post_files - pre_files) == 1  # update image + insert
    assert sum(f["record_count"] for f in post_dels) == 2  # keys 3 and 7
    back = scan_iceberg_table(spark, tmp).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_all_files",
    oracle="""
SELECT * FROM (VALUES
  (0, 'PARQUET', CAST(12 AS BIGINT), CAST(1 AS BIGINT)),
  (0, 'PARQUET', CAST(13 AS BIGINT), CAST(2 AS BIGINT)),
  (1, 'PARQUET', CAST(1 AS BIGINT), CAST(3 AS BIGINT))
) AS t(content, file_format, record_count, sequence_number)
""",
)
def source_iceberg_all_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock Iceberg's ``t.all_files`` METADATA TABLE — the union view of
    all_data_files and all_delete_files: every data AND delete file
    referenced by ANY snapshot, completing the stock all_* family. The
    fixture's two appends plus a MoR position delete give it both
    contents: two data files (content=0, seq 1 and 2) and the delete
    file (content=1, seq 3) in one listing.

    Scale: zero data IO — O(unique manifests) metadata reads (manifests
    shared across snapshots are read once, like stock's plan)."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        iceberg_metadata_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-allfiles-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12"))
    w.append(n.filter("n_nationkey >= 12"))
    w.delete_where_mor("n_nationkey = 3")
    mt = iceberg_metadata_table(spark, tmp, "all_files")
    back = mt.select(
        "content", "file_format", "record_count", "sequence_number"
    )
    return _materialize(spark, back, tmp)


@register(
    "source_iceberg_as_of_timestamp",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey < 12
""",
)
def source_iceberg_as_of_timestamp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stock Iceberg's ``TIMESTAMP AS OF`` / ``FOR SYSTEM_TIME AS OF`` on
    the real layout: the scan pins the snapshot that was CURRENT at a
    wall-clock time via the snapshot log (the log records when each
    snapshot became current, so the resolution is history-faithful
    across rollbacks and never sees staged WAP snapshots). Querying at
    a time between the two appends returns the first append's rows; at
    head time it returns everything; before the table, it raises
    (asserted in-flow).

    Scale: resolution is one metadata-chain read — zero data IO before
    the pinned snapshot's normal pruned scan."""
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        read_table_metadata,
        scan_iceberg_table,
    )

    import json as _json

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="iceberg-asof-")
    w = IcebergTableWriter(spark, tmp)
    w.append(n.filter("n_nationkey < 12"))
    w.append(n.filter("n_nationkey >= 12"))
    # pin the log timestamps to fixed values (a foreign-written chain's
    # stamps are arbitrary anyway): deterministic at any commit speed —
    # two same-millisecond commits would otherwise make ts2-1 ambiguous
    meta_dir = os.path.join(tmp, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read().strip())
    mp = os.path.join(meta_dir, f"v{v}.metadata.json")
    with open(mp) as fh:
        meta = _json.load(fh)
    for i, e in enumerate(meta["snapshot-log"]):
        e["timestamp-ms"] = 100_000 * (i + 1)
    with open(mp, "w") as fh:
        _json.dump(meta, fh)
    assert scan_iceberg_table(
        spark, tmp, as_of_timestamp_ms=200_000
    ).count() == 25  # at head time: everything
    try:
        scan_iceberg_table(spark, tmp, as_of_timestamp_ms=99_999)
        raise AssertionError("pre-table timestamp must raise")
    except ValueError:
        pass
    back = scan_iceberg_table(
        spark, tmp, as_of_timestamp_ms=199_999
    ).select("n_nationkey", "n_name", "n_regionkey")
    return _materialize(spark, back, tmp)


@register(
    "source_delta_as_of_timestamp",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey < 12
""",
)
def source_delta_as_of_timestamp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stock Delta's ``TIMESTAMP AS OF`` on the real log: the scan pins
    the newest commit at or before a wall-clock time, timestamps taken
    from each commit's commitInfo (falling back to file mtime like
    stock's history manager). Between the two appends the first
    commit's rows come back; before the table, it raises (asserted).

    Scale: O(commits) driver-side metadata reads for the resolution,
    then the pinned version's normal log-pruned scan."""
    import time as _time

    from ..catalog.delta_format import (
        DeltaTableWriter,
        delta_version_at_timestamp,
        scan_delta_table,
    )

    n = _nation_local(spark, sf_dir, "n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="delta-asof-")
    w = DeltaTableWriter(spark, tmp)
    w.commit(add_dfs=[n.filter("n_nationkey < 12")])
    w.commit(add_dfs=[n.filter("n_nationkey >= 12")])
    import json as _json

    # pin commitInfo timestamps to fixed values: deterministic at any
    # commit speed (the resolver's monotonicity rule handles real-world
    # stamps; the fixture pins exact ones)
    for v, ts in ((0, 100_000), (1, 200_000)):
        p = os.path.join(tmp, "_delta_log", f"{v:020d}.json")
        out = []
        with open(p) as fh:
            for line in fh.read().splitlines():
                a = _json.loads(line)
                if "commitInfo" in a:
                    a["commitInfo"]["timestamp"] = ts
                out.append(_json.dumps(a, separators=(",", ":")))
        with open(p, "w") as fh:
            fh.write("\n".join(out))

    assert delta_version_at_timestamp(tmp, int(_time.time() * 1000)) == 1
    try:
        delta_version_at_timestamp(tmp, 99_999)
        raise AssertionError("pre-table timestamp must raise")
    except ValueError:
        pass
    back = scan_delta_table(spark, tmp, as_of_timestamp_ms=199_999).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return _materialize(spark, back, tmp)
