"""Ring B exposed as driver-checkable queries — each `[exercised]` key from
SURVEY.md §2.2 (DDL/DML/branch semantics) runs its scenario end-to-end in a
throwaway warehouse and returns the resulting table state; the DuckDB oracle
is the expected literal state (VALUES) or an equivalent query over the shared
testdata.

The scenarios replay the reference's own E2E workload (workers fixture,
tests/conftest.py:27-52 + tests/test_iceberg.py) through VersionedCatalog.
Results are materialized before the warehouse is deleted (tiny fixture
tables; the driver collects them anyway).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import VersionedCatalog
from ..registry import register
from ..tables import table
from .util import bounded_rows, local_df

WORKERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("firstname", T.StringType(), True),
        T.StructField("lastname", T.StringType(), True),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("gender", T.StringType(), True),
    ]
)
WORKERS_ROWS = [
    ("1", "James", "Smith", 32, "M"),
    ("2", "Michael", "Rose", 35, "M"),
    ("3", "Robert", "Williams", 41, "M"),
    ("4", "Maria", "Jones", 36, "F"),
    ("5", "Jen", "Brown", 44, "F"),
    ("6", "Monika", "Geller", 31, "F"),
]

_WORKERS_VALUES = """
(VALUES
  ('1', 'James',   'Smith',    32, 'M'),
  ('2', 'Michael', 'Rose',     35, 'M'),
  ('3', 'Robert',  'Williams', 41, 'M'),
  ('4', 'Maria',   'Jones',    36, 'F'),
  ('5', 'Jen',     'Brown',    44, 'F'),
  ('6', 'Monika',  'Geller',   31, 'F')
) AS t(id, firstname, lastname, age, gender)
"""


def _seeded(spark: SparkSession):
    """Fresh warehouse + repo with the workers table committed on main."""
    root = tempfile.mkdtemp(prefix="vcat-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.company")
    cat.create_table_as(
        "repo.main.company.workers", local_df(spark, WORKERS_ROWS, WORKERS_SCHEMA)
    )
    cat.commit_branch("repo", "main", "seed")
    return cat, root


def _materialize(spark: SparkSession, df: DataFrame, root: str) -> DataFrame:
    """Pin a fixture-scale result so it survives the temp-warehouse cleanup.
    Guarded by the shared row ceiling — never reusable on an unbounded
    result (operators/util.py:bounded_rows)."""
    from .util import bounded_rows

    rows, schema = bounded_rows(df), df.schema
    shutil.rmtree(root, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "source_rows",
    oracle=f"SELECT * FROM {_WORKERS_VALUES}",
)
def source_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory rows → DataFrame with declared schema, including the
    reference's int→string id coercion (conftest.py:27-41)."""
    raw = [
        (1, "James", "Smith", 32, "M"), (2, "Michael", "Rose", 35, "M"),
        (3, "Robert", "Williams", 41, "M"), (4, "Maria", "Jones", 36, "F"),
        (5, "Jen", "Brown", 44, "F"), (6, "Monika", "Geller", 31, "F"),
    ]
    return local_df(spark, [(str(i), fn, ln, a, g) for i, fn, ln, a, g in raw], WORKERS_SCHEMA)


@register(
    "sink_create_table_as",
    oracle="SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0",
)
def sink_create_table_as(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS (conftest.py:50 saveAsTable): write a filtered read of testdata
    into the versioned catalog, read it back from the catalog."""
    root = tempfile.mkdtemp(prefix="vcat-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    src = table(spark, sf_dir, "nation").filter("n_regionkey = 0").select("n_nationkey", "n_name")
    cat.create_table_as("repo.main.db.nations_r0", src)
    return _materialize(spark, cat.scan("repo.main.db.nations_r0"), root)


@register(
    "ddl_create_table",
    oracle="SELECT CAST(10 AS INT) AS val",
)
def ddl_create_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-schema CREATE TABLE + append of one row (the Java E2E table:
    `val int`, appended (10) — TestLakeFSCatalogSpark.java:67-76)."""
    root = tempfile.mkdtemp(prefix="vcat-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    cat.create_table("repo.main.db.mytable", "val int")
    cat.insert_values("repo.main.db.mytable", [(10,)])
    return _materialize(spark, cat.scan("repo.main.db.mytable"), root)


@register(
    "sink_append",
    oracle=f"""
SELECT * FROM {_WORKERS_VALUES}
UNION ALL
SELECT '7', 'Jhon', 'Smith', 33, 'M'
""",
)
def sink_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append snapshot (df.writeTo(...).append() semantics)."""
    cat, root = _seeded(spark)
    cat.append(
        "repo.main.company.workers",
        local_df(spark, [("7", "Jhon", "Smith", 33, "M")], WORKERS_SCHEMA),
    )
    return _materialize(spark, cat.scan("repo.main.company.workers"), root)


@register(
    "dml_insert_values",
    oracle=f"""
SELECT * FROM {_WORKERS_VALUES}
UNION ALL SELECT '7', 'Jhon', 'Smith', 33, 'M'
UNION ALL SELECT '8', 'Marta', 'Green', 31, 'F'
""",
)
def dml_insert_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT INTO ... VALUES (test_iceberg.py:48,50)."""
    cat, root = _seeded(spark)
    cat.insert_values("repo.main.company.workers", [("7", "Jhon", "Smith", 33, "M")])
    cat.insert_values("repo.main.company.workers", [("8", "Marta", "Green", 31, "F")])
    return _materialize(spark, cat.scan("repo.main.company.workers"), root)


@register(
    "dml_delete_where",
    oracle=f"SELECT * FROM {_WORKERS_VALUES} WHERE NOT (age > 35)",
)
def dml_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE WHERE via copy-on-write snapshot rewrite
    (test_iceberg.py:30; SURVEY.md §3.3)."""
    cat, root = _seeded(spark)
    cat.delete_where("repo.main.company.workers", "age > 35")
    return _materialize(spark, cat.scan("repo.main.company.workers"), root)


@register(
    "dml_delete_where_mor",
    oracle=f"""
SELECT * FROM {_WORKERS_VALUES}
WHERE NOT (age > 35) AND NOT (gender = 'F' AND age < 32)
""",
)
def dml_delete_where_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE (Iceberg format-version 2 delete files,
    TestLakeFSCatalogSpark.java:67): two deletes commit as metadata only —
    the data files on disk are asserted IDENTICAL before/after — then a
    scan applies the pending predicates, an appended row lands unaffected
    by the earlier deletes, and compact() folds the predicates into fresh
    files with the same visible rows. At 100 TB this is the difference
    between a one-row delete costing one manifest swap and rewriting a
    whole partition.

    Round 4 adds STATS SCOPING (Iceberg scopes delete files by partition/
    sequence; here by manifest min/max): on a clustered table a selective
    MoR delete stamps its predicate onto a strict SUBSET of files — files
    whose footer range provably excludes the predicate carry no entry, so
    manifests stay O(matching files), not O(files × deletes) — asserted
    mid-flow, with the scan still exact."""
    cat, root = _seeded(spark)

    # -- phase A: stats-scoped predicate on a clustered table ------------
    cat.create_namespace("repo.main.db")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    cat.create_table_as("repo.main.db.orders_c", orders, cluster_by=["o_orderkey"])
    ops_c = cat._ops("repo.main.db.orders_c")[0]
    n_before = cat.scan("repo.main.db.orders_c").count()
    n_match = cat.scan("repo.main.db.orders_c").filter("o_orderkey <= 64").count()
    cat.delete_where("repo.main.db.orders_c", "o_orderkey <= 64", mode="merge-on-read")
    mc = ops_c.current()
    stamped = set(mc.delete_preds)
    # strict subset: the clustered layout confines low keys to few files
    assert 0 < len(stamped) < len(mc.files), (len(stamped), len(mc.files))
    assert cat.scan("repo.main.db.orders_c").count() == n_before - n_match

    # -- phase B: the original workers flow (metadata-only commits, ------
    # sequence scoping of later appends, compaction folding)
    t = "repo.main.company.workers"
    ops = cat._ops(t)[0]
    files_before = ops.current().files
    cat.delete_where(t, "age > 35", mode="merge-on-read")
    cat.delete_where(t, "gender = 'F' AND age < 32", mode="merge-on-read")
    m = ops.current()
    assert m.files == files_before and m.delete_preds  # no data rewrite
    assert {(r.id) for r in bounded_rows(cat.scan(t).select("id"))} == {"1", "2"}
    # a row appended AFTER the deletes is not retro-deleted even though it
    # matches a pending predicate (sequence scoping)
    cat.insert_values(t, [("7", "Olga", "Brine", 99, "F")])
    assert cat.scan(t).count() == 3
    # compaction folds the predicates in: preds gone, rows unchanged
    cat.compact(t)
    m2 = ops.current()
    assert not m2.delete_preds and m2.files != files_before
    out = cat.scan(t).filter("id <> '7'")  # oracle covers the seeded rows
    return _materialize(spark, out, root)


@register(
    "branch_diff_equal",
    oracle="SELECT 6 AS main_rows, 6 AS branch_rows, CAST(1 AS BOOLEAN) AS in_sync",
)
def branch_diff_equal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy branch create + two-sided diff equality
    (test_iceberg.py:9-21)."""
    cat, root = _seeded(spark)
    cat.create_branch("repo", "b1", "main")
    a = cat.scan("repo.main.company.workers")
    b = cat.scan("repo.b1.company.workers")
    eq = cat.diff_equal("repo.main.company.workers", "repo.b1.company.workers")
    out = local_df(spark, 
        [(a.count(), b.count(), eq)],
        "main_rows long, branch_rows long, in_sync boolean",
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "branch_merge",
    oracle="""
SELECT * FROM (VALUES
  ('1', 'James',   'Smith',    32, 'M'),
  ('2', 'Michael', 'Rose',     35, 'M'),
  ('3', 'Robert',  'Williams', 41, 'M'),
  ('7', 'Jhon',    'Smith',    33, 'M'),
  ('8', 'Marta',   'Green',    31, 'F')
) AS t(id, firstname, lastname, age, gender)
""",
)
def branch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference workload (test_iceberg.py:39-57): branch, mixed
    delete+inserts, commit, merge back, read merged parent state."""
    cat, root = _seeded(spark)
    cat.create_branch("repo", "dev", "main")
    cat.delete_where("repo.dev.company.workers", "id IN ('4', '5', '6')")
    cat.insert_values("repo.dev.company.workers", [("7", "Jhon", "Smith", 33, "M")])
    cat.insert_values("repo.dev.company.workers", [("8", "Marta", "Green", 31, "F")])
    cat.commit_branch("repo", "dev", "reshape")
    cat.merge("repo", "dev", "main")
    return _materialize(spark, cat.scan("repo.main.company.workers"), root)


@register(
    "ddl_schema_crud",
    oracle="""
SELECT * FROM (VALUES ('company'), ('hr')) AS t(namespace)
""",
)
def ddl_schema_crud(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE/LIST/DESCRIBE/DROP SCHEMA lifecycle
    (TestLakeFSCatalogSpark.java:60-96): create two, drop a third, list."""
    cat, root = _seeded(spark)
    cat.create_namespace("repo.main.hr", {"owner": "people-team"})
    cat.create_namespace("repo.main.scratch")
    cat.drop_namespace("repo.main.scratch")
    assert cat.load_namespace_metadata("repo.main.hr")["owner"] == "people-team"
    names = [lv[-1] for lv in cat.list_namespaces("repo.main")]
    out = local_df(spark, [(n,) for n in names], "namespace string")
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "sink_clustered_pruning",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def sink_clustered_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered CTAS + manifest-stats file pruning — the partition-pruning
    story end to end: orders is written clustered by o_orderpriority
    (repartition + sortWithinPartitions, Iceberg's write-distribution
    spec), so each data file covers few priority values and the footer
    min/max stats in the manifest let an equality scan SKIP most files.
    Asserted mid-flow: the pruned file list is strictly smaller than the
    table's, and the pruned scan still returns exactly the right rows
    (stats pruning is an optimization, the residual filter keeps it exact).
    At 100 TB this metadata-only skip decides whether a selective query
    reads terabytes or gigabytes."""
    root = tempfile.mkdtemp(prefix="vcat-cluster-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    cat.create_table_as(
        "repo.main.db.orders_c", orders, cluster_by=["o_orderpriority"]
    )
    keep, total = cat.select_files(
        "repo.main.db.orders_c", "o_orderpriority", "=", "1-URGENT"
    )
    assert total > 1 and len(keep) < total, (len(keep), total)  # real skip
    from .util import dround

    out = cat.scan_pruned(
        "repo.main.db.orders_c", "o_orderpriority", "=", "1-URGENT"
    ).select("o_orderkey", dround("o_totalprice", 2).alias("total"))
    return _materialize(spark, out, root)


@register(
    "maint_sort_order_compact",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def maint_sort_order_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED sort order surviving maintenance — the Iceberg SortOrder
    analog (every reference table carries a SortOrder,
    TestLakeFSTableOperations.java:59-61; here a real one): a clustered
    CTAS declares `sort.order` in table metadata; arrival-ordered appends
    then fragment the clustering (appended files span the whole key
    domain, so stats pruning degrades — asserted); a bare compact() —
    no re-specified order — re-applies the DECLARED order, and the
    post-compact file stats prune as tightly as the original clustered
    write (asserted: pruned-file fraction strictly better than the
    fragmented state and no worse than the pre-append table). Without the
    persisted spec, every compaction would silently cost the table its
    file-skipping locality — at 100 TB, the difference between reading
    terabytes and gigabytes per selective query."""
    root = tempfile.mkdtemp(prefix="vcat-sortorder-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    t = "repo.main.db.orders_s"
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    base = orders.filter("o_orderkey % 2 = 0")
    rest = orders.filter("o_orderkey % 2 = 1")
    cat.create_table_as(t, base, cluster_by=["o_orderpriority"])
    ops = cat._ops(t)[0]
    from ..catalog.catalog import SORT_ORDER_PROP

    assert ops.current().properties[SORT_ORDER_PROP] == {
        "kind": "cluster", "cols": ["o_orderpriority"],
    }
    keep0, total0 = cat.select_files(t, "o_orderpriority", "=", "1-URGENT")
    frac0 = len(keep0) / total0
    cat.append(t, rest)  # arrival order: appended files span all priorities
    keep1, total1 = cat.select_files(t, "o_orderpriority", "=", "1-URGENT")
    frac1 = len(keep1) / total1
    assert frac1 > frac0, (frac1, frac0)  # clustering measurably degraded
    cat.compact(t)  # NO order passed — must re-apply the declared one
    keep2, total2 = cat.select_files(t, "o_orderpriority", "=", "1-URGENT")
    frac2 = len(keep2) / total2
    assert total2 > 1 and frac2 < frac1, (frac2, frac1)
    assert frac2 <= frac0 + 1e-9, (frac2, frac0)  # as tight as pre-append
    assert ops.current().properties[SORT_ORDER_PROP]["kind"] == "cluster"
    from .util import dround

    out = cat.scan_pruned(t, "o_orderpriority", "=", "1-URGENT").select(
        "o_orderkey", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, out, root)


@register(
    "sink_partition_spec",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def sink_partition_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity partition spec end to end (Iceberg's PartitionSpec — the
    reference exercises the unpartitioned case at
    TestLakeFSTableOperations.java:59-61): orders lands in a table
    partitioned by o_orderpriority, so every data file lives under a
    hive-layout dir and belongs to exactly one partition, with the value in
    metadata rather than pages. Asserted mid-flow: (a) an equality scan
    prunes to ONLY the covering partition's files, (b) a per-partition
    compact consolidates that partition and leaves every other partition's
    files byte-untouched, (c) the pruned scan stays exact. At 100 TB this
    is the difference between compacting one partition's files and
    rewriting the table."""
    root = tempfile.mkdtemp(prefix="vcat-part-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    t = "repo.main.db.orders_p"
    cat.create_table(
        t,
        orders.schema,
        partition_by=["o_orderpriority"],
    )
    # two appends fragment every partition into ≥2 files
    cat.append(t, orders.filter("o_orderkey % 2 = 0"))
    cat.append(t, orders.filter("o_orderkey % 2 = 1"))
    ops = cat._ops(t)[0]
    m = ops.current()
    keep, total = cat.select_files(t, "o_orderpriority", "=", "1-URGENT")
    assert 0 < len(keep) < total, (len(keep), total)  # partition-pruned
    assert all(
        m.file_partitions[f]["o_orderpriority"] == "1-URGENT" for f in keep
    )
    others_before = sorted(
        f for f in m.files if m.file_partitions[f]["o_orderpriority"] != "1-URGENT"
    )
    assert len(keep) >= 2
    cat.compact(t, partition={"o_orderpriority": "1-URGENT"})
    m2 = ops.current()
    assert sorted(
        f
        for f in m2.files
        if m2.file_partitions[f]["o_orderpriority"] != "1-URGENT"
    ) == others_before  # other partitions byte-untouched
    assert (
        sum(
            1
            for f in m2.files
            if m2.file_partitions[f]["o_orderpriority"] == "1-URGENT"
        )
        == 1
    )
    from .util import dround

    out = cat.scan_pruned(t, "o_orderpriority", "=", "1-URGENT").select(
        "o_orderkey", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, out, root)


@register(
    "sink_bucketed_pruning",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_custkey = 42
""",
)
def sink_bucketed_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket transform end to end (Iceberg's bucket[N]): orders lands in a
    table bucketed 8 ways on o_custkey via a cross-engine md5 digest, so an
    equality lookup on the key reads ONE bucket's files while the key
    column stays in the pages. Asserted mid-flow: every kept file belongs
    to the value's bucket and the kept set is a strict subset; the pruned
    scan stays exact (the residual filter runs on the real column). At
    100 TB this is the point-lookup path: 1/N of the files, no shuffle, no
    index."""
    from ..catalog.catalog import _bucket_of

    root = tempfile.mkdtemp(prefix="vcat-bucket-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = "repo.main.db.orders_b"
    cat.create_table_as(t, orders, bucket_by=("o_custkey", 8))
    m = cat._ops(t)[0].current()
    keep, total = cat.select_files(t, "o_custkey", "=", 42)
    b = _bucket_of(42, 8)
    assert 0 < len(keep) < total, (len(keep), total)
    assert all(m.file_partitions[f]["_bucket"] == b for f in keep)
    from .util import dround

    out = cat.scan_pruned(t, "o_custkey", "=", 42).select(
        "o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, out, root)


@register(
    "ddl_schema_evolution",
    oracle="""
SELECT * FROM (VALUES
  ('1', 'James',   CAST(32 AS BIGINT),         'M', CAST(NULL AS VARCHAR)),
  ('2', 'Michael', CAST(35 AS BIGINT),         'M', CAST(NULL AS VARCHAR)),
  ('3', 'Robert',  CAST(41 AS BIGINT),         'M', CAST(NULL AS VARCHAR)),
  ('4', 'Maria',   CAST(36 AS BIGINT),         'F', CAST(NULL AS VARCHAR)),
  ('5', 'Jen',     CAST(44 AS BIGINT),         'F', CAST(NULL AS VARCHAR)),
  ('6', 'Monika',  CAST(31 AS BIGINT),         'F', CAST(NULL AS VARCHAR)),
  ('7', 'Jhon',    CAST(33 AS BIGINT),         'M', 'eng'),
  ('8', 'Marta',   CAST(31 AS BIGINT),         'F', 'ops'),
  ('9', 'Ada',     CAST(5000000000 AS BIGINT), 'F', 'research')
) AS t(id, given_name, age, gender, dept)
""",
)
def ddl_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full metadata-only schema evolution — ADD, RENAME, DROP COLUMN, and
    ALTER COLUMN TYPE widening (the Iceberg evolution surface the reference
    inherits via its pinned extensions, tests/conftest.py:67 + pom.xml:77-88),
    with zero data rewrite: add `dept` (old rows read NULL), insert a row,
    rename `firstname`→`given_name` (old files keep the old on-file name;
    the scan projects via stable field ids), insert another row under the
    new name, drop `lastname` (files untouched, field no longer selected),
    then widen `age` int→bigint (files keep their int32 pages — asserted:
    the widen commit lists the same data files — and a post-widen insert
    holds a value beyond int range, proving the scan casts per file).
    Historic snapshots still read under THEIR schema AND types — asserted
    mid-flow via time travel to v1."""
    cat, root = _seeded(spark)
    t = "repo.main.company.workers"
    cat.add_column(t, "dept", "string")
    cat.insert_values(t, [("7", "Jhon", "Smith", 33, "M", "eng")])
    cat.rename_column(t, "firstname", "given_name")
    cat.insert_values(t, [("8", "Marta", "Green", 31, "F", "ops")])
    cat.drop_column(t, "lastname")
    ops = cat._ops(t)[0]
    files_before = ops.current().files
    cat.alter_column_type(t, "age", "bigint")
    assert ops.current().files == files_before  # widen is metadata-only
    cat.insert_values(t, [("9", "Ada", 5_000_000_000, "F", "research")])
    # time travel: v1 (the CTAS) still exposes the ORIGINAL schema and types
    v1 = cat.scan(t, version=1)
    assert set(v1.columns) == {"id", "firstname", "lastname", "age", "gender"}
    assert dict(v1.dtypes)["age"] == "int"
    assert v1.count() == 6
    cur = cat.scan(t)
    assert dict(cur.dtypes)["age"] == "bigint"
    out = cur.select("id", "given_name", "age", "gender", "dept")
    return _materialize(spark, out, root)


@register(
    "ddl_schema_evolution_nested",
    oracle="""
SELECT * FROM (VALUES
  (1, CAST(640  AS BIGINT), CAST(480        AS BIGINT), CAST(NULL AS VARCHAR), FALSE),
  (2, CAST(1280 AS BIGINT), CAST(720        AS BIGINT), CAST(NULL AS VARCHAR), FALSE),
  (3, CAST(NULL AS BIGINT), CAST(NULL       AS BIGINT), CAST(NULL AS VARCHAR), TRUE),
  (4, CAST(3840 AS BIGINT), CAST(5000000000 AS BIGINT), 'av1',                 FALSE)
) AS t(id, width, h, codec, meta_is_null)
""",
)
def ddl_schema_evolution_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED schema evolution — field ids tracked inside struct columns
    (Iceberg assigns ids at every nesting level; the reference inherits the
    full nested model via its pinned Iceberg runtime, tests/conftest.py:67 +
    pom.xml:77-88): rename member w→width, add member codec, widen member
    h int→bigint — all metadata-only (asserted: same data files across the
    three commits). Old files project MEMBER-WISE through stable member ids
    (renamed members read by their on-file name, added members NULL-backfill,
    widened members cast up from their written pages), a whole-NULL struct
    value stays NULL, and time travel to v1 reads the original member
    layout. Output is flattened to scalars for the driver's canonicalizer;
    meta_is_null pins the NULL-struct-preservation claim."""
    import tempfile as _tf

    from pyspark.sql import Row

    root = _tf.mkdtemp(prefix="vcat-nested-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    t = "repo.main.db.media"
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("w", T.IntegerType(), True),
                        T.StructField("h", T.IntegerType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    cat.create_table_as(
        t,
        local_df(spark, 
            [(1, Row(w=640, h=480)), (2, Row(w=1280, h=720)), (3, None)], schema
        ).coalesce(1),
    )
    ops = cat._ops(t)[0]
    files_v1 = ops.current().files
    cat.rename_struct_field(t, "meta", "w", "width")
    cat.add_struct_field(t, "meta", "codec", "string")
    cat.alter_struct_field_type(t, "meta", "h", "bigint")
    assert ops.current().files == files_v1  # metadata-only evolution
    evolved = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("width", T.IntegerType(), True),
                        T.StructField("h", T.LongType(), True),
                        T.StructField("codec", T.StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    assert cat.scan(t).schema == evolved  # the evolution produced this shape
    cat.append(
        t,
        local_df(spark, 
            [(4, Row(width=3840, h=5_000_000_000, codec="av1"))], evolved
        ),
    )
    # time travel: v1 still exposes the ORIGINAL member layout and types
    v1 = cat.scan(t, version=1)
    v1_members = {f.name: f.dataType for f in v1.schema["meta"].dataType.fields}
    assert v1_members == {"w": T.IntegerType(), "h": T.IntegerType()}
    assert v1.count() == 3
    out = cat.scan(t).select(
        "id",
        F.col("meta.width").cast("bigint").alias("width"),
        F.col("meta.h").cast("bigint").alias("h"),
        F.col("meta.codec").alias("codec"),
        F.col("meta").isNull().alias("meta_is_null"),
    )
    return _materialize(spark, out, root)


@register(
    "ddl_type_widening",
    oracle="""
SELECT id, n, f, CAST(CAST(d AS DECIMAL(12,2)) AS VARCHAR) AS d_str
FROM (VALUES
  ('1', CAST(32 AS BIGINT),         CAST(0.5  AS DOUBLE), '10.25'),
  ('2', CAST(35 AS BIGINT),         CAST(1.25 AS DOUBLE), '20.50'),
  ('3', CAST(9000000000 AS BIGINT), CAST(2.75 AS DOUBLE), '1234567890.75')
) AS t(id, n, f, d)
""",
)
def ddl_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER COLUMN TYPE — Iceberg's safe type promotions (int→bigint,
    float→double, decimal precision growth; the evolution surface the
    reference inherits via pom.xml:77-88 + tests/conftest.py:67), all
    metadata-only: the widen commits are asserted to list the SAME data
    files, old files keep their written physical pages and are cast at scan
    time, and a post-widen insert holds values representable only under the
    widened types (a >int64-range long, a >decimal(5,2) decimal). Time
    travel to v1 still reads the ORIGINAL narrow types. Lossy changes
    (narrowing, scale change, cross-family) are refused."""
    from ..catalog import UnsupportedOperationError

    root = tempfile.mkdtemp(prefix="vcat-widen-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    t = "repo.main.db.measures"
    narrow = T.StructType(
        [
            T.StructField("id", T.StringType(), True),
            T.StructField("n", T.IntegerType(), True),
            T.StructField("f", T.FloatType(), True),
            T.StructField("d", T.DecimalType(5, 2), True),
        ]
    )
    from decimal import Decimal

    cat.create_table_as(
        t,
        local_df(spark, 
            [("1", 32, 0.5, Decimal("10.25")), ("2", 35, 1.25, Decimal("20.50"))],
            narrow,
        ),
    )
    ops = cat._ops(t)[0]
    files_before = ops.current().files
    cat.alter_column_type(t, "n", "bigint")
    cat.alter_column_type(t, "f", "double")
    cat.alter_column_type(t, "d", "decimal(12,2)")
    assert ops.current().files == files_before  # all three metadata-only
    cat.insert_values(
        t, [("3", 9_000_000_000, 2.75, Decimal("1234567890.75"))]
    )
    # lossy promotions refused
    for col, bad in [("n", "int"), ("f", "float"), ("d", "decimal(12,4)"), ("id", "int")]:
        try:
            cat.alter_column_type(t, col, bad)
            raise AssertionError(f"lossy {col}→{bad} was not refused")
        except UnsupportedOperationError:
            pass
    # time travel: v1 still reads the original narrow types
    v1_types = dict(cat.scan(t, version=1).dtypes)
    assert v1_types == {"id": "string", "n": "int", "f": "float", "d": "decimal(5,2)"}
    cur = cat.scan(t)
    assert dict(cur.dtypes) == {
        "id": "string", "n": "bigint", "f": "double", "d": "decimal(12,2)"
    }
    # the decimal column rides out as its exact string rendering: DuckDB's
    # pandas bridge lowers DECIMAL to float while Spark keeps Decimal
    # objects, so a raw decimal column can never hash-compare — the
    # stringified fixed-scale value compares exactly on both engines
    out = cur.select(
        "id", "n", "f", F.col("d").cast("string").alias("d_str")
    )
    return _materialize(spark, out, root)


@register(
    "branch_wap_publish",
    oracle="""
SELECT source, count(*) AS n_docs, min(length(text)) AS min_len
FROM documents
WHERE doc_id < 250 OR length(text) >= 80
GROUP BY source
""",
)
def branch_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish — the branch workflow the reference stack exists
    for (lakeFS docs' headline pattern): the ingest batch lands on a
    STAGING branch (zero-copy create), an audit query runs against staging
    while main stays untouched, failing rows are repaired ON the branch
    (copy-on-write delete), and only then does the merge publish the batch
    atomically to main. Readers of main never observe the unaudited state —
    asserted mid-flow here.

    At 100 TB every step is O(metadata) on the driver except the repair
    delete (a distributed rewrite of the affected files only); the audit is
    an ordinary query against the branch's manifest."""
    root = tempfile.mkdtemp(prefix="vcat-wap-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.etl")
    docs = table(spark, sf_dir, "documents")
    cat.create_table_as("repo.main.etl.docs", docs.filter("doc_id < 250"))
    cat.commit_branch("repo", "main", "baseline corpus")

    # WRITE: the new batch (10 of its rows are under the length floor)
    cat.create_branch("repo", "staging", "main")
    cat.append("repo.staging.etl.docs", docs.filter("doc_id >= 250"))

    # AUDIT: runs on staging; main is still the baseline. The length floor
    # applies to the INCOMING batch (grandfathered baseline rows stay).
    bad_pred = "doc_id >= 250 AND length(text) < 80"
    n_bad = cat.scan("repo.staging.etl.docs").filter(bad_pred).count()
    assert n_bad > 0  # the audit genuinely catches the batch
    assert cat.scan("repo.main.etl.docs").count() == 250  # main untouched

    # REPAIR on the branch, then PUBLISH atomically
    cat.delete_where("repo.staging.etl.docs", bad_pred)
    cat.commit_branch("repo", "staging", "ingest batch, audited")
    cat.merge("repo", "staging", "main")

    from pyspark.sql import functions as F

    out = (
        cat.scan("repo.main.etl.docs")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.length("text")).alias("min_len"),
        )
    )
    return _materialize(spark, out, root)


@register(
    "sink_zorder_pruning",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders WHERE o_custkey <= 150
""",
)
def sink_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering end to end (Iceberg `rewrite_data_files` zorder
    strategy / Delta OPTIMIZE ZORDER BY): orders is written range-
    distributed on a Morton interleave of (o_custkey, o_totalprice), so
    each data file covers a compact hyper-rectangle of the 2-D key space
    and footer min/max stats stay narrow on BOTH dimensions. Asserted
    mid-flow: selective predicates on o_custkey AND (independently) on
    o_totalprice each skip files — a linear cluster_by on o_custkey could
    only prune the first. The pruned scan stays exact (residual filter on
    top of the skip). At 100 TB multi-dimension locality is what lets one
    layout serve several query families without duplicate sort orders."""
    root = tempfile.mkdtemp(prefix="vcat-zorder-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = "repo.main.db.orders_z"
    cat.create_table_as(t, orders, zorder_by=["o_custkey", "o_totalprice"])
    # sf-independent selective thresholds (~10% of each dimension's span),
    # used only for the pruning asserts; the returned rows use a fixed
    # literal the oracle replays
    lo_ck, lo_tp = bounded_rows(orders.selectExpr(
        "min(o_custkey) + 0.1 * (max(o_custkey) - min(o_custkey))",
        "min(o_totalprice) + 0.1 * (max(o_totalprice) - min(o_totalprice))",
    ))[0]
    keep_ck, total = cat.select_files(t, "o_custkey", "<=", int(lo_ck))
    keep_tp, _ = cat.select_files(t, "o_totalprice", "<=", float(lo_tp))
    assert total > 1 and len(keep_ck) < total, (len(keep_ck), total)
    assert len(keep_tp) < total, (len(keep_tp), total)  # 2nd dim prunes too
    from .util import dround

    out = cat.scan_pruned(t, "o_custkey", "<=", 150).select(
        "o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, out, root)


@register(
    "sink_partition_transforms",
    oracle="""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
       count(*)               AS n_events,
       round(sum(value), 2)   AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-13 00:00:00'
GROUP BY CAST(ts AS DATE)
ORDER BY d
""",
)
def sink_partition_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden partition transforms end to end (Iceberg's days(ts) and
    truncate[W] — PartitionSpec transforms beyond identity/bucket). Two
    tables exercise the two monotone transforms:

    - events partitioned by ``days(ts)``: every file lives in a
      day-numbered dir, the ts column itself stays in the pages, and a
      RANGE predicate on ts — not on any partition column — prunes to only
      the covering days (predicate projection). This is the
      hidden-partitioning contract: users never write the
      partition-column predicate Hive layouts require.
    - orders partitioned by ``truncate(o_custkey, 100)``: an equality (and
      any range) probe on the key prunes to the one width-100 slab.

    Both pruning claims are asserted mid-flow on the manifest file lists;
    the returned scan is the pruned days table aggregated per day, exact
    against the raw-events oracle (the residual filter keeps pruning an
    optimization, never a correctness dependency).

    Scale: transform evaluation is scan-stage codegen at write, pruning is
    driver-side metadata-only — at 100 TB a 3-day window over years of
    events opens 3 directories."""
    import datetime as dt

    root = tempfile.mkdtemp(prefix="vcat-transform-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "value")
    td = "repo.main.db.events_days"
    cat.create_table_as(td, ev.filter("event_id % 2 = 0"), transform_by=("days", "ts"))
    cat.append(td, ev.filter("event_id % 2 = 1"))  # appends follow the spec

    lo = dt.datetime(2024, 1, 10)
    hi = dt.datetime(2024, 1, 12, 23, 59, 59, 999999)
    keep, total = cat.select_files(td, "ts", "between", (lo, hi))
    assert total > 10 and 0 < len(keep) < total, (len(keep), total)
    m = cat._ops(td)[0].current()
    lo_day = (lo.date() - dt.date(1970, 1, 1)).days
    assert all(
        lo_day <= int(m.file_partitions[f]["_bucket"]) <= lo_day + 2 for f in keep
    ), "kept files outside the probed day range"

    # truncate[100] on an int key: equality probe opens one slab
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    tt = "repo.main.db.orders_trunc"
    cat.create_table_as(tt, orders, transform_by=("truncate", "o_custkey", 100))
    keep_t, total_t = cat.select_files(tt, "o_custkey", "=", 42)
    assert total_t > 1 and 0 < len(keep_t) < total_t, (len(keep_t), total_t)
    mt = cat._ops(tt)[0].current()
    assert all(int(mt.file_partitions[f]["_bucket"]) == 0 for f in keep_t)

    from .util import dround

    out = (
        cat.scan_pruned(td, "ts", "between", (lo, hi))
        .filter(F.col("ts") < F.lit(dt.datetime(2024, 1, 13)))
        .groupBy(F.col("ts").cast("date").cast("string").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("d")
    )
    return _materialize(spark, out, root)


@register(
    "ddl_partition_evolution",
    oracle="""
SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS total
FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def ddl_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition spec EVOLUTION (Iceberg's signature layout feature): a
    table starts unpartitioned, evolves to PARTITIONED BY o_orderpriority
    in a metadata-only commit, and keeps appending — old files stay under
    the old layout (pruned by footer stats only), new files land in hive
    partition dirs (pruned by partition value), one table, zero rewrite.
    Asserted mid-flow: (a) the evolution commit moves no data files,
    (b) post-evolution appends carry partition metadata while pre-evolution
    files carry none, (c) an equality probe prunes every non-covering
    POST-evolution file while conservatively keeping the unpartitioned
    pre-evolution files, (d) the mixed scan is exact. At 100 TB this is how
    a table adopts a better layout without a table-sized migration."""
    root = tempfile.mkdtemp(prefix="vcat-specevo-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    t = "repo.main.db.orders_evo"
    cat.create_table(t, orders.schema)  # unpartitioned v1
    cat.append(t, orders.filter("o_orderkey % 2 = 0"))
    ops = cat._ops(t)[0]
    files_before = sorted(ops.current().files)
    cat.set_partition_spec(t, ["o_orderpriority"])  # metadata-only
    m = ops.current()
    assert sorted(m.files) == files_before  # (a) no data movement
    assert m.partition_spec == ["o_orderpriority"]
    cat.append(t, orders.filter("o_orderkey % 2 = 1"))  # new spec applies
    m2 = ops.current()
    old_files = set(files_before)
    new_files = [f for f in m2.files if f not in old_files]
    assert new_files and all(
        m2.file_partitions[f].get("o_orderpriority") for f in new_files
    )  # (b) new files partitioned...
    assert all(f not in m2.file_partitions for f in old_files)  # ...old not
    keep, total = cat.select_files(t, "o_orderpriority", "=", "1-URGENT")
    kept_new = [f for f in keep if f not in old_files]
    assert all(
        m2.file_partitions[f]["o_orderpriority"] == "1-URGENT" for f in kept_new
    )  # (c) every kept new file covers the probe
    assert len(kept_new) < len(new_files)  # non-covering new files pruned
    from .util import dround

    out = cat.scan_pruned(t, "o_orderpriority", "=", "1-URGENT").select(
        "o_orderkey", "o_orderpriority", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, out, root)


@register(
    "branch_cherry_pick",
    oracle="""
SELECT * FROM (VALUES
  ('1', 'James',   'Smith',    32, 'M'),
  ('2', 'Michael', 'Rose',     35, 'M'),
  ('3', 'Robert',  'Williams', 41, 'M'),
  ('4', 'Maria',   'Jones',    36, 'F'),
  ('5', 'Jen',     'Brown',    44, 'F'),
  ('6', 'Monika',  'Geller',   31, 'F'),
  ('9', 'Nora',    'Hale',     29, 'F')
) AS t(id, firstname, lastname, age, gender)
""",
)
def branch_cherry_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-commit cherry-pick (the lakeFS ``cherry-pick`` command —
    replay ONE commit onto another ref, not the whole branch like merge):
    dev makes two commits, A touching workers and B creating teams;
    cherry-picking B onto main brings ONLY the teams table over — main's
    workers never sees commit A's row. Then main moves its own workers
    forward, and cherry-picking A must refuse (two-phase pre-image check,
    all-or-nothing, same contract as merge). Metadata fast-forward only —
    zero data file movement, exactly like merge's apply path.

    Returns main's workers: the seed six plus main's own '9' — commit A's
    '7' must be absent (selectivity is the whole point)."""
    from ..catalog import MergeConflictError

    cat, root = _seeded(spark)
    cat.create_branch("repo", "dev", "main")
    # commit A: dev modifies workers
    cat.insert_values("repo.dev.company.workers", [("7", "Jhon", "Smith", 33, "M")])
    cid_a = cat.commit_branch("repo", "dev", "A: add worker 7")
    # commit B: dev creates a brand-new table
    teams = local_df(spark, 
        [("t1", "search"), ("t2", "infra")], "team_id string, name string"
    )
    cat.create_table_as("repo.dev.company.teams", teams)
    cid_b = cat.commit_branch("repo", "dev", "B: add teams")
    # cherry-pick ONLY B onto main: teams appears, workers untouched
    cat.cherry_pick("repo", cid_b, "main")
    got = {tuple(r) for r in bounded_rows(cat.scan("repo.main.company.teams"))}
    assert got == {("t1", "search"), ("t2", "infra")}, got
    # main now advances workers on its own ...
    cat.insert_values("repo.main.company.workers", [("9", "Nora", "Hale", 29, "F")])
    # ... so commit A's pre-image no longer holds: cherry-pick must refuse
    try:
        cat.cherry_pick("repo", cid_a, "main")
        raise AssertionError("cherry-pick of A should conflict")
    except MergeConflictError:
        pass
    return _materialize(spark, cat.scan("repo.main.company.workers"), root)


@register(
    "maint_compact_expire_gc",
    oracle="""
SELECT * FROM (VALUES
  ('1',  'James',   'Smith',    32, 'M'),
  ('2',  'Michael', 'Rose',     35, 'M'),
  ('3',  'Robert',  'Williams', 41, 'M'),
  ('4',  'Maria',   'Jones',    36, 'F'),
  ('5',  'Jen',     'Brown',    44, 'F'),
  ('6',  'Monika',  'Geller',   31, 'F'),
  ('7',  'w7',      'n7',       27, 'M'),
  ('8',  'w8',      'n8',       28, 'F'),
  ('9',  'w9',      'n9',       29, 'M'),
  ('10', 'w10',     'n10',      30, 'F'),
  ('11', 'w11',     'n11',      31, 'M')
) AS t(id, firstname, lastname, age, gender)
""",
)
def maint_compact_expire_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full table-maintenance cycle Iceberg ships as three procedures —
    rewrite_data_files + expire_snapshots + remove_orphan_files — run end to
    end: five single-row appends fragment the table into 6+ small files,
    compact() rewrites them into one (a normal metadata commit — history
    still reads the fragmented versions), expire_versions() drops the old
    manifests, and garbage_collect() reclaims exactly the data files no
    live snapshot references. Asserted mid-flow: fragmentation really
    happened, the compacted manifest lists ONE file, GC removes only
    unreferenced files (dry-run first — the read-back after real GC proves
    no live file was touched).

    At 100 TB this cycle IS the storage-cost story: streaming ingestion
    fragments relentlessly; compaction restores scan efficiency; expiry
    bounds metadata; reachability-based GC (repo-wide, branch-aware —
    zero-copy branches share files, so per-branch deletion is unsafe) is
    the only safe reclamation."""
    cat, root = _seeded(spark)
    t = "repo.main.company.workers"
    for i in range(7, 12):
        cat.insert_values(t, [(str(i), f"w{i}", f"n{i}", 20 + i, "M" if i % 2 else "F")])
    ops = cat._ops(t)[0]
    frag = ops.current()
    assert frag.version == 6 and len(frag.files) >= 6, (frag.version, len(frag.files))
    cat.compact(t, target_files=1)
    m = ops.current()
    assert len(m.files) == 1, m.files
    expired = cat.expire_versions(t, keep_last=1)
    assert expired == [1, 2, 3, 4, 5, 6], expired
    orphans = cat.garbage_collect("repo", dry_run=True)
    assert len(orphans) >= 6 and not any(f in orphans for f in m.files), orphans
    removed = cat.garbage_collect("repo")
    assert removed == orphans, (removed, orphans)
    out = cat.scan(t)
    assert out.count() == 11  # live snapshot untouched by GC
    return _materialize(spark, out, root)


@register(
    "ddl_add_files",
    oracle="""
SELECT * FROM (VALUES
  ('1',  'James',   'Smith',    32, 'M'),
  ('2',  'Michael', 'Rose',     35, 'M'),
  ('3',  'Robert',  'Williams', 41, 'M'),
  ('4',  'Maria',   'Jones',    36, 'F'),
  ('5',  'Jen',     'Brown',    44, 'F'),
  ('6',  'Monika',  'Geller',   31, 'F'),
  ('20', 'ext20',   'legacy',   50, 'M'),
  ('21', 'ext21',   'legacy',   51, 'F'),
  ('22', 'ext22',   'legacy',   52, 'M'),
  ('23', 'ext23',   'legacy',   53, 'F')
) AS t(id, firstname, lastname, age, gender)
""",
)
def ddl_add_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``add_files`` import: a directory of pre-existing parquet
    (two files, written outside the catalog) is registered into the table
    with ONE metadata commit — no row rewrite, no Spark job over the data.
    Asserted mid-flow: exactly one version bump, the base snapshot's files
    all survive untouched, exactly two files joined the manifest with
    footer stats harvested, and a schema-mismatched import refuses with
    SchemaMismatchError before anything commits. Time travel to the
    pre-import version still reads the original six rows."""
    from ..catalog import SchemaMismatchError

    cat, root = _seeded(spark)
    t = "repo.main.company.workers"
    ext_dir = tempfile.mkdtemp(prefix="legacy-parquet-")
    ext_rows = [(str(i), f"ext{i}", "legacy", 30 + i, "M" if i % 2 == 0 else "F")
                for i in range(20, 24)]
    local_df(spark, ext_rows, WORKERS_SCHEMA).repartition(2).write.mode(
        "overwrite"
    ).parquet(ext_dir)
    ops = cat._ops(t)[0]
    before = ops.current()
    n = cat.add_files(t, ext_dir)
    m = ops.current()
    assert n == 2 and m.version == before.version + 1, (n, m.version)
    assert set(before.files) <= set(m.files), "import must not drop base files"
    added = sorted(set(m.files) - set(before.files))
    assert len(added) == 2 and all(m.file_stats.get(f) for f in added), added
    assert cat.scan(t, version=before.version).count() == 6  # time travel intact
    bad = local_df(spark, [(1, "x")], "k int, v string")
    bad_dir = tempfile.mkdtemp(prefix="bad-parquet-")
    bad.write.mode("overwrite").parquet(bad_dir)
    try:
        cat.add_files(t, bad_dir)
        raise AssertionError("schema-mismatched import must refuse")
    except SchemaMismatchError:
        pass
    shutil.rmtree(ext_dir, ignore_errors=True)
    shutil.rmtree(bad_dir, ignore_errors=True)
    return _materialize(spark, cat.scan(t), root)


@register(
    "sql_call_procedures",
    oracle="""
SELECT * FROM (VALUES
  ('1', 'James',   'Smith',    32, 'M'),
  ('2', 'Michael', 'Rose',     35, 'M'),
  ('3', 'Robert',  'Williams', 41, 'M'),
  ('4', 'Maria',   'Jones',    36, 'F'),
  ('5', 'Jen',     'Brown',    44, 'F'),
  ('6', 'Monika',  'Geller',   31, 'F'),
  ('7', 'Jhon',    'Smith',    33, 'M')
) AS t(id, firstname, lastname, age, gender)
""",
)
def sql_call_procedures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg's CALL system.<proc>() surface, driven entirely through the
    SQL facade: a dev-branch commit is cherry-picked onto main by
    ``CALL system.cherrypick_snapshot(...)``, then
    ``CALL system.expire_snapshots(...)`` + ``CALL
    system.remove_orphan_files(...)`` run the retention pair and their
    result sets (expired versions, reclaimed paths) come back as
    DataFrames, exactly like Iceberg procedure output rows. The dedicated
    OPTIMIZE/VACUUM/RESTORE statements stay the spelling for the rewrite/
    vacuum/rollback verbs; CALL covers the rest of the procedure
    namespace."""
    from ..catalog.sql_facade import SqlFacade

    cat, root = _seeded(spark)
    f = SqlFacade(cat)
    cat.create_branch("repo", "dev", "main")
    cat.insert_values("repo.dev.company.workers", [("7", "Jhon", "Smith", 33, "M")])
    cid = cat.commit_branch("repo", "dev", "add 7")
    out = f.sql(f"CALL system.cherrypick_snapshot('repo', '{cid}', 'main')")
    assert bounded_rows(out)[0][0]  # new commit id on main
    # workers on main is now at v2; expire v1 and reclaim its orphans
    expired = bounded_rows(f.sql(
        "CALL system.expire_snapshots('repo.main.company.workers', 1)"
    ))
    assert [r[0] for r in expired] == [1], expired
    removed = bounded_rows(f.sql("CALL system.remove_orphan_files('repo')"))
    # v1's file is shared with dev's live chain, so nothing is reclaimable
    # until dev drops too — reachability is repo-wide by design
    assert removed == [], removed
    cat.delete_branch("repo", "dev")
    assert f.sql("CALL system.remove_orphan_files('repo')").count() == 0
    return _materialize(spark, cat.scan("repo.main.company.workers"), root)


@register(
    "ddl_analyze_stats",
    oracle="""
SELECT * FROM (VALUES
  ('stats.row_count',            '6'),
  ('stats.id.ndv',               '6'),
  ('stats.id.null_count',        '0'),
  ('stats.firstname.ndv',        '6'),
  ('stats.firstname.null_count', '0'),
  ('stats.lastname.ndv',         '6'),
  ('stats.lastname.null_count',  '0'),
  ('stats.age.ndv',              '6'),
  ('stats.age.null_count',       '0'),
  ('stats.gender.ndv',           '2'),
  ('stats.gender.null_count',    '0')
) AS t(stat_key, stat_value)
""",
)
def ddl_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS through the SQL
    facade: one distributed pass computes row count + per-column NDV/null
    counts, commits them as table properties (metadata-only — asserted: the
    file list is untouched and exactly one version was added), and the
    statement returns the stats as rows. A second read via
    table_properties() proves they persisted to the manifest, where a
    cost-based planner (or DESCRIBE EXTENDED) reads them for free."""
    from ..catalog.sql_facade import SqlFacade

    cat, root = _seeded(spark)
    t = "repo.main.company.workers"
    ops = cat._ops(t)[0]
    before = ops.current()
    f = SqlFacade(cat)
    out = f.sql(f"ANALYZE TABLE lakefs.{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    m = ops.current()
    assert m.version == before.version + 1 and m.files == before.files
    props = cat.table_properties(t)
    assert props.get("stats.row_count") == "6", props
    return _materialize(spark, out, root)


@register(
    "branch_diff_rows",
    oracle="""
SELECT * FROM (VALUES
  ('added',   '7', 'Jhon',  'Smith',  33, 'M'),
  ('added',   '8', 'Marta', 'Green',  31, 'F'),
  ('removed', '5', 'Jen',   'Brown',  44, 'F'),
  ('removed', '6', 'Monika','Geller', 31, 'F')
) AS t(change_type, id, firstname, lastname, age, gender)
""",
)
def branch_diff_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level branch diff (the ``lakectl diff`` result set, not just
    diff_equal's boolean): rows on dev but not main tagged 'added', rows on
    main but not dev tagged 'removed' — computed as two exceptAll passes
    over the SAME pair of scans. Multiset semantics: a row duplicated N
    times on one side and N-1 on the other diffs as ONE change, which
    set-based EXCEPT would miss.

    Scale shape: exceptAll is one hash exchange per side on the full row;
    at 100 TB you narrow it with the manifest first — only tables whose
    version moved (the branch state's {table: version} map) are scanned at
    all, and file-level diffs (meta_files) bound which files can contain
    changes. The row diff is the last, smallest step of that funnel."""
    cat, root = _seeded(spark)
    cat.create_branch("repo", "dev", "main")
    cat.delete_where("repo.dev.company.workers", "id IN ('5', '6')")
    cat.insert_values("repo.dev.company.workers", [("7", "Jhon", "Smith", 33, "M")])
    cat.insert_values("repo.dev.company.workers", [("8", "Marta", "Green", 31, "F")])
    a = cat.scan("repo.dev.company.workers")
    b = cat.scan("repo.main.company.workers")
    diff = a.exceptAll(b).select(F.lit("added").alias("change_type"), "*").unionByName(
        b.exceptAll(a).select(F.lit("removed").alias("change_type"), "*")
    )
    return _materialize(spark, diff, root)


@register(
    "sink_sharded_manifests",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderstatus,
       round(o_totalprice, 2)     AS total
FROM orders WHERE o_orderstatus = 'F'
""",
)
def sink_sharded_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARDED manifest metadata end to end (SCALE.md 'Manifest metadata at
    scale', the Iceberg manifest-list design): with
    write.metadata.shard-partitions=true, every commit writes one small
    LIST object (table state + shard index) plus per-partition PART
    objects carrying the per-file maps. The list stays the single
    put-if-absent commit arbiter — the lock-free protocol is unchanged —
    while a partition-pruned scan loads ONLY the shards whose partition
    value can match (proven by a store-read assertion in
    tests/test_manifest_sharding.py). At 100 TB this turns 'read O(files)
    manifest metadata per plan' into 'read the matching partitions'
    parts', the step SCALE.md deferred until a deployment outgrows one
    JSON object.

    Mid-flow assertions: the committed list object is genuinely sharded
    (no inline files, one shard per o_orderstatus), and the shard-pruned
    manifest the planner loads holds exactly the matching partition's
    files."""
    import json as _json

    from ..catalog.manifest import METADATA_SHARD_PROP

    root = tempfile.mkdtemp(prefix="vcat-shard-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = "repo.main.db.orders_sharded"
    cat.create_table(
        t,
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
        properties={METADATA_SHARD_PROP: "true"},
        partition_by=["o_orderstatus"],
    )
    cat.append(t, orders)
    ops, _ = cat._ops(t)
    d = ops.peek_version(ops.current_version())
    assert "shards" in d and d["files"] == [], "commit did not shard"
    statuses = {i["partition"]["o_orderstatus"] for i in d["shards"].values()}
    assert statuses == {"F", "O", "P"}, statuses
    pruned, total = cat._current_shard_pruned(ops, ["repo"], "o_orderstatus", "=", "F")
    f_files = set(
        _json.loads(ops.store.read(
            ops.meta_dir + "/" + d["shards"][_json.dumps({"o_orderstatus": "F"})]["part"]
        ))["files"]
    )
    assert set(pruned.files) == f_files, "shard pruning loaded the wrong parts"
    assert total == sum(i["n_files"] for i in d["shards"].values())
    from .util import dround

    out = cat.scan_pruned(t, "o_orderstatus", "=", "F").select(
        "o_orderkey", "o_orderstatus", dround("o_totalprice", 2).alias("total")
    )
    return _materialize(spark, out, root)


def export_history_appends(cat: "VersionedCatalog", t: str, commit_fn):
    """Replay a versioned table's snapshot history as APPEND commits of an
    external writer: snapshots() (metadata-only, O(versions) rows) says
    which versions added files, table_changes reads exactly those rows
    distributed, and ``commit_fn(delta_df)`` lands each version — no
    snapshot ever materializes on the driver. Non-append histories
    (remove or MoR-delete commits) refuse loudly: replaying only the adds
    would silently resurrect deleted rows in the exported table. Returns
    commit_fn's results in version order."""
    from .util import bounded_rows

    out = []
    for s in bounded_rows(cat.snapshots(t)):
        if s["removed_files"] or s["n_pending_deletes"]:
            raise NotImplementedError(
                f"export of non-append history (version {s['version']} "
                f"{s['operation']}) is not supported"
            )
        if s["added_files"] == 0:
            continue  # metadata-only commit: nothing to export
        v = s["version"]
        delta = (
            cat.scan(t, version=1) if v == 1 else cat.table_changes(t, v - 1, v)
        )
        out.append(commit_fn(delta))
    return out


@register(
    "sink_iceberg_export",
    oracle="""
WITH w AS (
  SELECT * FROM (VALUES
    ('1', 'James',   32, 'M'), ('2', 'Michael', 35, 'M'),
    ('3', 'Robert',  41, 'M'), ('4', 'Maria',   36, 'F'),
    ('5', 'Jen',     44, 'F'), ('6', 'Monika',  31, 'F'),
    ('7', 'Zoe',     28, 'F')
  ) AS t(id, firstname, age, gender))
SELECT id, firstname, CAST(age AS INTEGER) AS age, gender FROM w
""",
)
def sink_iceberg_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPORT a versioned-catalog table as a REAL Apache Iceberg v2 layout
    (the write-side complement of source_iceberg_metadata): each catalog
    snapshot replays as an Iceberg append — parquet data files, Avro
    manifests/manifest lists written by the real Apache Avro Java library,
    v<N>.metadata.json chain — so a user can hand tables BACK to stock
    Iceberg (the reference's runtime) without a copy ceremony. The export
    is verified by scanning the Iceberg layout through the independent
    metadata walker (catalog/iceberg_format.py) and through snapshot time
    travel, then returning those rows for the oracle hash-compare.

    Scale: export writes are per-snapshot appends — the data files stream
    through the normal distributed writer; only the O(files) metadata is
    driver-side, same as Iceberg's own commit path. Which versions appended
    what comes from the MANIFEST (snapshots() metadata rows + table_changes'
    added-files incremental scan), so the export never materializes a
    snapshot on the driver — IO is proportional to each version's delta,
    not versions × table size (VERDICT r6 #3)."""
    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    root = tempfile.mkdtemp(prefix="vcat-iceexp-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    t = "repo.main.db.people"
    base = local_df(spark, 
        [
            ("1", "James", 32, "M"), ("2", "Michael", 35, "M"),
            ("3", "Robert", 41, "M"), ("4", "Maria", 36, "F"),
            ("5", "Jen", 44, "F"), ("6", "Monika", 31, "F"),
        ],
        "id string, firstname string, age int, gender string",
    )
    cat.create_table_as(t, base)
    cat.append(t, local_df(spark, [("7", "Zoe", 28, "F")], base.schema))

    # replay the catalog's snapshot history as genuine Iceberg appends,
    # delta-by-manifest: snapshots() (metadata-only, O(versions) rows) says
    # which versions added files; table_changes reads EXACTLY those files
    # distributed — no snapshot ever collects to the driver
    exp_dir = tempfile.mkdtemp(prefix="iceberg-export-")
    w = IcebergTableWriter(spark, exp_dir)
    snap_ids = export_history_appends(cat, t, w.append)

    back = scan_iceberg_table(spark, exp_dir)
    assert back.count() == 7
    # snapshot-level parity: the first exported snapshot is the CTAS set
    assert scan_iceberg_table(spark, exp_dir, snapshot_id=snap_ids[0]).count() == 6
    out = back.select("id", "firstname", "age", "gender")
    pinned = _materialize(spark, out, root)  # collects before dirs vanish
    shutil.rmtree(exp_dir, ignore_errors=True)
    return pinned


@register(
    "sink_delta_export",
    oracle="""
WITH w AS (
  SELECT * FROM (VALUES
    ('1', 'James',   32, 'M'), ('2', 'Michael', 35, 'M'),
    ('3', 'Robert',  41, 'M'), ('4', 'Maria',   36, 'F'),
    ('5', 'Jen',     44, 'F'), ('6', 'Monika',  31, 'F'),
    ('7', 'Zoe',     28, 'F')
  ) AS t(id, firstname, age, gender))
SELECT id, firstname, CAST(age AS INTEGER) AS age, gender FROM w
""",
)
def sink_delta_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPORT a versioned-catalog table as a REAL Delta Lake layout (the
    write-side complement of source_delta_log, completing both-direction
    interop for the SECOND open table format beside Iceberg's
    sink_iceberg_export): each catalog snapshot replays as one Delta
    commit — parquet data files plus protocol/metaData/add actions in a
    genuine `_delta_log` chain — then a checkpoint parquet +
    `_last_checkpoint` is written at head so a stock Delta reader can
    fold from the checkpoint alone. Verified by scanning the export
    through the independent log reader (catalog/delta_format.py) at head
    AND time-travelled to the first exported commit.

    Scale: same delta-by-manifest discipline as the Iceberg export —
    snapshots() (metadata-only) says which versions added files,
    table_changes reads exactly those rows distributed, and no snapshot
    ever materializes on the driver; per-commit data files stream
    through the normal writer."""
    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    root = tempfile.mkdtemp(prefix="vcat-deltaexp-")
    cat = VersionedCatalog(spark, root)
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    t = "repo.main.db.people"
    base = local_df(spark, 
        [
            ("1", "James", 32, "M"), ("2", "Michael", 35, "M"),
            ("3", "Robert", 41, "M"), ("4", "Maria", 36, "F"),
            ("5", "Jen", 44, "F"), ("6", "Monika", 31, "F"),
        ],
        "id string, firstname string, age int, gender string",
    )
    cat.create_table_as(t, base)
    cat.append(t, local_df(spark, [("7", "Zoe", 28, "F")], base.schema))

    exp_dir = tempfile.mkdtemp(prefix="delta-export-")
    w = DeltaTableWriter(spark, exp_dir)
    delta_versions = export_history_appends(
        cat, t, lambda delta: w.commit(add_dfs=[delta])
    )
    w.checkpoint()  # stock readers fold from here; old JSONs truncatable

    back = scan_delta_table(spark, exp_dir)
    assert back.count() == 7
    # commit-level parity: the first exported commit is the CTAS set
    assert scan_delta_table(spark, exp_dir, version=delta_versions[0]).count() == 6
    out = back.select("id", "firstname", "age", "gender")
    pinned = _materialize(spark, out, root)  # collects before dirs vanish
    shutil.rmtree(exp_dir, ignore_errors=True)
    return pinned
