"""SQL-facade replay of the reference's SQL surface
(TestLakeFSCatalogSpark.java:60-96 + tests/test_iceberg.py DML forms)."""

from __future__ import annotations

import pytest

from lakefs_iceberg_catalog_spark.catalog import (
    NamespaceNotEmptyError,
    UnsupportedOperationError,
    VersionedCatalog,
)
from lakefs_iceberg_catalog_spark.catalog.sql_facade import SqlFacade

from .test_catalog import WORKERS_ROWS, WORKERS_SCHEMA


@pytest.fixture
def facade(spark, tmp_path):
    c = VersionedCatalog(spark, str(tmp_path / "wh"))
    c.create_repository("repo", "main")
    c.create_namespace("repo.main.company")
    df = spark.createDataFrame([(str(r[0]),) + r[1:] for r in WORKERS_ROWS], WORKERS_SCHEMA)
    c.create_table_as("repo.main.company.workers", df)
    return SqlFacade(c)


def test_select_with_backticked_identifier(facade):
    df = facade.sql(
        "SELECT id, age FROM lakefs.`repo`.`main`.company.workers WHERE age > 35 ORDER BY id"
    )
    assert [(r.id, r.age) for r in df.collect()] == [("3", 41), ("4", 36), ("5", 44)]


def test_join_two_branches_in_one_query(facade):
    facade.catalog.commit_branch("repo", "main", "seed")
    facade.catalog.create_branch("repo", "b1", "main")
    facade.sql("DELETE FROM lakefs.repo.b1.company.workers WHERE id = '6'")
    df = facade.sql(
        """
        SELECT m.id FROM lakefs.repo.main.company.workers m
        LEFT ANTI JOIN lakefs.repo.b1.company.workers b ON m.id = b.id
        """
    )
    assert [r.id for r in df.collect()] == ["6"]


def test_full_ddl_dml_lifecycle(facade):
    facade.sql("CREATE SCHEMA lakefs.repo.main.db")
    facade.sql("CREATE TABLE lakefs.repo.main.db.mytable (val int)")
    facade.sql("INSERT INTO lakefs.repo.main.db.mytable VALUES (10)")
    out = facade.sql("SELECT * FROM lakefs.repo.main.db.mytable")
    assert [r.val for r in out.collect()] == [10]
    tables = facade.sql("SHOW TABLES IN lakefs.repo.main.db").collect()
    assert [(t.namespace, t.tableName) for t in tables] == [("repo.main.db", "mytable")]
    with pytest.raises(NamespaceNotEmptyError):
        facade.sql("DROP SCHEMA lakefs.repo.main.db")  # non-empty guard
    facade.sql("DROP TABLE lakefs.repo.main.db.mytable")
    facade.sql("DROP SCHEMA lakefs.repo.main.db")


def test_insert_delete_update_where(facade):
    facade.sql(
        "INSERT INTO lakefs.repo.main.company.workers VALUES ('7', 'Jhon', 'Smith', 33, 'M'), ('8', 'Marta', 'Green', 31, 'F')"
    )
    assert facade.sql("SELECT * FROM lakefs.repo.main.company.workers").count() == 8
    facade.sql("DELETE FROM lakefs.repo.main.company.workers WHERE id IN ('4', '5')")
    assert facade.sql("SELECT * FROM lakefs.repo.main.company.workers").count() == 6
    facade.sql("UPDATE lakefs.repo.main.company.workers SET age = age + 1 WHERE gender = 'F'")
    got = {
        (r.id, r.age)
        for r in facade.sql("SELECT id, age FROM lakefs.repo.main.company.workers").collect()
    }
    assert ("6", 32) in got and ("8", 32) in got and ("1", 32) in got


def test_use_show_tables_current_namespace(facade):
    """Replays the reference E2E's session-namespace sequence
    (TestLakeFSCatalogSpark.java:60-88): CREATE SCHEMA, CREATE TABLE,
    INSERT, USE <ns>, bare SHOW TABLES, SHOW CURRENT NAMESPACE."""
    facade.sql("CREATE SCHEMA lakefs.repo.main.db")
    facade.sql("CREATE TABLE lakefs.repo.main.db.tbl (val int)")
    facade.sql("INSERT INTO lakefs.repo.main.db.tbl VALUES (10)")
    facade.sql("USE lakefs.`repo`.`main`.db")
    tables = facade.sql("SHOW TABLES").collect()
    assert [(t.namespace, t.tableName) for t in tables] == [("repo.main.db", "tbl")]
    cur = facade.sql("SHOW CURRENT NAMESPACE").collect()
    assert [(r.catalog, r.namespace) for r in cur] == [("lakefs", "repo.main.db")]
    # branch-level USE works too (DESCRIBE SCHEMA repo.main depth)
    facade.sql("USE lakefs.repo.main")
    assert facade.sql("SHOW CURRENT NAMESPACE").collect()[0].namespace == "repo.main"


def test_use_missing_namespace_raises(facade):
    from lakefs_iceberg_catalog_spark.catalog import NoSuchNamespaceError

    with pytest.raises(NoSuchNamespaceError):
        facade.sql("USE lakefs.repo.main.nope")
    with pytest.raises(UnsupportedOperationError):
        facade.sql("SHOW TABLES")  # no USE yet in this facade session


def test_merge_into_values_source(facade):
    """MERGE INTO with a VALUES source: updates worker 2, inserts worker 9 —
    the dml_merge_upsert scenario expressed through the SQL form the
    reference's pinned Iceberg extensions expose."""
    facade.sql(
        """
        MERGE INTO lakefs.repo.main.company.workers AS t
        USING (SELECT * FROM (VALUES ('2', 'Mike', 'Rose', 36, 'M'),
                                     ('9', 'Noor', 'Khan', 29, 'F'))) AS s(id, firstname, lastname, age, gender)
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    got = {
        (r.id, r.firstname, r.lastname, r.age, r.gender)
        for r in facade.sql("SELECT * FROM lakefs.repo.main.company.workers").collect()
    }
    assert ("2", "Mike", "Rose", 36, "M") in got
    assert ("9", "Noor", "Khan", 29, "F") in got
    assert len(got) == 7


def test_merge_into_table_source_and_refusals(facade):
    facade.catalog.commit_branch("repo", "main", "seed")
    facade.catalog.create_branch("repo", "b2", "main")
    facade.sql("UPDATE lakefs.repo.b2.company.workers SET age = 99 WHERE id = '1'")
    facade.sql(
        """
        MERGE INTO lakefs.repo.main.company.workers t
        USING lakefs.repo.b2.company.workers s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
        """
    )
    got = {
        (r.id, r.age)
        for r in facade.sql("SELECT id, age FROM lakefs.repo.main.company.workers").collect()
    }
    assert ("1", 99) in got and len(got) == 6
    # column-level SET is now part of the grammar (round 15) — it applies
    # instead of refusing; only genuinely out-of-grammar actions refuse
    facade.sql(
        "MERGE INTO lakefs.repo.main.company.workers t USING lakefs.repo.b2.company.workers s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET age = 1"
    )
    aged = {
        (r.id, r.age)
        for r in facade.sql("SELECT id, age FROM lakefs.repo.main.company.workers").collect()
    }
    assert aged == {(i, 1) for i, _ in aged} and len(aged) == 6
    with pytest.raises(UnsupportedOperationError):
        facade.sql(
            "MERGE INTO lakefs.repo.main.company.workers t USING lakefs.repo.b2.company.workers s "
            "ON t.id = s.id WHEN MATCHED THEN FROBNICATE"
        )
    with pytest.raises(UnsupportedOperationError):
        facade.sql(
            "MERGE INTO lakefs.repo.main.company.workers t USING lakefs.repo.b2.company.workers s "
            "ON t.id < s.id WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )


def test_merge_into_subquery_source_with_inner_join_on(facade):
    """A MERGE source subquery may itself contain JOIN ... ON — the facade
    must split the statement at the TOP-LEVEL ON, not the first ' ON '
    inside the parens (round-2 ADVICE regression)."""
    facade.sql(
        """
        MERGE INTO lakefs.repo.main.company.workers AS t
        USING (SELECT a.c0 AS id, a.c1 AS firstname, a.c2 AS lastname,
                      b.c1 AS age, a.c4 AS gender
               FROM (VALUES ('2', 'Mia', 'Rose', 0, 'F')) a(c0, c1, c2, c3, c4)
               JOIN (VALUES ('2', 77)) b(c0, c1) ON a.c0 = b.c0) AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    got = {
        (r.id, r.firstname, r.age)
        for r in facade.sql("SELECT id, firstname, age FROM lakefs.repo.main.company.workers").collect()
    }
    assert ("2", "Mia", 77) in got and len(got) == 6


def test_alter_table_rename_drop_column_sql_forms(facade):
    """ALTER TABLE ... RENAME COLUMN / DROP COLUMN dispatch to the
    metadata-only evolution ops; bare table RENAME stays refused."""
    facade.sql(
        "ALTER TABLE lakefs.repo.main.company.workers RENAME COLUMN firstname TO given_name"
    )
    facade.sql("ALTER TABLE lakefs.repo.main.company.workers DROP COLUMN lastname")
    df = facade.sql("SELECT * FROM lakefs.repo.main.company.workers")
    assert set(df.columns) == {"id", "given_name", "age", "gender"}
    assert df.count() == 6
    with pytest.raises(UnsupportedOperationError):
        facade.sql("ALTER TABLE lakefs.repo.main.company.workers RENAME TO x")


def test_alter_table_alter_column_type(facade):
    """ALTER TABLE ... ALTER COLUMN ... TYPE dispatches to the metadata-only
    widening op; lossy promotions are refused with the same statement form."""
    facade.sql("ALTER TABLE lakefs.repo.main.company.workers ALTER COLUMN age TYPE bigint")
    df = facade.sql("SELECT * FROM lakefs.repo.main.company.workers")
    assert dict(df.dtypes)["age"] == "bigint"
    assert df.count() == 6
    with pytest.raises(UnsupportedOperationError):
        facade.sql(
            "ALTER TABLE lakefs.repo.main.company.workers ALTER COLUMN age TYPE int"
        )


def test_malformed_tblproperties_raises_unsupported(facade):
    with pytest.raises(UnsupportedOperationError):
        facade.sql(
            "ALTER TABLE lakefs.repo.main.company.workers SET TBLPROPERTIES ('owner')"
        )


def test_describe_schema_and_rename_refused(facade):
    info = facade.sql("DESCRIBE SCHEMA lakefs.repo.main.company").collect()
    assert any(r.info_name == "location" for r in info)
    with pytest.raises(UnsupportedOperationError):
        facade.sql("ALTER TABLE lakefs.repo.main.company.workers RENAME TO x")
    with pytest.raises(UnsupportedOperationError):
        facade.sql("TRUNCATE TABLE lakefs.repo.main.company.workers")


def test_show_namespaces_and_ctas(facade):
    facade.sql("CREATE SCHEMA lakefs.repo.main.db2")
    ns = facade.sql("SHOW NAMESPACES IN lakefs.repo.main").collect()
    assert [r.namespace for r in ns] == ["repo.main.company", "repo.main.db2"]
    # bare form follows USE; SCHEMAS is an accepted synonym
    facade.sql("USE lakefs.repo.main")
    assert [r.namespace for r in facade.sql("SHOW SCHEMAS").collect()] == [
        "repo.main.company", "repo.main.db2",
    ]
    # top-level listing stays a preserved non-capability
    fresh = SqlFacade(facade.catalog)
    with pytest.raises(UnsupportedOperationError):
        fresh.sql("SHOW NAMESPACES")
    # CTAS from a lakefs source table
    facade.sql(
        "CREATE TABLE lakefs.repo.main.db2.seniors AS "
        "SELECT id, age FROM lakefs.repo.main.company.workers WHERE age > 40"
    )
    out = facade.sql("SELECT id, age FROM lakefs.repo.main.db2.seniors ORDER BY id")
    assert [(r.id, r.age) for r in out.collect()] == [("3", 41), ("5", 44)]


def test_alter_table_add_column(facade):
    facade.sql("ALTER TABLE lakefs.repo.main.company.workers ADD COLUMN team string")
    out = facade.sql(
        "SELECT id, team FROM lakefs.repo.main.company.workers WHERE id = '1'"
    ).collect()
    assert [(r.id, r.team) for r in out] == [("1", None)]  # old files read NULL
    # parenthesized multi-word type form
    facade.sql("ALTER TABLE lakefs.repo.main.company.workers ADD COLUMNS (bonus decimal(10,2))")
    schema = facade.sql("SELECT * FROM lakefs.repo.main.company.workers").schema
    assert schema.fieldNames()[-2:] == ["team", "bonus"]


def test_set_unset_tblproperties(facade):
    facade.sql(
        "ALTER TABLE lakefs.repo.main.company.workers "
        "SET TBLPROPERTIES ('owner' = 'data-eng', 'retention.days' = '30')"
    )
    props = facade.catalog.table_properties("repo.main.company.workers")
    assert props["owner"] == "data-eng" and props["retention.days"] == "30"
    facade.sql(
        "ALTER TABLE lakefs.repo.main.company.workers UNSET TBLPROPERTIES ('owner')"
    )
    props = facade.catalog.table_properties("repo.main.company.workers")
    assert "owner" not in props and props["retention.days"] == "30"
    # property commits are metadata-only: data still reads back intact
    assert facade.sql("SELECT * FROM lakefs.repo.main.company.workers").count() == 6


def test_create_table_partitioned_by_sql_forms(facade):
    """CREATE TABLE ... PARTITIONED BY and partitioned CTAS declare an
    identity partition spec; writes land one-partition-per-file and the
    planner prunes on the partition value."""
    facade.sql(
        "CREATE TABLE lakefs.repo.main.company.events_p "
        "(ev_id int, kind string) PARTITIONED BY (kind)"
    )
    facade.sql(
        "INSERT INTO lakefs.repo.main.company.events_p VALUES "
        "(1, 'click'), (2, 'view'), (3, 'click')"
    )
    df = facade.sql(
        "SELECT * FROM lakefs.repo.main.company.events_p WHERE kind = 'click'"
    )
    assert {r["ev_id"] for r in df.collect()} == {1, 3}
    keep, total = facade.catalog.select_files(
        "repo.main.company.events_p", "kind", "=", "click"
    )
    assert 0 < len(keep) < total
    facade.sql(
        "CREATE TABLE lakefs.repo.main.company.workers_by_gender "
        "PARTITIONED BY (gender) AS "
        "SELECT gender, age FROM lakefs.repo.main.company.workers"
    )
    m = facade.catalog._ops("repo.main.company.workers_by_gender")[0].current()
    assert m.partition_spec == ["gender"]
    assert all("gender=" in f for f in m.files)


def test_select_time_travel_sql_forms(facade):
    """FOR VERSION AS OF / FOR TIMESTAMP AS OF suffixes on lakefs
    identifiers pin historic snapshots inside stock SELECT queries."""
    import time as _t
    from datetime import datetime, timezone

    ts_after_v1 = _t.time()
    facade.sql("DELETE FROM lakefs.repo.main.company.workers WHERE age >= 35")
    cur = facade.sql("SELECT * FROM lakefs.repo.main.company.workers")
    assert cur.count() == 2
    v1 = facade.sql(
        "SELECT * FROM lakefs.repo.main.company.workers FOR VERSION AS OF 1"
    )
    assert v1.count() == 6
    iso = datetime.fromtimestamp(ts_after_v1, tz=timezone.utc).isoformat()
    tt = facade.sql(
        f"SELECT count(*) AS n FROM lakefs.repo.main.company.workers "
        f"FOR TIMESTAMP AS OF '{iso}'"
    )
    assert tt.collect()[0]["n"] == 6
    # both snapshots joinable in ONE query (distinct view per pin)
    both = facade.sql(
        "SELECT count(*) AS gone FROM "
        "lakefs.repo.main.company.workers FOR VERSION AS OF 1 a "
        "LEFT ANTI JOIN lakefs.repo.main.company.workers b ON a.id = b.id"
    )
    assert both.collect()[0]["gone"] == 4


def test_snapshots_metadata_table_and_maintenance_sql(facade):
    """`<table>.snapshots` metadata suffix, OPTIMIZE, and VACUUM SQL forms:
    the lakehouse maintenance surface over the versioned catalog."""
    facade.sql("DELETE FROM lakefs.repo.main.company.workers WHERE age >= 35")
    snaps = facade.sql(
        "SELECT version, n_files FROM lakefs.repo.main.company.workers.snapshots"
    )
    assert [r["version"] for r in snaps.orderBy("version").collect()] == [1, 2]
    # fragment, then OPTIMIZE back to one file
    facade.sql(
        "INSERT INTO lakefs.repo.main.company.workers VALUES ('7', 'A', 'B', 20, 'M')"
    )
    facade.sql("OPTIMIZE lakefs.repo.main.company.workers TO 1 FILE")
    m = facade.catalog._ops("repo.main.company.workers")[0].current()
    assert len(m.files) == 1
    # VACUUM: expire old versions, GC their orphans; current state intact
    out = facade.sql("VACUUM lakefs.repo.main.company.workers RETAIN 1 VERSIONS")
    row = out.collect()[0]
    assert row["expired_versions"] >= 3 and row["removed_files"] >= 1
    assert facade.sql("SELECT * FROM lakefs.repo.main.company.workers").count() == 3
    snaps2 = facade.sql(
        "SELECT version FROM lakefs.repo.main.company.workers.snapshots"
    )
    assert [r["version"] for r in snaps2.collect()] == [4]


def test_explain_passthrough(facade):
    """EXPLAIN over lakefs identifiers resolves views and returns Spark's
    plan text — filter pushdown visible for a selective predicate."""
    out = facade.sql(
        "EXPLAIN FORMATTED SELECT id FROM lakefs.repo.main.company.workers WHERE age > 40"
    ).collect()
    plan = out[0][0]
    assert "PushedFilters" in plan and "GreaterThan(age,40)" in plan


def test_restore_table_and_files_metadata_sql(facade):
    """RESTORE TABLE ... TO VERSION AS OF rolls back via one metadata
    commit; `<table>.files` exposes per-file row counts and stats."""
    facade.sql("DELETE FROM lakefs.repo.main.company.workers WHERE age >= 35")
    assert facade.sql("SELECT * FROM lakefs.repo.main.company.workers").count() == 2
    out = facade.sql(
        "RESTORE TABLE lakefs.repo.main.company.workers TO VERSION AS OF 1"
    ).collect()
    assert out[0]["restored_as_version"] == 3
    assert facade.sql("SELECT * FROM lakefs.repo.main.company.workers").count() == 6
    files = facade.sql(
        "SELECT file, row_count, column_stats FROM lakefs.repo.main.company.workers.files"
    ).collect()
    assert sum(r["row_count"] for r in files) == 6
    assert all("age" in r["column_stats"] for r in files)


def test_shallow_clone_sql(facade):
    """CREATE TABLE ... SHALLOW CLONE: zero-copy metadata clone that then
    diverges independently of its source."""
    facade.sql(
        "CREATE TABLE lakefs.repo.main.company.workers2 "
        "SHALLOW CLONE lakefs.repo.main.company.workers"
    )
    assert facade.sql("SELECT * FROM lakefs.repo.main.company.workers2").count() == 6
    facade.sql("DELETE FROM lakefs.repo.main.company.workers2 WHERE age >= 35")
    assert facade.sql("SELECT * FROM lakefs.repo.main.company.workers2").count() == 2
    assert facade.sql("SELECT * FROM lakefs.repo.main.company.workers").count() == 6


def test_show_partitions_and_partitions_metadata_sql(facade):
    """SHOW PARTITIONS + `<table>.partitions` over an unpartitioned table:
    one row, empty partition tuple, full row count."""
    out = facade.sql("SHOW PARTITIONS lakefs.repo.main.company.workers").collect()
    assert len(out) == 1 and out[0]["partition"] == "{}" and out[0]["row_count"] == 6
    via_view = facade.sql(
        "SELECT row_count FROM lakefs.repo.main.company.workers.partitions"
    ).collect()
    assert via_view[0]["row_count"] == 6


def test_describe_history_sql(facade):
    facade.sql("DELETE FROM lakefs.repo.main.company.workers WHERE age >= 35")
    hist = facade.sql("DESCRIBE HISTORY lakefs.repo.main.company.workers").collect()
    assert [r["version"] for r in sorted(hist, key=lambda r: r["version"])] == [1, 2]


def test_ctas_partitioned_by_transforms(facade, spark):
    """CTAS accepts Iceberg transform syntax in PARTITIONED BY: bucket(N,
    col), truncate(W, col), days(col) — each routes to the matching layout
    spec and prunes via the catalog's predicate projection."""
    f, cat = facade, facade.catalog
    spark.createDataFrame(
        [(i, f"u{i % 7}", float(i)) for i in range(300)], "id long, u string, v double"
    ).createOrReplaceTempView("src_rows")
    f.sql("CREATE TABLE lakefs.repo.main.company.t_bucket PARTITIONED BY (bucket(4, id)) AS SELECT * FROM src_rows")
    m = cat._ops("repo.main.company.t_bucket")[0].current()
    assert m.bucket_spec == {"col": "id", "n": 4}
    keep, total = cat.select_files("repo.main.company.t_bucket", "id", "=", 42)
    assert 0 < len(keep) < total

    f.sql("CREATE TABLE lakefs.repo.main.company.t_trunc PARTITIONED BY (truncate(100, id)) AS SELECT * FROM src_rows")
    mt = cat._ops("repo.main.company.t_trunc")[0].current()
    assert mt.bucket_spec.get("transform") == "truncate"
    keep_t, total_t = cat.select_files("repo.main.company.t_trunc", "id", "=", 250)
    assert 0 < len(keep_t) < total_t

    spark.sql(
        "SELECT id, TIMESTAMP '2024-03-01 06:00:00' + make_interval(0, 0, 0, CAST(id % 5 AS INT), 0, 0, 0) AS ts FROM range(200)"
    ).createOrReplaceTempView("src_ts")
    f.sql("CREATE TABLE lakefs.repo.main.company.t_days PARTITIONED BY (days(ts)) AS SELECT * FROM src_ts")
    md = cat._ops("repo.main.company.t_days")[0].current()
    assert md.bucket_spec.get("transform") == "days"
    import datetime as dt

    keep_d, total_d = cat.select_files(
        "repo.main.company.t_days", "ts", ">=", dt.datetime(2024, 3, 4)
    )
    assert 0 < len(keep_d) < total_d

    # identity form still parses
    f.sql("CREATE TABLE lakefs.repo.main.company.t_ident PARTITIONED BY (u) AS SELECT * FROM src_rows")
    assert cat._ops("repo.main.company.t_ident")[0].current().partition_spec == ["u"]


def test_ctas_partitioned_by_mixed_transform_refused(facade, spark):
    """Mixing a transform call with identity columns in PARTITIONED BY must
    hit the documented refusal — regardless of item order — never comma-split
    the transform into bogus column names (r4 ADVICE)."""
    from lakefs_iceberg_catalog_spark.catalog.errors import UnsupportedOperationError

    spark.createDataFrame(
        [(1, "a", 1.0)], "id long, u string, v double"
    ).createOrReplaceTempView("src_rows")
    for clause in ("u, bucket(4, id)", "u, days(ts)", "unknown_fn(id), u"):
        with pytest.raises(UnsupportedOperationError):
            facade.sql(
                "CREATE TABLE lakefs.repo.main.company.t_mixed "
                f"PARTITIONED BY ({clause}) AS SELECT * FROM src_rows"
            )


def test_alter_partition_field_and_describe(facade, spark):
    """ALTER TABLE ADD/DROP PARTITION FIELD evolves the identity spec;
    DESCRIBE [EXTENDED] renders columns + layout metadata."""
    f = facade
    cat = f.catalog
    t = "repo.main.company.workers"
    f.sql("ALTER TABLE lakefs.repo.main.company.workers ADD PARTITION FIELD gender")
    assert cat.partition_spec(t) == ["gender"]
    # future writes follow the new spec
    import pyspark.sql.functions as SF

    cat.append(t, cat.scan(t).withColumn("id", SF.concat(SF.lit("n"), "id")))
    m = cat._ops(t)[0].current()
    assert any(v.get("gender") for v in m.file_partitions.values())
    f.sql("ALTER TABLE lakefs.repo.main.company.workers DROP PARTITION FIELD gender")
    assert cat.partition_spec(t) == []
    rows = f.sql("DESCRIBE lakefs.repo.main.company.workers").collect()
    assert [(r.col_name, r.data_type) for r in rows[:2]] == [
        ("id", "string"), ("firstname", "string")
    ]
    ext = f.sql("DESCRIBE EXTENDED lakefs.repo.main.company.workers").collect()
    names = [r.col_name for r in ext]
    assert "# Detailed Table Information" in names and "Table UUID" in names


def test_alter_table_nested_struct_member_forms(facade, spark):
    """ALTER TABLE ... on DOTTED targets routes to the nested field-id
    evolution: ADD COLUMN meta.codec, RENAME COLUMN meta.w TO width,
    ALTER COLUMN meta.h TYPE bigint, DROP COLUMN meta.codec — Iceberg's
    nested ALTER surface (inherited by the reference via conftest.py:67)."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    f, cat = facade, facade.catalog
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
        "repo.main.company.media",
        spark.createDataFrame([(1, Row(w=640, h=480))], schema),
    )
    t = "lakefs.repo.main.company.media"
    f.sql(f"ALTER TABLE {t} ADD COLUMN meta.codec string")
    f.sql(f"ALTER TABLE {t} RENAME COLUMN meta.w TO width")
    f.sql(f"ALTER TABLE {t} ALTER COLUMN meta.h TYPE bigint")
    cur = cat.scan("repo.main.company.media")
    members = {x.name: x.dataType for x in cur.schema["meta"].dataType.fields}
    assert members == {
        "width": T.IntegerType(), "h": T.LongType(), "codec": T.StringType(),
    }
    assert cur.collect()[0]["meta"] == Row(width=640, h=480, codec=None)
    f.sql(f"ALTER TABLE {t} DROP COLUMN meta.codec")
    assert set(
        x.name for x in cat.scan("repo.main.company.media").schema["meta"].dataType.fields
    ) == {"width", "h"}


def test_write_ordered_by_sql_forms(facade):
    """ALTER TABLE ... WRITE ORDERED BY / ZORDERED BY / UNORDERED declare
    (or clear) the persisted sort order, and DESCRIBE EXTENDED renders it."""
    from lakefs_iceberg_catalog_spark.catalog.catalog import SORT_ORDER_PROP

    f, cat = facade, facade.catalog
    t = "lakefs.repo.main.company.workers"
    f.sql(f"ALTER TABLE {t} WRITE ORDERED BY (age)")
    props = cat.table_properties("repo.main.company.workers")
    assert props[SORT_ORDER_PROP] == {"kind": "cluster", "cols": ["age"]}
    desc = {r[0]: r[1] for r in f.sql(f"DESCRIBE EXTENDED {t}").collect()}
    assert desc.get("Sort Order") == "cluster(age)"
    f.sql(f"ALTER TABLE {t} WRITE ZORDERED BY (age, id)")
    assert cat.table_properties("repo.main.company.workers")[SORT_ORDER_PROP] == {
        "kind": "zorder", "cols": ["age", "id"],
    }
    f.sql(f"ALTER TABLE {t} WRITE UNORDERED")
    assert SORT_ORDER_PROP not in cat.table_properties("repo.main.company.workers")


def test_call_revert_procedure(facade, spark):
    """CALL system.revert(repo, commit_id) applies the inverse of a commit
    on its own branch and returns the new commit id."""
    f, cat = facade, facade.catalog
    cat.commit_branch("repo", "main", "seed")
    cat.append(
        "repo.main.company.workers",
        spark.createDataFrame([("7", "Jhon", "Smith", 33, "M")], WORKERS_SCHEMA),
    )
    cid = cat.commit_branch("repo", "main", "add7")
    out = f.sql(f"CALL system.revert('repo', '{cid}')").collect()
    assert len(out) == 1 and out[0].commit_id
    assert cat.scan("repo.main.company.workers").filter("id = '7'").count() == 0


def test_history_metadata_table_sql(facade):
    """`<table>.history` metadata suffix (stock Iceberg's history table):
    one row per version, parent links, every row a current ancestor on
    this catalog's linear history — and it stays consistent with
    `.snapshots` after DML."""
    facade.sql("DELETE FROM lakefs.repo.main.company.workers WHERE age >= 35")
    h = facade.sql(
        "SELECT version, parent_version, is_current_ancestor "
        "FROM lakefs.repo.main.company.workers.history"
    ).orderBy("version").collect()
    assert [(r["version"], r["parent_version"]) for r in h] == [
        (1, None), (2, 1),
    ]
    assert all(r["is_current_ancestor"] for r in h)
    snaps = facade.sql(
        "SELECT version FROM lakefs.repo.main.company.workers.snapshots"
    ).collect()
    assert {r["version"] for r in snaps} == {r["version"] for r in h}
