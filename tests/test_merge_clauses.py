"""Shared MERGE clause engine (catalog/merge_clauses.py) and its three
backend wirings — versioned catalog, Iceberg MoR, Delta CoW — plus the
SQL facade's clause parser. The registry keys cover the happy paths; the
tests here pin the analyzer rules, first-match-wins ordering, cardinality,
no-op commits, and the refusal seams."""

from __future__ import annotations

import pytest

from lakefs_iceberg_catalog_spark.catalog.merge_clauses import (
    MergeClause,
    validate_clauses,
    whole_row_shape,
)


def _mk(when, action, cond=None, assigns=None):
    return MergeClause(when, action, condition=cond, assignments=assigns)


class TestValidation:
    COLS = ["id", "name", "qty"]

    def test_empty_and_illegal_shapes(self):
        with pytest.raises(ValueError, match="at least one"):
            validate_clauses([], self.COLS)
        with pytest.raises(ValueError, match="illegal"):
            validate_clauses([_mk("matched", "insert")], self.COLS)
        with pytest.raises(ValueError, match="illegal"):
            validate_clauses([_mk("not_matched", "delete")], self.COLS)
        with pytest.raises(ValueError, match="illegal"):
            validate_clauses([_mk("not_matched", "update")], self.COLS)

    def test_delete_takes_no_assignments(self):
        with pytest.raises(ValueError, match="no assignments"):
            validate_clauses(
                [_mk("matched", "delete", assigns={"qty": "0"})], self.COLS
            )

    def test_by_source_update_needs_explicit_assignments(self):
        with pytest.raises(ValueError, match="explicit"):
            validate_clauses(
                [_mk("not_matched_by_source", "update")], self.COLS
            )

    def test_unknown_assignment_column(self):
        with pytest.raises(ValueError, match="unknown columns"):
            validate_clauses(
                [_mk("matched", "update", assigns={"ghost": "1"})], self.COLS
            )

    def test_unconditional_clause_must_be_last_of_family(self):
        # two unconditional MATCHED clauses
        with pytest.raises(ValueError, match="omit its"):
            validate_clauses(
                [_mk("matched", "update"), _mk("matched", "delete")],
                self.COLS,
            )
        # conditional AFTER the unconditional one: unreachable
        with pytest.raises(ValueError, match="unreachable"):
            validate_clauses(
                [
                    _mk("matched", "update"),
                    _mk("matched", "delete", cond="t.qty < 0"),
                ],
                self.COLS,
            )
        # other-family clauses interleave freely
        validate_clauses(
            [
                _mk("matched", "update"),
                _mk("not_matched", "insert", cond="s.qty > 0"),
                _mk("not_matched", "insert"),
            ],
            self.COLS,
        )

    def test_whole_row_shape_detection(self):
        assert whole_row_shape(
            [_mk("matched", "update"), _mk("not_matched", "insert")]
        )
        assert not whole_row_shape(
            [_mk("matched", "update", cond="1=1"), _mk("not_matched", "insert")]
        )
        assert not whole_row_shape([_mk("matched", "update")])


class TestVersionedCatalog:
    def _seed(self, spark):
        from lakefs_iceberg_catalog_spark.operators.versioned import _seeded

        return _seeded(spark)

    def test_first_match_wins_and_defaults(self, spark):
        import shutil

        cat, root = self._seed(spark)
        t = "repo.main.company.workers"
        src_rows = [("2", "X", "X", 99, "M"), ("4", "Y", "Y", 1, "F")]
        from lakefs_iceberg_catalog_spark.operators.util import local_df
        from lakefs_iceberg_catalog_spark.operators.versioned import (
            WORKERS_SCHEMA,
        )

        src = local_df(spark, src_rows, WORKERS_SCHEMA)
        # clause 0 and 1 both match id=2 (99>35 and unconditional) — the
        # FIRST must win; id=4's source age 1 fails clause 0, falls to 1
        cat.merge_clauses(t, src, ["id"], [
            MergeClause("matched", "update", condition="s.age > t.age",
                        assignments={"age": "100"}),
            MergeClause("matched", "update", assignments={"age": "0"}),
        ])
        got = {r["id"]: r["age"] for r in cat.scan(t).collect()}
        assert got["2"] == 100 and got["4"] == 0
        assert len(got) == 6  # no inserts, no deletes: others carried
        shutil.rmtree(root, ignore_errors=True)

    def test_cardinality_violation_and_miss_legal(self, spark):
        import shutil

        from lakefs_iceberg_catalog_spark.operators.util import local_df
        from lakefs_iceberg_catalog_spark.operators.versioned import (
            WORKERS_SCHEMA,
        )

        cat, root = self._seed(spark)
        t = "repo.main.company.workers"
        dup_hit = local_df(spark,
            [("2", "A", "A", 1, "M"), ("2", "B", "B", 2, "M")], WORKERS_SCHEMA
        )
        with pytest.raises(ValueError, match="cardinality"):
            cat.merge_clauses(t, dup_hit, ["id"], [
                MergeClause("matched", "update", assignments={"age": "s.age"}),
            ])
        assert cat.table_history(t) == [1]  # nothing committed
        # duplicate keys matching NO target row both insert (stock-legal)
        dup_miss = local_df(spark,
            [("9", "A", "A", 1, "M"), ("9", "B", "B", 2, "M")], WORKERS_SCHEMA
        )
        cat.merge_clauses(t, dup_miss, ["id"], [
            MergeClause("matched", "update", assignments={"age": "s.age"}),
            MergeClause("not_matched", "insert"),
        ])
        assert cat.scan(t).count() == 8
        shutil.rmtree(root, ignore_errors=True)

    def test_whole_row_fast_path_delegates(self, spark, monkeypatch):
        import shutil

        from lakefs_iceberg_catalog_spark.operators.util import local_df
        from lakefs_iceberg_catalog_spark.operators.versioned import (
            WORKERS_SCHEMA,
        )

        cat, root = self._seed(spark)
        called = {}
        real = cat.merge_upsert

        def spy(*a, **k):
            called["hit"] = True
            return real(*a, **k)

        monkeypatch.setattr(cat, "merge_upsert", spy)
        src = local_df(spark, [("9", "N", "K", 29, "F")], WORKERS_SCHEMA)
        cat.merge_clauses("repo.main.company.workers", src, ["id"], [
            MergeClause("matched", "update"),
            MergeClause("not_matched", "insert"),
        ])
        assert called.get("hit")
        shutil.rmtree(root, ignore_errors=True)


class TestIcebergMor:
    def test_no_clause_fires_no_snapshot_and_by_source(self, spark, tmp_path):
        from lakefs_iceberg_catalog_spark.catalog.iceberg_format import (
            IcebergTableWriter,
            read_table_metadata,
            scan_iceberg_table,
        )
        from lakefs_iceberg_catalog_spark.operators.util import local_df
        from lakefs_iceberg_catalog_spark.tables import table

        n = table(spark, "/root/testdata/sf0.01", "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        d = str(tmp_path / "mcmor")
        w = IcebergTableWriter(spark, d)
        w.append(n.filter("n_nationkey < 10"))
        n_snaps = len(read_table_metadata(d)["snapshots"])
        # a source whose rows fire NO clause: matched but condition
        # false, not-matched but condition false → no snapshot
        src = local_df(spark, [(3, "X", 0, "N"), (40, "Y", 0, "N")],
                       "n_nationkey int, n_name string, n_regionkey int, op string")
        w.merge_clauses_mor(src, ["n_nationkey"], [
            MergeClause("matched", "delete", condition="s.op = 'D'"),
            MergeClause("not_matched", "insert", condition="s.op = 'I'",
                        assignments={"n_nationkey": "s.n_nationkey",
                                     "n_name": "s.n_name",
                                     "n_regionkey": "s.n_regionkey"}),
        ])
        assert len(read_table_metadata(d)["snapshots"]) == n_snaps
        # BY SOURCE: delete every target row not in the source
        w.merge_clauses_mor(src, ["n_nationkey"], [
            MergeClause("not_matched_by_source", "delete",
                        condition="t.n_nationkey >= 5"),
        ])
        got = sorted(
            r["n_nationkey"]
            for r in scan_iceberg_table(spark, d).collect()
        )
        assert got == [0, 1, 2, 3, 4]  # 5..9 target-only and >= 5; 3 matched

    def test_cardinality_and_empty_source(self, spark, tmp_path):
        from lakefs_iceberg_catalog_spark.catalog.iceberg_format import (
            IcebergTableWriter,
            read_table_metadata,
        )
        from lakefs_iceberg_catalog_spark.operators.util import local_df
        from lakefs_iceberg_catalog_spark.tables import table

        n = table(spark, "/root/testdata/sf0.01", "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        d = str(tmp_path / "mcmor2")
        w = IcebergTableWriter(spark, d)
        w.append(n.filter("n_nationkey < 10"))
        ddl = "n_nationkey int, n_name string, n_regionkey int"
        dup = local_df(spark, [(3, "A", 0), (3, "B", 0)], ddl)
        with pytest.raises(ValueError, match="cardinality"):
            w.merge_clauses_mor(dup, ["n_nationkey"], [
                MergeClause("matched", "update",
                            assignments={"n_name": "s.n_name"}),
            ])
        n_snaps = len(read_table_metadata(d)["snapshots"])
        empty = local_df(spark, [], ddl)
        w.merge_clauses_mor(empty, ["n_nationkey"], [
            MergeClause("matched", "update",
                        assignments={"n_name": "s.n_name"}),
            MergeClause("not_matched", "insert"),
        ])
        assert len(read_table_metadata(d)["snapshots"]) == n_snaps


class TestDelta:
    def test_partitioned_general_clauses(self, spark, tmp_path):
        """Round-15 second pass: general clauses over a PARTITIONED Delta
        table (the refusal lifted) — conditional delete, column-level
        update that MOVES a row across partitions, conditional insert,
        untouched partitions' files never tombstone."""
        import json as _json

        from lakefs_iceberg_catalog_spark.catalog.delta_format import (
            DeltaTableWriter,
            _commit_path,
            scan_delta_table,
        )
        from lakefs_iceberg_catalog_spark.operators.util import local_df
        from lakefs_iceberg_catalog_spark.tables import table

        n = table(spark, "/root/testdata/sf0.01", "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        d = str(tmp_path / "dparts")
        w = DeltaTableWriter(spark, d)
        for rk in range(5):
            w.commit(
                add_dfs=[n.filter(f"n_regionkey = {rk}")],
                partition_cols=["n_regionkey"] if rk == 0 else None,
            )
        src = local_df(spark,
            [(3, "UPD_3", 9, "U"), (5, "GONE", 9, "D"), (30, "NEW_30", 2, "I")],
            "n_nationkey int, n_name string, n_regionkey int, op string",
        )
        v = w.merge_clauses(src, ["n_nationkey"], [
            MergeClause("matched", "delete", condition="s.op = 'D'"),
            # column-level update REASSIGNING the partition column: the
            # row moves partitions in the partitionBy rewrite
            MergeClause("matched", "update",
                        assignments={"n_name": "s.n_name",
                                     "n_regionkey": "s.n_regionkey"}),
            MergeClause("not_matched", "insert", condition="s.op = 'I'",
                        assignments={"n_nationkey": "s.n_nationkey",
                                     "n_name": "s.n_name",
                                     "n_regionkey": "s.n_regionkey"}),
        ])
        got = {
            r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
            for r in scan_delta_table(spark, d).collect()
        }
        assert 5 not in got and got[3] == ("UPD_3", 9)  # moved to region 9
        assert got[30] == ("NEW_30", 2) and len(got) == 25
        acts = [
            _json.loads(line)
            for line in open(_commit_path(d, v)).read().splitlines()
            if line.strip()
        ]
        removed = [a["remove"]["path"] for a in acts if "remove" in a]
        # keys 3 (region 1) and 5 (region 0): exactly their two partition
        # files tombstone; the other three partitions stay untouched
        assert len(removed) == 2
        by_type = {}
        cdc_rels = [a["cdc"]["path"] for a in acts if "cdc" in a]
        changes = spark.read.parquet(*[f"{d}/{rel}" for rel in cdc_rels])
        for r in changes.groupBy("_change_type").count().collect():
            by_type[r["_change_type"]] = r["count"]
        assert by_type == {"update_preimage": 1, "update_postimage": 1,
                           "delete": 1, "insert": 1}, by_type

    def test_no_clause_fires_no_commit_and_by_source(self, spark, tmp_path):
        from lakefs_iceberg_catalog_spark.catalog.delta_format import (
            DeltaTableWriter,
            scan_delta_table,
        )
        from lakefs_iceberg_catalog_spark.operators.util import local_df
        from lakefs_iceberg_catalog_spark.tables import table

        n = table(spark, "/root/testdata/sf0.01", "nation").select(
            "n_nationkey", "n_name"
        )
        d = str(tmp_path / "dflat")
        w = DeltaTableWriter(spark, d)
        w.commit(add_dfs=[n.filter("n_nationkey < 10")])
        w.commit(add_dfs=[n.filter("n_nationkey >= 10")])
        src = local_df(spark, [(3, "X", "N")],
                       "n_nationkey int, n_name string, op string")
        v0 = w._version
        v1 = w.merge_clauses(src, ["n_nationkey"], [
            MergeClause("matched", "delete", condition="s.op = 'D'"),
        ])
        assert v1 == v0  # condition false everywhere: no commit
        # BY SOURCE update touches EVERY file with a victim
        v2 = w.merge_clauses(src, ["n_nationkey"], [
            MergeClause("not_matched_by_source", "update",
                        condition="t.n_nationkey IN (1, 20)",
                        assignments={"n_name": "concat(t.n_name, '!')"}),
        ])
        assert v2 == v0 + 1
        got = {
            r["n_nationkey"]: r["n_name"]
            for r in scan_delta_table(spark, d).collect()
        }
        assert got[1].endswith("!") and got[20].endswith("!")
        assert not got[3].endswith("!") and len(got) == 25


class TestFacadeParsing:
    def test_insert_values_and_aliases(self, spark):
        import shutil

        from lakefs_iceberg_catalog_spark.catalog.sql_facade import SqlFacade
        from lakefs_iceberg_catalog_spark.operators.versioned import _seeded

        cat, root = _seeded(spark)
        # non-t/s aliases + INSERT (cols) VALUES (exprs) with a function
        # call holding commas + a conditional BY SOURCE delete
        SqlFacade(cat).sql(
            """
            MERGE INTO lakefs.repo.main.company.workers AS tgt
            USING (SELECT * FROM (VALUES ('9', 'noor', 29)))
                  AS src(id, firstname, age)
            ON tgt.id = src.id
            WHEN MATCHED THEN UPDATE SET age = src.age
            WHEN NOT MATCHED THEN INSERT (id, firstname, age)
                 VALUES (src.id, concat(upper(src.firstname), '!'), src.age)
            WHEN NOT MATCHED BY SOURCE AND tgt.age > 40 THEN DELETE
            """
        )
        got = {
            r["id"]: (r["firstname"], r["age"], r["lastname"])
            for r in cat.scan("repo.main.company.workers").collect()
        }
        assert got["9"] == ("NOOR!", 29, None)  # unassigned col -> NULL
        assert "5" not in got and "3" not in got  # ages 44, 41 deleted
        assert len(got) == 5
        shutil.rmtree(root, ignore_errors=True)

    def test_bad_clause_refuses(self, spark):
        import shutil

        from lakefs_iceberg_catalog_spark.catalog.errors import (
            UnsupportedOperationError,
        )
        from lakefs_iceberg_catalog_spark.catalog.sql_facade import SqlFacade
        from lakefs_iceberg_catalog_spark.operators.versioned import _seeded

        cat, root = _seeded(spark)
        f = SqlFacade(cat)
        base = (
            "MERGE INTO lakefs.repo.main.company.workers t USING "
            "lakefs.repo.main.company.workers s ON t.id = s.id "
        )
        with pytest.raises(UnsupportedOperationError, match="action"):
            f.sql(base + "WHEN MATCHED THEN TRUNCATE")
        with pytest.raises(UnsupportedOperationError, match="arity"):
            f.sql(base + "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id, 1)")
        shutil.rmtree(root, ignore_errors=True)
