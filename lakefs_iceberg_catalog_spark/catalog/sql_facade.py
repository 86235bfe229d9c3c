"""SQL facade over VersionedCatalog — the reference's user surface.

The reference exposes everything through Spark SQL against a registered
catalog: ``SELECT * FROM lakefs.`repo`.`main`.company.workers``,
``CREATE SCHEMA``, ``SHOW TABLES``, ``INSERT INTO``, ``DELETE FROM``
(TestLakeFSCatalogSpark.java:60-96, tests/test_iceberg.py). Without a JVM
catalog-plugin jar, the equivalent Python surface is this facade:

- DQL (SELECT ...): every ``lakefs.<repo>.<branch>.<ns...>.<table>``
  identifier in the query is resolved through the catalog, registered as a
  session view, and the rewritten query runs on stock Spark SQL — step 1/4/5
  of the reference lifecycle unchanged, step 2/3 (catalog load + metadata
  refresh) done by VersionedCatalog (SURVEY.md §3.1).
- A small DDL/DML dispatcher maps the statement forms the reference's tests
  exercise onto catalog methods (CREATE/DROP SCHEMA, SHOW TABLES,
  CREATE/DROP TABLE, INSERT INTO ... VALUES, DELETE FROM ... WHERE,
  UPDATE ... SET ... WHERE, MERGE INTO ... WHEN MATCHED/NOT MATCHED).
- Session namespace state: ``USE lakefs.<repo>.<branch>[.<ns>...]`` pins a
  current namespace so the bare ``SHOW TABLES`` / ``SHOW CURRENT
  NAMESPACE`` forms the reference E2E runs work
  (TestLakeFSCatalogSpark.java:79-80, 88).

Identifiers accept optional backticks on each part, like the reference's
``lakefs.`repo`.`main`.company.workers``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .errors import UnsupportedOperationError
from ..operators.util import local_df

_PART = r"(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_$-]*)"
_IDENT = rf"\blakefs(?:\.{_PART}){{3,}}"
# Namespace-level statements accept repo.branch (2 levels) and deeper —
# the reference runs DESCRIBE SCHEMA / USE at both depths
# (TestLakeFSCatalogSpark.java:64, 79).
_NS_IDENT = rf"\blakefs(?:\.{_PART}){{2,}}"


def _clean(ident: str) -> list[str]:
    parts = re.findall(_PART, ident)
    return [p.strip("`") for p in parts[1:]]  # drop the leading catalog name


def _col_target(raw: str) -> tuple[str, str | None]:
    """ALTER-column target: plain `col` → (col, None); dotted `col.member`
    → (col, member) for the nested (struct-member) evolution forms."""
    parts = [p.strip("`") for p in re.findall(_PART, raw)]
    return parts[0], (parts[1] if len(parts) > 1 else None)


class SqlFacade:
    def __init__(self, catalog):
        self.catalog = catalog
        self.spark = catalog.spark
        # session-scoped current namespace, set by USE (reference:
        # TestLakeFSCatalogSpark.java:79 `USE lakefs.repo.main.db`)
        self.current_namespace: list[str] | None = None

    # ---------------------------------------------------------------- DQL

    def _resolve_views(self, query: str) -> str:
        """Register every lakefs identifier as a view; rewrite the query to
        use the view names. Re-resolves manifests per call (no stale
        caches). An identifier may carry a time-travel suffix — ``FOR
        VERSION AS OF <n>`` or ``FOR TIMESTAMP AS OF '<iso8601>'`` (UTC
        assumed when the literal is zone-naive), the Spark SQL time-travel
        forms — which pins that occurrence to the historic snapshot."""
        tt = (
            rf"({_IDENT})"
            r"(?:\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+)"
            r"|\s+FOR\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?"
        )

        def repl(m: re.Match) -> str:
            levels = _clean(m.group(1))
            if (
                levels[-1] in ("snapshots", "files", "partitions", "history")
                and len(levels) >= 5
                and not self.catalog.table_exists(levels)
            ):
                # metadata table suffix (Iceberg `<table>.snapshots` /
                # `<table>.files`); a REAL table by that name wins the
                # ambiguity
                if m.group(2) or m.group(3):
                    raise UnsupportedOperationError(
                        "time travel on a metadata table is not supported"
                    )
                view = f"lakefs_meta_{levels[-1]}_" + "_".join(
                    re.sub(r"[^A-Za-z0-9_]", "_", p) for p in levels[:-1]
                )
                meta_fn = getattr(self.catalog, levels[-1])
                meta_fn(levels[:-1]).createOrReplaceTempView(view)
                return view
            version = int(m.group(2)) if m.group(2) else None
            as_of = None
            if m.group(3):
                from datetime import datetime, timezone

                dt = datetime.fromisoformat(m.group(3))
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                as_of = dt.timestamp()
            view = "lakefs_" + "_".join(re.sub(r"[^A-Za-z0-9_]", "_", p) for p in levels)
            if version is not None:
                view += f"_v{version}"
            elif as_of is not None:
                view += f"_ts{int(as_of * 1e6)}"
            self.catalog.scan(levels, version=version, as_of=as_of).createOrReplaceTempView(view)
            return view

        return re.sub(tt, repl, query, flags=re.IGNORECASE)

    def sql(self, statement: str) -> DataFrame:
        s = statement.strip().rstrip(";")
        head = s.split(None, 1)[0].upper() if s else ""
        if head in ("SELECT", "WITH"):
            return self.spark.sql(self._resolve_views(s))
        if head == "EXPLAIN":
            # EXPLAIN [EXTENDED|FORMATTED|...] <query>: resolve the lakefs
            # identifiers, let Spark's own EXPLAIN render the plan
            parts = s.split(None, 1)
            if len(parts) < 2:
                raise UnsupportedOperationError("EXPLAIN requires a query")
            return self.spark.sql("EXPLAIN " + self._resolve_views(parts[1]))
        return self._dispatch_ddl_dml(s)

    # ----------------------------------------------------------- DDL / DML

    def _dispatch_ddl_dml(self, s: str) -> DataFrame:
        mk = lambda rows, schema: local_df(self.spark, rows, schema)  # noqa: E731

        m = re.match(rf"(?is)^CREATE\s+(?:SCHEMA|NAMESPACE)\s+({_IDENT})\s*$", s)
        if m:
            self.catalog.create_namespace(_clean(m.group(1)))
            return mk([], "result string")

        m = re.match(rf"(?is)^DROP\s+(?:SCHEMA|NAMESPACE)\s+({_IDENT})\s*$", s)
        if m:
            self.catalog.drop_namespace(_clean(m.group(1)))
            return mk([], "result string")

        m = re.match(rf"(?is)^SHOW\s+TABLES(?:\s+(?:IN|FROM)\s+({_NS_IDENT}))?\s*$", s)
        if m:
            if m.group(1) is not None:
                levels = _clean(m.group(1))
            elif self.current_namespace is not None:
                levels = self.current_namespace
            else:
                raise UnsupportedOperationError(
                    "SHOW TABLES needs an IN <namespace> clause or a prior USE"
                )
            return mk(
                [(".".join(levels), t) for t in self.catalog.list_tables(levels)],
                "namespace string, tableName string",
            )

        m = re.match(rf"(?is)^SHOW\s+(?:NAMESPACES|SCHEMAS)(?:\s+(?:IN|FROM)\s+({_NS_IDENT}))?\s*$", s)
        if m:
            if m.group(1) is not None:
                levels = _clean(m.group(1))
            elif self.current_namespace is not None:
                levels = self.current_namespace
            else:
                # preserved non-capability: top-level listing is refused by
                # the catalog (LakeFSCatalog.java:250-253)
                levels = None
            return mk(
                [(".".join(ns),) for ns in self.catalog.list_namespaces(levels)],
                "namespace string",
            )

        m = re.match(rf"(?is)^USE\s+({_NS_IDENT})\s*$", s)
        if m:
            levels = _clean(m.group(1))
            # validate existence the way Spark's USE does (errors on a
            # missing namespace) — load_namespace_metadata raises
            # NoSuchNamespaceError for us
            self.catalog.load_namespace_metadata(levels)
            self.current_namespace = levels
            return mk([], "result string")

        m = re.match(r"(?is)^SHOW\s+CURRENT\s+NAMESPACE\s*$", s)
        if m:
            ns = ".".join(self.current_namespace) if self.current_namespace else ""
            return mk([("lakefs", ns)], "catalog string, namespace string")

        m = re.match(rf"(?is)^DESCRIBE\s+(?:SCHEMA|NAMESPACE)\s+({_NS_IDENT})\s*$", s)
        if m:
            meta = self.catalog.load_namespace_metadata(_clean(m.group(1)))
            return mk(sorted(meta.items()), "info_name string, info_value string")

        m = re.match(
            rf"(?is)^CREATE\s+TABLE\s+({_IDENT})\s+SHALLOW\s+CLONE\s+({_IDENT})\s*$",
            s,
        )
        if m:
            # zero-copy table clone (Delta CLONE form): one metadata write,
            # data files shared until the clone diverges
            self.catalog.clone_table(_clean(m.group(2)), _clean(m.group(1)))
            return mk([], "result string")

        m = re.match(
            rf"(?is)^CREATE\s+TABLE\s+({_IDENT})\s*\((.*?)\)"
            rf"(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s*$",
            s,
        )
        if m:
            # identity columns only on the explicit-schema form; transform
            # calls route through the same guard as CTAS so they refuse
            # cleanly instead of comma-splitting into bogus column names
            kw = self._partition_kwargs(m.group(3))
            if set(kw) - {"partition_by"}:
                raise UnsupportedOperationError(
                    "partition transforms are supported on CTAS only; "
                    "explicit-schema CREATE TABLE takes identity columns"
                )
            self.catalog.create_table(
                _clean(m.group(1)), m.group(2), partition_by=kw.get("partition_by")
            )
            return mk([], "result string")

        m = re.match(
            # the clause body allows ONE paren nesting level so transform
            # calls — PARTITIONED BY (bucket(4, id)) — parse
            rf"(?is)^CREATE\s+TABLE\s+({_IDENT})"
            rf"(?:\s+PARTITIONED\s+BY\s*\(((?:[^()]|\([^()]*\))*)\))?\s+AS\s+(SELECT\b.+|WITH\b.+)$",
            s,
        )
        if m:
            # CTAS: the reference's saveAsTable path in SQL form — resolve
            # lakefs identifiers in the query, run it, commit as v1.
            # PARTITIONED BY accepts identity columns OR one Iceberg
            # transform — bucket(N, col) / truncate(W, col) / days(col) —
            # in Iceberg's own SQL argument order.
            result = self.spark.sql(self._resolve_views(m.group(3)))
            self.catalog.create_table_as(
                _clean(m.group(1)), result, **self._partition_kwargs(m.group(2))
            )
            return mk([], "result string")

        m = re.match(rf"(?is)^DROP\s+TABLE\s+({_IDENT})\s*$", s)
        if m:
            self.catalog.drop_table(_clean(m.group(1)))
            return mk([], "result string")

        m = re.match(
            rf"(?is)^INSERT\s+OVERWRITE\s+(?:TABLE\s+)?({_IDENT})\s+(SELECT\b.+|WITH\b.+|VALUES\s+.+)$",
            s,
        )
        if m:
            body = m.group(2)
            if re.match(r"(?is)^VALUES\b", body):
                src = self.spark.sql(f"SELECT * FROM ({body})")
            else:
                src = self.spark.sql(self._resolve_views(body))
            self.catalog.overwrite(_clean(m.group(1)), src)
            return mk([], "result string")

        m = re.match(rf"(?is)^INSERT\s+INTO\s+({_IDENT})\s+VALUES\s+(.+)$", s)
        if m:
            # Evaluate the VALUES with Spark itself (full literal syntax) and
            # append — append casts positionally to the declared schema, so
            # e.g. a DECIMAL literal lands in a double column.
            vals = self.spark.sql(f"SELECT * FROM (VALUES {m.group(2)})")
            self.catalog.append(_clean(m.group(1)), vals)
            return mk([], "result string")

        m = re.match(rf"(?is)^DELETE\s+FROM\s+({_IDENT})\s+WHERE\s+(.+)$", s)
        if m:
            self.catalog.delete_where(_clean(m.group(1)), m.group(2))
            return mk([], "result string")

        m = re.match(rf"(?is)^UPDATE\s+({_IDENT})\s+SET\s+(.+?)\s+WHERE\s+(.+)$", s)
        if m:
            assignments = {}
            for part in self._split_top_level(m.group(2)):
                col, expr = part.split("=", 1)
                assignments[col.strip().strip("`")] = expr.strip()
            self.catalog.update_where(_clean(m.group(1)), m.group(3), assignments)
            return mk([], "result string")

        m = re.match(
            rf"(?is)^MERGE\s+INTO\s+({_IDENT})(?:\s+(?:AS\s+)?(\w+))?"
            rf"\s+USING\s+(.+)$",
            s,
        )
        if m:
            target, t_alias, rest = m.groups()
            # locate the TOP-LEVEL ON / WHEN with paren-depth awareness: a
            # source subquery may itself contain JOIN ... ON — a non-greedy
            # regex split at the first ' ON ' would mis-split it
            on_at = self._find_top_level_kw(rest, "ON")
            if on_at is None:
                raise UnsupportedOperationError("MERGE INTO is missing a top-level ON clause")
            using = rest[:on_at]
            tail = rest[on_at + len("ON"):].lstrip()
            when_at = self._find_top_level_kw(tail, "WHEN")
            if when_at is None:
                raise UnsupportedOperationError("MERGE INTO is missing a WHEN clause")
            on, when = tail[:when_at], tail[when_at + len("WHEN"):].lstrip()
            return self._merge_into(target, t_alias, using.strip(), on.strip(), when, mk)

        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMNS?\s*"
            rf"\(?\s*({_PART}(?:\.{_PART})?)\s+([A-Za-z]+(?:\([^)]*\))?)\s*\)?\s*$",
            s,
        )
        if m:
            # metadata-only schema evolution (Iceberg add-column semantics):
            # existing files read back with NULLs for the new column. A
            # dotted target (meta.codec) adds a STRUCT MEMBER via the
            # nested field-id model, exactly Iceberg's nested ALTER form.
            top, member = _col_target(m.group(2))
            if member is not None:
                self.catalog.add_struct_field(
                    _clean(m.group(1)), top, member, m.group(3)
                )
            else:
                self.catalog.add_column(_clean(m.group(1)), top, m.group(3))
            return mk([], "result string")

        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+(SET|UNSET)\s+TBLPROPERTIES\s*\((.*)\)\s*$",
            s,
        )
        if m:
            ident, verb, body = _clean(m.group(1)), m.group(2).upper(), m.group(3)
            if verb == "SET":
                props = {}
                for part in self._split_top_level(body):
                    if "=" not in part:
                        raise UnsupportedOperationError(
                            f"malformed TBLPROPERTIES entry (expected k=v): {part.strip()!r}"
                        )
                    k, v = part.split("=", 1)
                    props[k.strip().strip("'\"` ")] = v.strip().strip("'\" ")
                self.catalog.set_table_properties(ident, props)
            else:
                keys = [p.strip().strip("'\"` ") for p in self._split_top_level(body)]
                self.catalog.set_table_properties(ident, {}, remove=keys)
            return mk([], "result string")

        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+COLUMN\s+"
            rf"({_PART}(?:\.{_PART})?)\s+TO\s+({_PART})\s*$",
            s,
        )
        if m:
            # metadata-only column rename (Iceberg extension surface);
            # dotted source renames a struct member (keeps its member id)
            top, member = _col_target(m.group(2))
            if member is not None:
                self.catalog.rename_struct_field(
                    _clean(m.group(1)), top, member, m.group(3).strip("`")
                )
            else:
                self.catalog.rename_column(
                    _clean(m.group(1)), top, m.group(3).strip("`")
                )
            return mk([], "result string")

        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+"
            rf"({_PART}(?:\.{_PART})?)"
            rf"\s+TYPE\s+([A-Za-z]+(?:\([^)]*\))?)\s*$",
            s,
        )
        if m:
            # metadata-only column widening (Iceberg safe type promotion);
            # dotted target widens a struct member
            top, member = _col_target(m.group(2))
            if member is not None:
                self.catalog.alter_struct_field_type(
                    _clean(m.group(1)), top, member, m.group(3)
                )
            else:
                self.catalog.alter_column_type(_clean(m.group(1)), top, m.group(3))
            return mk([], "result string")

        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+COLUMNS?\s*"
            rf"\(?\s*({_PART}(?:\.{_PART})?)\s*\)?\s*$",
            s,
        )
        if m:
            top, member = _col_target(m.group(2))
            if member is not None:
                self.catalog.drop_struct_field(_clean(m.group(1)), top, member)
            else:
                self.catalog.drop_column(_clean(m.group(1)), top)
            return mk([], "result string")

        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+WRITE\s+"
            rf"(?:(UNORDERED)|(?:(ORDERED|ZORDERED)\s+BY\s*\(?\s*([^)]+?)\s*\)?))\s*$",
            s,
        )
        if m:
            # Iceberg's ALTER TABLE ... WRITE ORDERED BY / WRITE UNORDERED
            # (+ a ZORDERED BY extension matching OPTIMIZE ZORDER BY):
            # declares the persisted sort order compact() re-applies
            if m.group(2):
                self.catalog.set_sort_order(_clean(m.group(1)), None)
            else:
                kind = "cluster" if m.group(3).upper() == "ORDERED" else "zorder"
                cols = [c.strip().strip("`") for c in m.group(4).split(",")]
                self.catalog.set_sort_order(_clean(m.group(1)), kind, cols)
            return mk([], "result string")

        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+(ADD|DROP)\s+PARTITION\s+FIELD\s+({_PART})\s*$",
            s,
        )
        if m:
            # Iceberg's partition-spec evolution statements: future writes
            # follow the updated identity spec, existing files keep theirs
            levels, verb, col = _clean(m.group(1)), m.group(2).upper(), m.group(3).strip("`")
            current = self.catalog.partition_spec(levels)
            if verb == "ADD":
                if col not in current:
                    current = current + [col]
            else:
                current = [c for c in current if c != col]
            self.catalog.set_partition_spec(levels, current)
            return mk([], "result string")

        m = re.match(
            rf"(?is)^DESCRIBE\s+(EXTENDED\s+)?(?:TABLE\s+)?({_IDENT})\s*$", s
        )
        if m:
            # DESCRIBE TABLE: column name/type/comment rows, plus the
            # layout + property metadata section under EXTENDED
            levels = _clean(m.group(2))
            mf = self.catalog.describe_table(levels, extended=bool(m.group(1)))
            return mk(mf, "col_name string, data_type string, comment string")

        m = re.match(
            rf"(?is)^OPTIMIZE\s+({_IDENT})\s+ZORDER\s+BY\s*\(([^)]*)\)\s*$", s
        )
        if m:
            # re-cluster on a Morton interleave (Delta OPTIMIZE ZORDER BY /
            # Iceberg zorder rewrite strategy)
            cols = [c.strip().strip("`") for c in m.group(2).split(",")]
            self.catalog.compact(_clean(m.group(1)), zorder_by=cols)
            return mk([], "result string")

        m = re.match(
            rf"(?is)^OPTIMIZE\s+({_IDENT})(?:\s+TO\s+(\d+)\s+FILES?)?\s*$", s
        )
        if m:
            # small-file compaction (Delta/Iceberg OPTIMIZE form) — the
            # metadata-commit rewrite, optionally to a target file count
            self.catalog.compact(
                _clean(m.group(1)),
                target_files=int(m.group(2)) if m.group(2) else 1,
            )
            return mk([], "result string")

        m = re.match(
            rf"(?is)^VACUUM\s+({_IDENT})(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?\s*$", s
        )
        if m:
            # snapshot expiry + repo-wide-reachability GC (expire_snapshots
            # + remove_orphan_files); RETAIN n VERSIONS keeps the newest n
            levels = _clean(m.group(1))
            keep = int(m.group(2)) if m.group(2) else 1
            expired = self.catalog.expire_versions(levels, keep_last=keep)
            removed = self.catalog.garbage_collect(levels[0])
            return mk(
                [(len(expired), len(removed))],
                "expired_versions int, removed_files int",
            )

        m = re.match(rf"(?is)^SHOW\s+PARTITIONS\s+({_IDENT})\s*$", s)
        if m:
            return self.catalog.partitions(_clean(m.group(1)))

        m = re.match(rf"(?is)^DESCRIBE\s+HISTORY\s+({_IDENT})\s*$", s)
        if m:
            # Delta's DESCRIBE HISTORY form over the snapshots metadata
            return self.catalog.snapshots(_clean(m.group(1)))

        m = re.match(
            rf"(?is)^RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*$",
            s,
        )
        if m:
            # snapshot rollback (Delta RESTORE form / Iceberg
            # rollback_to_snapshot): one metadata commit restoring the
            # historic state; history stays linear
            v = self.catalog.rollback_to_version(_clean(m.group(1)), int(m.group(2)))
            return mk([(v,)], "restored_as_version int")

        m = re.match(rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+RENAME\b", s)
        if m:
            # preserved non-capability (SURVEY.md §2.3): TABLE rename
            self.catalog.rename_table(_clean(m.group(1)), None)

        m = re.match(
            rf"(?is)^ANALYZE\s+TABLE\s+({_IDENT})\s+COMPUTE\s+STATISTICS"
            r"(?:\s+FOR\s+ALL\s+COLUMNS)?\s*$",
            s,
        )
        if m:
            # Spark's ANALYZE TABLE form: stats land in table properties
            # (one metadata commit) and come back as the result set
            stats = self.catalog.analyze_table(_clean(m.group(1)))
            return mk(sorted(stats.items()), "stat_key string, stat_value string")

        m = re.match(r"(?is)^CALL\s+(?:system\.)?(\w+)\s*\((.*)\)\s*$", s)
        if m:
            # Iceberg stored-procedure surface (CALL catalog.system.<proc>):
            # the procedures whose verbs have no dedicated SQL statement.
            # OPTIMIZE / VACUUM / RESTORE cover rewrite_data_files /
            # remove_orphan_files+expire / rollback; these four round out
            # the set. Args are positional: 'quoted strings' or integers.
            proc, raw = m.group(1).lower(), m.group(2).strip()
            args = []
            for part in re.findall(r"'(?:[^']*)'|[^,\s][^,]*", raw):
                part = part.strip()
                if part.startswith("'"):
                    args.append(part[1:-1])
                elif re.fullmatch(r"-?\d+", part):
                    args.append(int(part))
                else:
                    args.append(part)
            if proc == "cherrypick_snapshot" and len(args) == 3:
                cid = self.catalog.cherry_pick(str(args[0]), str(args[1]), str(args[2]))
                return mk([(cid,)], "commit_id string")
            if proc == "revert" and len(args) == 2:
                cid = self.catalog.revert(str(args[0]), str(args[1]))
                return mk([(cid,)], "commit_id string")
            if proc == "add_files" and len(args) == 2:
                n = self.catalog.add_files(str(args[0]), str(args[1]))
                return mk([(n,)], "added_files_count int")
            if proc == "expire_snapshots" and len(args) in (1, 2):
                # second arg: an int = retain-last count; a timestamp
                # string = Iceberg's older_than => TIMESTAMP cutoff
                # (naive timestamps read as UTC, like the engine's scans)
                if len(args) == 2 and isinstance(args[1], str):
                    import datetime as _dt

                    ts = _dt.datetime.fromisoformat(args[1])
                    if ts.tzinfo is None:
                        ts = ts.replace(tzinfo=_dt.timezone.utc)
                    expired = self.catalog.expire_versions(
                        str(args[0]), older_than=ts.timestamp()
                    )
                else:
                    keep = int(args[1]) if len(args) == 2 else 1
                    expired = self.catalog.expire_versions(
                        str(args[0]), keep_last=keep
                    )
                return mk([(v,) for v in expired], "expired_version int")
            if proc == "remove_orphan_files" and len(args) == 1:
                removed = self.catalog.garbage_collect(str(args[0]))
                return mk([(p,) for p in removed], "orphan_file_location string")
            raise UnsupportedOperationError(
                f"unknown procedure or arity: {proc}({raw})"
            )

        raise UnsupportedOperationError(f"unsupported statement: {s[:80]!r}")

    def _merge_into(self, target, t_alias, using, on, when, mk) -> DataFrame:
        """MERGE INTO <target> USING <source> ON <equi-keys> WHEN ... —
        the FULL clause grammar the reference's pinned Iceberg SQL
        extensions expose (conftest.py:67, pom.xml:77-82): conditional
        ``WHEN MATCHED [AND cond] THEN DELETE``, column-level ``UPDATE
        SET c = expr``, multiple MATCHED clauses (first-match-wins),
        conditional NOT-MATCHED inserts (``INSERT * `` or ``INSERT
        (cols) VALUES (exprs)``), and ``WHEN NOT MATCHED BY SOURCE``
        update/delete. The three unconditional whole-row shapes keep
        their specialized fast paths (merge_upsert / merge_sync); every
        other clause list dispatches to catalog.merge_clauses — the
        shared clause engine (merge_clauses.py). Sources: a lakefs table
        identifier or a parenthesized subquery with an alias (+ optional
        column list). Clause conditions/assignments may qualify columns
        with the statement's aliases (rewritten to the engine's t/s);
        CASE expressions inside MERGE clauses are not supported by this
        parser (the Python API takes them)."""
        using = using.strip()
        sm = re.match(rf"(?is)^({_IDENT})(?:\s+(?:AS\s+)?(\w+))?$", using)
        if sm:
            source = self.catalog.scan(_clean(sm.group(1)))
            s_alias = sm.group(2)
        else:
            sm = re.match(r"(?is)^\((.+)\)\s+(?:AS\s+)?(\w+)\s*(?:\(([^)]*)\))?$", using)
            if not sm:
                raise UnsupportedOperationError(f"unsupported MERGE source: {using[:60]!r}")
            source = self.spark.sql(self._resolve_views(sm.group(1)))
            s_alias = sm.group(2)
            if sm.group(3):
                source = source.toDF(*[c.strip().strip("`") for c in sm.group(3).split(",")])
        key_cols = []
        aliases = {a for a in (t_alias, s_alias) if a}
        for conj in re.split(r"(?i)\s+AND\s+", on.strip()):
            em = re.match(rf"(?s)^\s*({_PART}(?:\.{_PART})?)\s*=\s*({_PART}(?:\.{_PART})?)\s*$", conj)
            if not em:
                raise UnsupportedOperationError(f"MERGE ON must be equi-conjuncts: {conj!r}")
            cols = set()
            for side in em.groups():
                parts = [p.strip("`") for p in re.findall(_PART, side)]
                if len(parts) == 2 and aliases and parts[0] not in aliases:
                    raise UnsupportedOperationError(f"unknown alias in MERGE ON: {parts[0]!r}")
                cols.add(parts[-1])
            if len(cols) != 1:
                raise UnsupportedOperationError(
                    f"MERGE ON must compare the same column on both sides: {conj!r}"
                )
            key_cols.append(cols.pop())
        clauses = self._parse_merge_clauses(when, t_alias, s_alias)
        shapes = [(c.when, c.action) for c in clauses]
        uncond_whole = all(
            c.condition is None and c.assignments is None for c in clauses
        )
        tgt = _clean(target)
        if uncond_whole and shapes == [
            ("matched", "update"), ("not_matched", "insert"),
        ]:
            self.catalog.merge_upsert(tgt, source, key_cols)
        elif uncond_whole and shapes == [
            ("matched", "update"), ("not_matched", "insert"),
            ("not_matched_by_source", "delete"),
        ]:
            self.catalog.merge_sync(tgt, source, key_cols, insert_unmatched=True)
        elif uncond_whole and shapes == [
            ("matched", "update"), ("not_matched_by_source", "delete"),
        ]:
            self.catalog.merge_sync(tgt, source, key_cols, insert_unmatched=False)
        else:
            self.catalog.merge_clauses(tgt, source, key_cols, clauses)
        return mk([], "result string")

    @staticmethod
    def _split_top_commas(s: str) -> list[str]:
        """Split on commas OUTSIDE parentheses (assignment lists and
        VALUES tuples hold function calls with their own commas)."""
        parts, depth, cur = [], 0, []
        for ch in s:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        return [p.strip() for p in parts]

    def _parse_merge_clauses(self, when: str, t_alias, s_alias) -> list:
        """WHEN-clause list -> MergeClause list. ``when`` is the
        statement text AFTER the first top-level WHEN. Alias qualifiers
        are rewritten to the clause engine's fixed ``t``/``s``."""
        from .merge_clauses import MergeClause

        def norm(expr: str | None) -> str | None:
            if expr is None:
                return None
            e = expr
            if t_alias and t_alias != "t":
                e = re.sub(rf"\b{re.escape(t_alias)}\s*\.", "t.", e)
            if s_alias and s_alias != "s":
                e = re.sub(rf"\b{re.escape(s_alias)}\s*\.", "s.", e)
            return e.strip()

        clauses = []
        for part in re.split(r"(?is)\s+WHEN\s+", when.strip()):
            m = re.match(
                r"(?is)^(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED|MATCHED)"
                r"(?:\s+AND\s+(.*?))?\s+THEN\s+(.+)$",
                part.strip(),
            )
            if not m:
                raise UnsupportedOperationError(
                    f"unsupported MERGE clause: WHEN {part[:60]!r}"
                )
            fam = re.sub(r"\s+", "_", m.group(1).lower())
            cond, act = norm(m.group(2)), m.group(3).strip()
            if re.match(r"(?is)^DELETE$", act):
                clauses.append(MergeClause(fam, "delete", condition=cond))
                continue
            um = re.match(r"(?is)^UPDATE\s+SET\s+(.+)$", act)
            if um:
                body = um.group(1).strip()
                assigns = None
                if body != "*":
                    assigns = {}
                    for item in self._split_top_commas(body):
                        am = re.match(
                            rf"(?s)^({_PART}(?:\.{_PART})?)\s*=\s*(.+)$",
                            item,
                        )
                        if not am:
                            raise UnsupportedOperationError(
                                f"unsupported SET item: {item[:60]!r}"
                            )
                        col = [p.strip("`") for p in re.findall(_PART, am.group(1))][-1]
                        assigns[col] = norm(am.group(2))
                clauses.append(
                    MergeClause(fam, "update", condition=cond, assignments=assigns)
                )
                continue
            if re.match(r"(?is)^INSERT\s+\*$", act):
                clauses.append(MergeClause(fam, "insert", condition=cond))
                continue
            im = re.match(
                r"(?is)^INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.+)\)$", act
            )
            if im:
                cols = [c.strip().strip("`") for c in im.group(1).split(",")]
                vals = self._split_top_commas(im.group(2))
                if len(cols) != len(vals):
                    raise UnsupportedOperationError(
                        "INSERT column list and VALUES arity differ"
                    )
                clauses.append(
                    MergeClause(
                        fam, "insert", condition=cond,
                        assignments={c: norm(v) for c, v in zip(cols, vals)},
                    )
                )
                continue
            raise UnsupportedOperationError(
                f"unsupported MERGE action: {act[:60]!r}"
            )
        return clauses

    @staticmethod
    def _partition_kwargs(clause: str | None) -> dict:
        """Parse a PARTITIONED BY item list into create_table_as kwargs.
        Plain identifiers → identity partition spec; a single Iceberg
        transform call — ``bucket(N, col)``, ``truncate(W, col)`` (both in
        Iceberg's numeric-first SQL order) or ``days(col)`` — maps to the
        corresponding layout spec. Mixing transforms with identity columns
        is refused, matching the catalog's one-layout-spec rule."""
        if not clause:
            return {}
        items = [p.strip() for p in clause.split(",")]
        # a transform call anywhere in the clause (not just the first item —
        # PARTITIONED BY (u, bucket(4, id)) must hit the mixing refusal, not
        # comma-split the call into bogus identity column names)
        calls = [
            i for i, p in enumerate(items) if re.match(r"(?is)^\w+\s*\(", p)
        ]
        if not calls:
            return {"partition_by": [p.strip("`") for p in items]}
        fm = re.match(r"(?is)^(bucket|truncate|days)\s*\(", items[calls[0]])
        if fm is None or calls[0] != 0:
            raise UnsupportedOperationError(
                "partition transforms cannot mix with identity partition "
                f"columns, and only bucket/truncate/days are supported: {clause!r}"
            )
        fn = fm.group(1).lower()
        if fn == "bucket":
            m = re.match(r"(?is)^bucket\s*\(\s*(\d+)\s*,\s*`?(\w+)`?\s*\)$", ",".join(items))
            if not m:
                raise UnsupportedOperationError(f"cannot parse bucket transform: {clause!r}")
            return {"bucket_by": (m.group(2), int(m.group(1)))}
        if fn == "truncate":
            m = re.match(r"(?is)^truncate\s*\(\s*(\d+)\s*,\s*`?(\w+)`?\s*\)$", ",".join(items))
            if not m:
                raise UnsupportedOperationError(f"cannot parse truncate transform: {clause!r}")
            return {"transform_by": ("truncate", m.group(2), int(m.group(1)))}
        m = re.match(r"(?is)^days\s*\(\s*`?(\w+)`?\s*\)$", ",".join(items))
        if not m:
            raise UnsupportedOperationError(f"cannot parse days transform: {clause!r}")
        return {"transform_by": ("days", m.group(1))}

    @staticmethod
    def _find_top_level_kw(s: str, kw: str) -> int | None:
        """Index of the first whitespace-delimited occurrence of ``kw``
        (case-insensitive) at paren depth 0 outside string quotes, or None.
        Same scanning model as _split_top_level."""
        depth, quote, i, n = 0, None, 0, len(s)
        klen = len(kw)
        while i < n:
            ch = s[i]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in "'\"":
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif (
                depth == 0
                and s[i:i + klen].upper() == kw.upper()
                and (i == 0 or s[i - 1].isspace())
                and (i + klen == n or s[i + klen].isspace())
            ):
                return i
            i += 1
        return None

    @staticmethod
    def _split_top_level(s: str) -> list[str]:
        out, depth, cur, quote = [], 0, [], None
        for ch in s:
            if quote:
                cur.append(ch)
                if ch == quote:
                    quote = None
                continue
            if ch in "'\"":
                quote = ch
                cur.append(ch)
            elif ch == "(":
                depth += 1
                cur.append(ch)
            elif ch == ")":
                depth -= 1
                cur.append(ch)
            elif ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

