"""General MERGE clause resolution, shared by every merge backend.

The reference inherits the full Iceberg/Delta MERGE grammar through the
pinned Spark SQL extensions (reference ``tests/conftest.py:67``,
``pom.xml:77-82``): conditional clauses (``WHEN MATCHED AND <cond> THEN
DELETE``), column-level assignments (``UPDATE SET c = expr``), multiple
MATCHED clauses with first-match-wins evaluation, conditional NOT-MATCHED
inserts, and ``WHEN NOT MATCHED BY SOURCE`` update/delete. This module is
the one clause engine behind the versioned catalog
(``catalog.merge_clauses``), the Iceberg writer
(``IcebergTableWriter.merge_clauses_mor``), the Delta writer
(``DeltaTableWriter.merge_clauses``), and the SQL facade's MERGE parser —
so clause semantics (ordering, defaults, cardinality, type coercion)
cannot drift between backends.

Semantics, matching stock Spark's MergeIntoTable resolution:

- Row families: MATCHED (target ∧ source), NOT MATCHED (source only),
  NOT MATCHED BY SOURCE (target only). Clauses apply only within their
  family, in statement order, first TRUE condition wins; a clause with no
  condition always fires (and must therefore be the LAST of its family —
  stock's analyzer enforces the same).
- Defaults: a matched / target-only row no clause fires for is CARRIED
  unchanged; a source-only row no clause fires for is DROPPED.
- ``UPDATE SET *`` / ``INSERT *`` are whole-row by-name shorthands;
  explicit assignments map target column -> SQL expression over the
  aliases ``t`` (target) and ``s`` (source). Unassigned columns keep the
  target value (UPDATE) or become NULL (INSERT). Every produced value is
  cast to the target column type (stock's store-assignment coercion).
- Cardinality: a target row matched by MORE THAN ONE source row raises
  (stock's MERGE_CARDINALITY_VIOLATION) whenever a MATCHED clause exists.

Scale: the resolution is expressed as three key-partitioned joins —
matched = inner join on the key, source-only = anti join, target-only =
anti join (built only when a BY SOURCE clause exists, because that family
inherently touches every target row, exactly as stock plans it) — never
one monolithic full-outer: each side streams once per join it actually
participates in, the inner join stays broadcast-eligible, and backends
that only need the matched/insert families (touched-file CoW, MoR
position deltas) never pay a full target shuffle.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MergeClause",
    "action_column",
    "key_equal",
    "projected_images",
    "select_as",
    "validate_clauses",
    "whole_row_shape",
]

_VALID = {
    ("matched", "update"),
    ("matched", "delete"),
    ("not_matched", "insert"),
    ("not_matched_by_source", "update"),
    ("not_matched_by_source", "delete"),
}


@dataclass(frozen=True)
class MergeClause:
    """One WHEN clause. ``assignments=None`` means the whole-row shorthand
    (``UPDATE SET *`` / ``INSERT *``)."""

    when: str  # 'matched' | 'not_matched' | 'not_matched_by_source'
    action: str  # 'update' | 'delete' | 'insert'
    condition: str | None = None  # SQL over aliases t.<col> / s.<col>
    assignments: dict[str, str] | None = None


def validate_clauses(
    clauses: list[MergeClause], columns: list[str]
) -> None:
    """Shape checks stock's analyzer performs before planning."""
    if not clauses:
        raise ValueError("MERGE requires at least one WHEN clause")
    last_uncond: dict[str, int] = {}
    for i, c in enumerate(clauses):
        if (c.when, c.action) not in _VALID:
            raise ValueError(
                f"illegal MERGE clause: WHEN {c.when} THEN {c.action}"
            )
        if c.action == "delete" and c.assignments is not None:
            raise ValueError("DELETE clause takes no assignments")
        if c.action == "update" and c.when == "not_matched_by_source":
            if c.assignments is None:
                raise ValueError(
                    "NOT MATCHED BY SOURCE UPDATE needs explicit "
                    "assignments (there is no source row for SET *)"
                )
        if c.assignments is not None:
            unknown = [k for k in c.assignments if k not in columns]
            if unknown:
                raise ValueError(
                    f"MERGE assignments on unknown columns: {unknown}"
                )
        if c.condition is None:
            if c.when in last_uncond:
                raise ValueError(
                    f"only the last WHEN {c.when} clause may omit its "
                    "condition (stock's analyzer rule)"
                )
            last_uncond[c.when] = i
        elif c.when in last_uncond:
            raise ValueError(
                f"WHEN {c.when} clauses after the unconditional one are "
                "unreachable (stock's analyzer rule)"
            )


def whole_row_shape(clauses: list[MergeClause]) -> bool:
    """True when the clause list is exactly the legacy whole-row upsert
    (MATCHED UPDATE SET * + NOT MATCHED INSERT *, both unconditional) —
    backends keep their specialized fast paths for it."""
    return (
        len(clauses) == 2
        and {(c.when, c.action) for c in clauses}
        == {("matched", "update"), ("not_matched", "insert")}
        and all(c.condition is None and c.assignments is None for c in clauses)
    )


def key_equal(key_cols: list[str]) -> Column:
    """The ON condition ``t.k = s.k AND ...`` (stock's ``=``: NULL keys
    never match, landing NULL-keyed source rows in NOT MATCHED)."""
    return functools.reduce(
        lambda a, b: a & b,
        [F.col(f"t.`{k}`") == F.col(f"s.`{k}`") for k in key_cols],
    )


def action_column(clauses: list[MergeClause], family: str) -> Column:
    """``__action`` for one row family: an ``F.when`` chain in clause
    order labeling the first clause whose condition is TRUE
    (``'<action>:<clause index>'``), else the family default
    ('drop' for source-only rows, 'carry' otherwise)."""
    chain: Column | None = None
    for i, c in enumerate(clauses):
        if c.when != family:
            continue
        cond = (
            F.lit(True)
            if c.condition is None
            # NULL-evaluating conditions do not fire the clause (SQL
            # three-valued logic, same as stock)
            else F.coalesce(F.expr(c.condition), F.lit(False))
        )
        lbl = F.lit(f"{c.action}:{i}")
        chain = F.when(cond, lbl) if chain is None else chain.when(cond, lbl)
    default = F.lit("drop" if family == "not_matched" else "carry")
    return default if chain is None else chain.otherwise(default)


def select_as(prefix: str, fields: list[tuple[str, str]]) -> list[Column]:
    """``t.x AS x`` projections for carried rows."""
    return [F.col(f"{prefix}.`{n}`").alias(n) for n, _t in fields]


def projected_images(
    frame: DataFrame,
    clauses: list[MergeClause],
    fields: list[tuple[str, str]],
    kind: str,
    family: str | None = None,
) -> DataFrame:
    """Rows of ``frame`` (which carries ``__action``) whose action is
    ``kind`` ('update' | 'insert'), projected to their NEW row images:
    per clause, assigned columns evaluate their expression, unassigned
    ones keep the target value (update) or become NULL (insert);
    whole-row shorthand takes every column from ``s`` by name. Every
    value is cast to the target column type (``fields`` = (name, DDL
    type)) — stock's store-assignment coercion, and what keeps the
    backends' unions type-stable. ``family`` scopes the CASE arms to one
    row family's clauses — a BY SOURCE frame has no ``s`` columns, so a
    matched-family arm referencing ``s.x`` must not be built into its
    projection even though its action label can never fire there."""
    idxs = [
        i
        for i, c in enumerate(clauses)
        if c.action == kind and (family is None or c.when == family)
    ]
    out: list[Column] = []
    for name, dtype in fields:
        chain: Column | None = None
        for i in idxs:
            c = clauses[i]
            if c.assignments is None:
                e = F.col(f"s.`{name}`")
            elif name in c.assignments:
                e = F.expr(c.assignments[name])
            elif kind == "update":
                e = F.col(f"t.`{name}`")
            else:
                e = F.lit(None)
            hit = F.col("__action") == f"{kind}:{i}"
            chain = F.when(hit, e) if chain is None else chain.when(hit, e)
        assert chain is not None  # caller only asks for kinds it declared
        out.append(chain.cast(dtype).alias(name))
    return frame.filter(
        F.col("__action").startswith(kind)
    ).select(*out)
