"""Shared expression helpers for oracle-deterministic results."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Ceiling for any driver-side result materialization. The collect-and-
# recreate pattern exists ONLY so fixture-scale results survive temp-dir
# cleanup (versioned-catalog scenarios, source round-trips, streaming
# sinks); it must never silently become a way to funnel an unbounded
# distributed result through the driver. Fixture results are 6-20k rows;
# anything above this ceiling is a misuse, not a bigger fixture.
MATERIALIZE_ROW_CEILING = 100_000


class MaterializeCeilingError(RuntimeError):
    """A driver-side materialization exceeded MATERIALIZE_ROW_CEILING."""


# Sessions whose Arrow-input conf local_df already enabled (set once,
# never restored — restoring raced concurrent createDataFrame calls).
_ARROW_ENABLED: set[int] = set()


def local_df(spark: SparkSession, data, schema) -> DataFrame:
    """JVM-backed local DataFrame — use instead of bare
    ``spark.createDataFrame(list_of_rows, schema)``.

    The default list-input path parallelizes PICKLED Python rows into a
    PythonRDD-backed ``Scan ExistingRDD``: every downstream Spark job
    then pays a Python-worker round trip (~4 s per job measured at
    local[32] — the dominant cost of the multi-commit DML fixtures). The
    pandas+Arrow input path instead lands the data in a true JVM
    ``LocalTableScan`` (~0.07 s per job, no Python in the plan).

    Rows may be tuples or pyspark Rows; ``schema`` is a DDL string or
    StructType. Columns are built as object-dtype Series so None never
    degrades to NaN before Arrow applies the target types. Falls back to
    the classic path (with a logged warning) if Arrow conversion refuses
    (pyspark's own fallback stays enabled too).

    The Arrow conf is set ONCE per session and left on (ADVICE r8 #2:
    the old set/restore-per-call dance raced concurrent DataFrame
    creation on other threads); duplicate field names are rejected
    explicitly — the dict-built pandas frame would silently collapse
    them and take the slow pickled path."""
    import pandas as pd
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    names = [f.name for f in schema.fields]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate field names in local_df schema: {names}")
    rows = [tuple(r) for r in data]
    pdf = pd.DataFrame(
        {
            f.name: pd.Series([r[i] for r in rows], dtype=object)
            for i, f in enumerate(schema.fields)
        },
        columns=names,
    )
    if not rows:  # empty frame: pandas needs the columns declared anyway
        pdf = pd.DataFrame({f.name: pd.Series([], dtype=object) for f in schema.fields})
    conf_key = "spark.sql.execution.arrow.pyspark.enabled"
    if id(spark) not in _ARROW_ENABLED:
        spark.conf.set(conf_key, "true")
        _ARROW_ENABLED.add(id(spark))
    try:
        return spark.createDataFrame(pdf, schema=schema)
    except Exception as exc:  # Arrow refused this shape: classic path
        import warnings

        warnings.warn(
            f"local_df: Arrow conversion fell back to the pickled path "
            f"({type(exc).__name__}: {exc})",
            stacklevel=2,
        )
        return spark.createDataFrame(rows, schema=schema)



def bounded_rows(df: DataFrame, ceiling: int = MATERIALIZE_ROW_CEILING) -> list:
    """Collect at most ``ceiling`` rows; raise if the result is larger.
    The probe collects ceiling+1 rows (never the full oversized result), so
    the driver's exposure is bounded even in the failure path."""
    rows = df.limit(ceiling + 1).collect()
    if len(rows) > ceiling:
        raise MaterializeCeilingError(
            f"driver-side materialization exceeds {ceiling} rows; "
            "this pattern is for bounded fixture results only — write the "
            "result to storage and read it back instead"
        )
    return rows


def materialize_bounded(
    spark: SparkSession, df: DataFrame, ceiling: int = MATERIALIZE_ROW_CEILING
) -> DataFrame:
    """Driver-side collect-and-recreate with an explicit row ceiling."""
    return local_df(spark, bounded_rows(df, ceiling), df.schema)


# Query-scoped cache registry: operators with diamond-shaped plans (one
# expensive intermediate consumed by several branches) persist through
# scoped_persist; harness entry points (__spark_entry__.queries() wrapper,
# bench.py's per-query loop, the pytest replay fixture) call release_scoped
# BEFORE running the next query. Net: at most one query's caches are ever
# held, so a 50-key sweep accumulates nothing, while the returned plan stays
# lazy and its consumer reads the hot cache.
_SCOPED_CACHES: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist a diamond-shaped intermediate with query-scoped lifetime.

    Why not let Catalyst share the subtree instead: column pruning
    specializes each consumer's copy (every branch reads different columns),
    so the exchanges are not plan-identical and ReuseExchange does NOT fire
    — measured 12 parquet scans per action and a 14× slowdown on
    pipeline_training_corpus with these persists removed. Why not an eager
    localCheckpoint per call (round 3): it forces a full materialization on
    every invocation (bench measured 6.8× of baseline on
    dedup_near_minhash), severs pushdown for downstream consumers, and is
    not durable on a real cluster anyway. At cluster scale this pattern is
    persist(MEMORY_AND_DISK) of a hot intermediate table with an explicit
    release once the consuming job finishes."""
    _SCOPED_CACHES.append(df.persist())
    return df


def defer_release(df: DataFrame) -> DataFrame:
    """Register an ALREADY-materialized DataFrame (a pinned/checkpointed
    result) for release at the next harness query. Used for outputs whose
    storage must outlive their operator call — the consumer still has to
    read them — but not the sweep."""
    _SCOPED_CACHES.append(df)
    return df


def _release_one(df: DataFrame) -> None:
    """Free one registered cache: CacheManager storage via unpersist, and —
    for lineage-cut (localCheckpoint) frames, whose unpersist is a silent
    no-op because their storage is plain RDD block cache — the underlying
    LogicalRDD's blocks directly. Best-effort on the reflective path: if
    the internals move, the ContextCleaner still frees the blocks when the
    frame is garbage-collected."""
    df.unpersist()
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


def release_scoped() -> None:
    """Release every query-scoped cache (harness entry points call this
    before each new query; idempotent)."""
    while _SCOPED_CACHES:
        _release_one(_SCOPED_CACHES.pop())


def pin(df: DataFrame) -> DataFrame:
    """Materialize a DataFrame for ITERATIVE consumers AND CUT ITS LOGICAL
    LINEAGE (label propagation re-reads its input every round and nests one
    more join/agg layer per round, so without the cut both the recompute
    AND the per-action Catalyst re-analysis grow with rounds — the analysis
    alone measured ~2.8 s per downstream action on the converged label
    frame vs 0.1 s lineage-cut, because every .count() on a persist-only
    pin re-analyzes the full iterative plan before the cache lookup).

    Cluster mode: set ``SPARK_GRAFT_CHECKPOINT_DIR`` to a shared filesystem
    path and this becomes a RELIABLE ``checkpoint()`` — files survive
    executor loss. Unset (local mode): ``localCheckpoint`` — executor block
    cache, freed by release_scoped/_release_one through the LogicalRDD
    (plain ``unpersist()`` on a checkpointed frame is a silent no-op, which
    is how round 3 leaked pinned partitions).

    One-shot operators must NOT pin — they use scoped_persist and return
    the lazy plan."""
    ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt_dir:
        df.sparkSession.sparkContext.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def dround(col: Column | str, scale: int = 2) -> Column:
    """Round a double exactly the way DuckDB rounds DOUBLE: scale by 10^s,
    C-style round-half-away-from-zero **in double arithmetic**, scale back.

    Spark's built-in ``round`` converts the exact binary double to BigDecimal
    and applies HALF_UP on its full decimal expansion — at half-way boundaries
    (x.xx5) the two disagree (e.g. 51546.284999999996*100 lands on
    5154628.5000...01 in binary, so DuckDB rounds up while BigDecimal sees
    ...2849... and rounds down).  All oracle-compared doubles go through this
    helper so Spark and DuckDB round identically by construction.
    """
    c = F.col(col) if isinstance(col, str) else col
    f = F.lit(float(10 ** scale))
    x = c * f
    return (F.when(x >= 0, F.floor(x + F.lit(0.5))).otherwise(-F.floor(-x + F.lit(0.5)))) / f


# Gate for broadcast hints on plan inputs whose size grows with the data
# (dimension tables like customer/part scale linearly with SF — forcing a
# broadcast that is 10 MB at sf0.1 would be gigabytes at 100 TB). 128 MB:
# comfortably above every test-scale dimension, comfortably below what a
# 1000-executor cluster should ship to every task.
GATED_BROADCAST_LIMIT_BYTES = 128 << 20


def gated_broadcast(
    df: DataFrame, limit_bytes: int = GATED_BROADCAST_LIMIT_BYTES
) -> DataFrame:
    """Broadcast hint, applied only while the optimizer's size estimate for
    ``df`` stays under ``limit_bytes`` — metadata-only (file-size based for
    scans; filters don't shrink the estimate without CBO, which errs on the
    safe side). Over the limit — or if the estimate is unavailable — the
    frame is returned UN-hinted and the planner/AQE picks the join strategy
    from runtime sizes: failing closed, because a forced multi-GB broadcast
    is the failure mode this gate exists to prevent. Use for SF-proportional
    inputs; constant-size frames (literal codebooks, LIMITed query sets,
    nation/region) can keep a plain F.broadcast."""
    try:
        # py4j converts the scala BigInt to a Python int; str() also covers
        # a JavaObject passthrough on older bridges
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # estimation unavailable (non-JVM-backed plan, API drift)
        return df
    return F.broadcast(df) if size <= limit_bytes else df
