"""Ring C — similarity search over `embeddings.embedding` (array<float>):
brute-force cosine top-k as the exact baseline, and a hyperplane-LSH
bucketed variant as the scale path.

Scale notes (100 TB):
- Brute force is O(queries × corpus): correct as the small-query-set oracle
  (queries broadcast, corpus streamed, per-partition top-k then merge via
  the rank window). At cluster scale the corpus side never shuffles.
- LSH ANN: each vector is sign-hashed against h shared random hyperplanes →
  bucket key; query joins only its bucket (equi-join on the key — the same
  output-sized-join property as the MinHash band join). Recall measured in
  tests against the brute-force baseline; multi-probe (flip one bit) would
  raise recall at 2× candidate cost.
- Dot products run as JVM higher-order folds over the arrays (no Python, no
  explode). A Pandas-UDF BLAS path only wins once vectors are ≥~1k dims.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from ..tables import table
from .util import dround

_N_QUERIES = 8     # query set: vec_id < 8
_TOP_K = 5
_N_TABLES = 3      # OR-amplification: union of candidates over tables
_PLANES_PER_TABLE = 4
_PLANE_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _ranked_unique(sims):
    """Candidate-pair dedup + per-query rank in ONE shuffle (§2.4): under
    the rank window's ordering (cos DESC, neighbor_id) duplicate pairs —
    the same (query, neighbor) surfacing from several LSH tables or
    probes, with bit-identical cosine — sort ADJACENT, so a lag() check
    inside the SAME window partitioning replaces the dropDuplicates hash
    aggregate and its separate exchange. The second window reuses the
    first's partitioning and sort (no exchange, no re-sort); ``rnk``
    comes out exactly as dropDuplicates → row_number did."""
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn(
            "_dup", F.col("neighbor_id") == F.lag("neighbor_id").over(w)
        )
        .filter(~F.coalesce(F.col("_dup"), F.lit(False)))
        .drop("_dup")
        .withColumn("rnk", F.row_number().over(w))
    )


def _sqnorm(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))


def _cos_sql(a: str, b: str) -> str:
    """DuckDB cosine between `a`.embedding and `b`.embedding with the same
    sequential-sum fold order as the Spark-side `_dot`/`_sqnorm` folds, so
    both engines agree bitwise before rounding."""
    return f"""
list_aggregate(list_transform(range(1, len({a}.embedding) + 1),
    i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE)), 'sum')
/ (sqrt(list_aggregate(list_transform({a}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
 * sqrt(list_aggregate(list_transform({b}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
"""


_COSINE_ORACLE_EXPR = _cos_sql("q", "c")


@register(
    "similarity_topk",
    oracle=f"""
WITH sims AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
           {_COSINE_ORACLE_EXPR} AS cos
    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {_N_QUERIES}
),
ranked AS (
    SELECT query_id, neighbor_id, neighbor_label, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
    FROM sims
)
SELECT query_id, neighbor_id, neighbor_label, rnk, round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {_TOP_K}
""",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for a query set: broadcast the queries,
    stream the corpus, rank per query with a deterministic tiebreak.

    Dot product and norms are sequential double folds — the same arithmetic
    order as the DuckDB oracle's list_aggregate sums, so cosines agree
    bitwise before rounding."""
    e = table(spark, sf_dir, "embeddings")
    # Precompute each vector's norm ONCE (array folds are interpreted, not
    # codegen'd — per-pair norm recomputation tripled the fold work); the
    # per-pair arithmetic stays dot / (q_norm * c_norm), bitwise identical
    # to the oracle's expression.
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("q_norm"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("c_norm"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            (_dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "neighbor_label", "rnk", dround("cos", 6).alias("cosine"))
    )


def _planes() -> list[list[list[float]]]:
    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((_N_TABLES, _PLANES_PER_TABLE, 64)).tolist()


# kNN graph uses WIDER buckets tables (2^6 = 64 buckets/table vs the query
# keys' 16): every vector is a query, so candidate cost is Σ(bucket size)²
# over the WHOLE corpus — at 4 planes the interpreted cosine fold over
# ~740k sf0.1 candidate pairs dominated the query (~4s of 6.9s, VERDICT
# r10 #7 profiling); 6 planes cut candidates ~4x with recall still
# OR-amplified over 3 tables (coverage contract in test_ringc).
_KNN_PLANES_PER_TABLE = 6


def _knn_planes() -> list[list[list[float]]]:
    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((_N_TABLES, _KNN_PLANES_PER_TABLE, 64)).tolist()


def _lsh_bucket_sql(tbl_planes: list[list[float]], emb: str) -> str:
    """Sign-bit bucket key of `emb` against one table's literal planes —
    the same plane·vector fold order as the Spark `_dot` (plane is the
    first zip side), so signs agree bitwise. Python float repr round-trips
    to the identical double in DuckDB."""
    bits = []
    for plane in tbl_planes:
        lits = ", ".join(repr(v) for v in plane)
        bits.append(
            f"CASE WHEN list_aggregate(list_transform(range(1, 65),"
            f" i -> [{lits}][i] * CAST({emb}[i] AS DOUBLE)), 'sum') >= 0"
            f" THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


def _ann_lsh_oracle() -> str:
    """DuckDB replay of the full LSH pipeline: per-table bucket keys from
    the SAME seeded literal planes, candidate union over tables, exact
    cosine + rank inside the candidate set. The planes are deterministic
    driver-side literals, so the 'approximate' operator is still an exact,
    hash-checkable function of its inputs."""
    buckets = ",\n       ".join(
        f"{_lsh_bucket_sql(tp, 'embedding')} AS b{ti}"
        for ti, tp in enumerate(_planes())
    )
    cand_union = "\n    UNION\n    ".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id"
        f" FROM buckets q JOIN buckets c ON q.b{t} = c.b{t}"
        f" WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id"
        for t in range(_N_TABLES)
    )
    return f"""
WITH buckets AS (
SELECT vec_id, embedding,
       {buckets}
FROM embeddings
),
cand AS (
    {cand_union}
),
sims AS (
    SELECT cd.query_id, cd.neighbor_id,
           {_COSINE_ORACLE_EXPR} AS cos
    FROM cand cd
    JOIN embeddings q ON q.vec_id = cd.query_id
    JOIN embeddings c ON c.vec_id = cd.neighbor_id
),
ranked AS (SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           FROM sims)
SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {_TOP_K}
"""


def _lsh_bucketed(
    spark: SparkSession,
    sf_dir: str,
    with_norm: bool = False,
    planes: list[list[list[float]]] | None = None,
) -> DataFrame:
    """(vec_id, embedding, tbl, bucket) — all hash tables' sign-bit bucket
    keys in ONE corpus pass (explode of per-table structs). With
    ``with_norm``, a ``nrm`` column is computed ONCE PER CORPUS ROW before
    the explode (the similarity_topk hoist, BASELINE.md lesson 4) so
    candidate-pair consumers never recompute norms per pair. ``planes``
    overrides the default query-key tables (knn_graph hashes with more
    planes per table — narrower buckets for the all-pairs workload)."""
    e = table(spark, sf_dir, "embeddings")
    if with_norm:
        e = e.withColumn("nrm", F.sqrt(_sqnorm(F.col("embedding"))))
    table_structs = F.array(
        *[
            F.struct(
                F.lit(ti).alias("tbl"),
                F.concat_ws(
                    "",
                    F.transform(
                        F.array(*[F.array(*[F.lit(float(v)) for v in p]) for p in tbl_planes]),
                        lambda p: F.when(_dot(p, F.col("embedding")) >= 0, "1").otherwise("0"),
                    ),
                ).alias("bucket"),
            )
            for ti, tbl_planes in enumerate(planes if planes is not None else _planes())
        ]
    )
    keep = ["vec_id", "embedding"] + (["nrm"] if with_norm else [])
    return e.select(*keep, F.explode(table_structs).alias("tb")).select(
        *keep,
        F.col("tb.tbl").alias("tbl"),
        F.col("tb.bucket").alias("bucket"),
    )


@register("similarity_ann_lsh", oracle=_ann_lsh_oracle())
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH: 3 hash
    tables × 4 seeded planes; each vector gets one sign-bit bucket key per
    table, a query meets the union of its buckets' members (equi-join on
    (table, key) — OR-amplification lifts recall the way MinHash bands do),
    then exact cosine + rank inside the candidate set.

    Planes are generated from a fixed seed on the driver and embedded as
    literal array columns — every executor hashes identically, and reruns
    are deterministic. That determinism makes even this "approximate"
    operator an exact function of its inputs: the DuckDB oracle replays the
    identical plane literals, bucket keys, candidate union, and rank, so
    the key is hash-matched, not rows-only. Recall vs the brute-force
    baseline and the candidate cost reduction are asserted in
    tests/test_ringc.py.

    Single corpus scan: all 3 tables' bucket keys are computed in ONE pass
    as an exploded array of (tbl, bucket) structs — a per-table union would
    re-read the corpus once per hash table (3× IO at 100 TB; the same
    one-scan-explode shape as the MinHash band keys). The plan is audited
    in tests/test_plans.py to hold at exactly two embedding scans: the
    streamed corpus side plus the pushed-filter query side."""
    bucketed = _lsh_bucketed(spark, sf_dir)
    q = bucketed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("q_norm"),
        "tbl",
        "bucket",
    )
    cands = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("c_norm"),
        "tbl",
        "bucket",
    )
    pairs = (
        F.broadcast(q)
        .join(cands, ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # cosine BEFORE the distinct (VERDICT r8 #8, the knn-graph
            # fix propagated): the dedup shuffle carries one double per
            # candidate, never two embedding payloads
            (
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos"),
        )
    )
    # union over tables/probes deduped INSIDE the rank window — one
    # shuffle where dropDuplicates + row_number paid two (_ranked_unique)
    return (
        _ranked_unique(pairs)
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "rnk", dround("cos", 6).alias("cosine"))
    )


def _flip_bit_sql(col: str, i: int) -> str:
    """SQL for `col` (a '0'/'1' bucket string) with 1-based bit ``i``
    flipped — identical text works in Spark SQL and DuckDB (substr with
    no length runs to the end; past-the-end yields '')."""
    return (
        f"substr({col}, 1, {i - 1}) || "
        f"(CASE WHEN substr({col}, {i}, 1) = '1' THEN '0' ELSE '1' END) || "
        f"substr({col}, {i + 1})"
    )


def _ann_lsh_multiprobe_oracle() -> str:
    """DuckDB replay of multi-probe LSH: per table, a query probes its exact
    bucket PLUS every one-bit flip of it (the 1-neighborhood — the buckets a
    near-miss vector most likely fell into)."""
    buckets = ",\n       ".join(
        f"{_lsh_bucket_sql(tp, 'embedding')} AS b{ti}"
        for ti, tp in enumerate(_planes())
    )

    def probes(t: int) -> str:
        return ", ".join(
            [f"q.b{t}"]
            + [_flip_bit_sql(f"q.b{t}", i) for i in range(1, _PLANES_PER_TABLE + 1)]
        )

    cand_union = "\n    UNION\n    ".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id"
        f" FROM buckets q JOIN buckets c ON c.b{t} IN ({probes(t)})"
        f" WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id"
        for t in range(_N_TABLES)
    )
    return f"""
WITH buckets AS (
SELECT vec_id, embedding,
       {buckets}
FROM embeddings
),
cand AS (
    {cand_union}
),
sims AS (
    SELECT cd.query_id, cd.neighbor_id,
           {_COSINE_ORACLE_EXPR} AS cos
    FROM cand cd
    JOIN embeddings q ON q.vec_id = cd.query_id
    JOIN embeddings c ON c.vec_id = cd.neighbor_id
),
ranked AS (SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           FROM sims)
SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {_TOP_K}
"""


@register("similarity_ann_lsh_multiprobe", oracle=_ann_lsh_multiprobe_oracle())
def similarity_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH: each query probes its exact bucket PLUS every
    one-bit flip of it in every hash table — the recall knob the plain LSH
    key documents. The near-misses LSH loses are vectors that landed one
    sign bit away; probing the 1-neighborhood recovers most of them at a
    bounded candidate cost: the CORPUS side is untouched and never
    re-hashed, only the tiny query side fans out ×(1 + bits), and the
    candidate join stays an equi-join on (tbl, bucket).

    Recall ≥ single-probe by construction (probe sets are supersets);
    measured with the candidate-count cost in tests/test_ringc.py.
    Deterministic seeded planes → the DuckDB oracle replays the exact probe
    sets, so the key is hash-matched like the single-probe one."""
    bucketed = _lsh_bucketed(spark, sf_dir)
    probe_exprs = [F.col("bucket")] + [
        F.expr(_flip_bit_sql("bucket", i)) for i in range(1, _PLANES_PER_TABLE + 1)
    ]
    q = bucketed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("q_norm"),
        "tbl",
        F.explode(F.array(*probe_exprs)).alias("bucket"),
    )
    cands = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("c_norm"),
        "tbl",
        "bucket",
    )
    pairs = (
        F.broadcast(q)
        .join(cands, ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # cosine BEFORE the distinct (VERDICT r8 #8, the knn-graph
            # fix propagated): the dedup shuffle carries one double per
            # candidate, never two embedding payloads
            (
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos"),
        )
    )
    # union over tables/probes deduped INSIDE the rank window — one
    # shuffle where dropDuplicates + row_number paid two (_ranked_unique)
    return (
        _ranked_unique(pairs)
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "rnk", dround("cos", 6).alias("cosine"))
    )


_IVF_CENTROID_IDS = (8, 15)   # vec_id range seeding the k-means INIT
_IVF_NPROBE = 2
_IVF_SAMPLE_N = 64            # k-means fit sample: vec_id < 64 (bounded)
_IVF_ROUNDS = 2               # fixed Lloyd's iterations (deterministic)
_DIM = 64


def _kmeans_round_sql(prev: str, rnd: int) -> str:
    """One unrolled Lloyd's round as DuckDB CTEs: assign the sample to its
    nearest ``prev`` centroid (cosine, sequential folds, ties to the smaller
    cid), then recompute each centroid as the element-wise mean of its
    members IN vec_id ORDER with a sequential list_reduce fold — the exact
    arithmetic order the Python fit uses, so both engines produce bitwise-
    identical centroids. Empty clusters keep their previous centroid."""
    cos = (
        f"list_aggregate(list_transform(range(1, {_DIM + 1}),"
        f" i -> CAST(s.embedding[i] AS DOUBLE) * c.cemb[i]), 'sum')"
        f" / (sqrt(list_aggregate(list_transform(s.embedding,"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
        f" * sqrt(list_aggregate(list_transform(c.cemb, x -> x * x), 'sum')))"
    )
    return f"""
s{rnd} AS (SELECT s.vec_id, c.cid, {cos} AS ccos FROM samp s CROSS JOIN {prev} c),
r{rnd} AS (SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rr
           FROM s{rnd}),
g{rnd} AS (SELECT r.cid,
                  list(list_transform(s.embedding, x -> CAST(x AS DOUBLE)) ORDER BY s.vec_id) AS embs,
                  count(*) AS n
           FROM r{rnd} r JOIN samp s USING (vec_id) WHERE r.rr = 1 GROUP BY r.cid),
c{rnd} AS (SELECT p.cid,
                  COALESCE(
                    (SELECT list_transform(
                        list_reduce(g.embs,
                            (x, y) -> list_transform(range(1, {_DIM + 1}), i -> x[i] + y[i])),
                        v -> v / g.n)
                     FROM g{rnd} g WHERE g.cid = p.cid),
                    p.cemb) AS cemb
           FROM {prev} p)"""


# k-means fit CTEs: seeded init (vec_id 8-15), bounded sample (vec_id < 64),
# _IVF_ROUNDS unrolled Lloyd's iterations. The fitted `cents` feed the same
# assignment CTEs as before — the "approximate" index stays an exact,
# hash-checkable function of its inputs because the fit itself is replayed.
_IVF_FIT_CTES = (
    f"""
samp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_IVF_SAMPLE_N}),
c0 AS (SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cemb
       FROM embeddings WHERE vec_id BETWEEN {_IVF_CENTROID_IDS[0]} AND {_IVF_CENTROID_IDS[1]}),"""
    + ",".join(_kmeans_round_sql(f"c{r - 1}" if r > 1 else "c0", r) for r in range(1, _IVF_ROUNDS + 1))
    + f""",
cents AS (SELECT cid, cemb FROM c{_IVF_ROUNDS})"""
)

# Shared oracle CTEs: nearest-centroid assignment of every vector (ties to
# the smaller centroid id) — reused by similarity_ann_ivf (probe lists) and
# dedup_embedding_cosine (blocking key).
_IVF_ASSIGN_CTES = f"""
{_IVF_FIT_CTES},
scored AS (
    SELECT e.vec_id, ct.cid,
           list_aggregate(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(ct.cemb[i] AS DOUBLE)), 'sum')
           / (sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
            * sqrt(list_aggregate(list_transform(ct.cemb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS ccos
    FROM embeddings e CROSS JOIN cents ct
),
rankedc AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS r
            FROM scored),
assigned AS (SELECT vec_id, cid FROM rankedc WHERE r = 1)
"""


def _cosine_py(a: list[float], b_double: list[float]) -> float:
    """Driver-side cosine with the SAME sequential fold order as the SQL
    folds (dot i=1..dim, then each squared norm), so the Python k-means and
    the DuckDB-replayed k-means agree bitwise."""
    import math

    dot = 0.0
    for i in range(len(a)):
        dot += a[i] * b_double[i]
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for x in b_double:
        nb += x * x
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _fit_centroids(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float]]]:
    """Deterministic k-means (Lloyd's) on the driver: seeded init (vec_id
    {_IVF_CENTROID_IDS}), bounded sample (vec_id < {_IVF_SAMPLE_N} — a
    driver collect bounded by construction, the same pattern as the LSH
    literal planes), fixed {_IVF_ROUNDS} rounds. All float arithmetic is
    sequential in vec_id/element order so the DuckDB oracle's unrolled-CTE
    replay (_IVF_FIT_CTES) reproduces the centroids bitwise. At 100 TB the
    sample is a bigger bounded draw and the fit is still driver-side — the
    cluster-scale cost lives in assignment, which stays a per-row
    expression over literal centroids."""
    e = table(spark, sf_dir, "embeddings")
    lo, hi = _IVF_CENTROID_IDS
    sample = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < _IVF_SAMPLE_N).collect()
    }
    cents = [(cid, list(sample[cid])) for cid in range(lo, hi + 1)]
    order = sorted(sample)
    for _ in range(_IVF_ROUNDS):
        members: dict[int, list[list[float]]] = {cid: [] for cid, _ in cents}
        for vid in order:
            emb = sample[vid]
            best_cid, best_cos = None, None
            for cid, cemb in cents:  # ascending cid → ties keep the smaller
                cos = _cosine_py(emb, cemb)
                if best_cos is None or cos > best_cos:
                    best_cid, best_cos = cid, cos
            members[best_cid].append(emb)
        new_cents = []
        for cid, old in cents:
            mem = members[cid]
            if not mem:
                new_cents.append((cid, old))  # empty cluster keeps centroid
                continue
            acc = list(mem[0])  # left fold from the first member, like
            for m in mem[1:]:   # DuckDB's list_reduce
                for i in range(len(acc)):
                    acc[i] = acc[i] + m[i]
            n = len(mem)
            new_cents.append((cid, [v / n for v in acc]))
        cents = new_cents
    return cents


def _ivf_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every vector tagged with its IVF coarse assignment in ONE corpus pass:
    (vec_id, embedding, vnorm, best = argmax-(ccos, -cid) struct, probe2 =
    top-{_IVF_NPROBE} centroid structs). The centroids come from the
    deterministic k-means fit (_fit_centroids) and are embedded as literal
    arrays, so assignment is a pure per-row expression — the corpus never
    shuffles for it."""
    e = table(spark, sf_dir, "embeddings")
    cents = _fit_centroids(spark, sf_dir)
    # driver-side norms, sequential sum — same fold order as the oracle
    import math

    cnorm = {cid: math.sqrt(sum(x * x for x in emb)) for cid, emb in cents}
    v = e.select(
        "vec_id", "embedding", F.sqrt(_sqnorm(F.col("embedding"))).alias("vnorm")
    )
    # per-row argmax over literal centroids: array_max on (ccos, -cid)
    # structs — max cosine, ties to the smaller centroid id
    scored = F.array(
        *[
            F.struct(
                (
                    _dot(F.array(*[F.lit(x) for x in emb]), F.col("embedding"))
                    / (F.col("vnorm") * F.lit(cnorm[cid]))
                ).alias("ccos"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, emb in cents
        ]
    )
    return v.withColumn("best", F.array_max(scored)).withColumn(
        "probe2", F.slice(F.reverse(F.array_sort(scored)), 1, _IVF_NPROBE)
    )


@register(
    "similarity_ann_ivf",
    oracle=f"""
WITH {_IVF_ASSIGN_CTES},
probes AS (SELECT vec_id AS query_id, cid FROM rankedc
           WHERE vec_id < {_N_QUERIES} AND r <= {_IVF_NPROBE}),
cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
         FROM probes p JOIN assigned a ON a.cid = p.cid
         WHERE a.vec_id <> p.query_id),
sims AS (
    SELECT cd.query_id, cd.neighbor_id,
           {_COSINE_ORACLE_EXPR} AS cos
    FROM cand cd
    JOIN embeddings q ON q.vec_id = cd.query_id
    JOIN embeddings c ON c.vec_id = cd.neighbor_id
),
ranked AS (SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           FROM sims)
SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {_TOP_K}
""",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization: 8
    corpus vectors serve as deterministic centroid seeds (at 100 TB these
    come from a k-means fit — the assignment/probe machinery is identical),
    every vector is assigned to its nearest centroid's list in ONE corpus
    pass, and each query probes its {_IVF_NPROBE} nearest lists only.

    The centroids are collected once on the driver (8 rows, bounded by
    construction — the same pattern as the LSH literal planes) and embedded
    as literal arrays, so list assignment is a pure per-row expression:
    the corpus is never shuffled for assignment, and the candidate join is
    an equi-join on the list id (output-sized, like the LSH bucket join).
    DuckDB replays assignment + probe + rank exactly, so this scale path is
    hash-matched, not rows-only."""
    tagged = _ivf_tagged(spark, sf_dir)
    assigned = tagged.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("vnorm").alias("c_norm"),
        (-F.col("best.ncid")).alias("cid"),
    )
    probes = (
        tagged.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("vnorm").alias("q_norm"),
            F.explode(F.col("probe2")).alias("p"),
        )
        .select("query_id", "q_emb", "q_norm", (-F.col("p.ncid")).alias("cid"))
    )
    pairs = (
        F.broadcast(probes)
        .join(assigned, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # cosine BEFORE the distinct (VERDICT r8 #8, the knn-graph
            # fix propagated): the dedup shuffle carries one double per
            # candidate, never two embedding payloads
            (
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos"),
        )
    )
    # union over tables/probes deduped INSIDE the rank window — one
    # shuffle where dropDuplicates + row_number paid two (_ranked_unique)
    return (
        _ranked_unique(pairs)
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "rnk", dround("cos", 6).alias("cosine"))
    )


@register(
    "similarity_pairs_blocked",
    oracle=f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       round(
         list_aggregate(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
         / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
          * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 6) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_aggregate(list_transform(range(1, len(a.embedding) + 1),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
      / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
       * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) >= 0.35
""",
)
def similarity_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs within a blocking key (label): the
    embedding-cosine dedup pattern. Block equi-join bounds the pair count;
    at 100 TB the block key comes from coarse quantization (IVF centroid),
    not a label column."""
    e = table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"), "label", F.col("embedding").alias("emb_a"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("norm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), "label", F.col("embedding").alias("emb_b"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("norm_b"),
    )
    pairs = a.join(b, "label").filter(F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        pairs.select("vec_a", "vec_b", "label", cos.alias("cos"))
        .filter(F.col("cos") >= 0.35)
        .select("vec_a", "vec_b", "label", dround("cos", 6).alias("cosine"))
    )


_EMB_DEDUP_THETA = 0.4


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH {_IVF_ASSIGN_CTES},
pairs AS (
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           {_cos_sql("a", "b")} AS cos
    FROM assigned x JOIN assigned y ON x.cid = y.cid AND x.vec_id < y.vec_id
    JOIN embeddings a ON a.vec_id = x.vec_id
    JOIN embeddings b ON b.vec_id = y.vec_id
),
dups AS (SELECT vec_a, vec_b FROM pairs WHERE cos >= {_EMB_DEDUP_THETA}),
edges AS (SELECT vec_a AS v, vec_b AS nbr FROM dups
          UNION ALL
          SELECT vec_b, vec_a FROM dups)
SELECT e.vec_id,
       least(e.vec_id, coalesce(min(ed.nbr), e.vec_id)) AS canonical_id,
       least(e.vec_id, coalesce(min(ed.nbr), e.vec_id)) <> e.vec_id AS is_dup
FROM embeddings e LEFT JOIN edges ed ON ed.v = e.vec_id
GROUP BY e.vec_id
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup, end to end: IVF coarse assignment
    (one corpus pass, literal centroids) supplies the blocking key, candidate
    pairs form only within a centroid list (equi-join on cid — output-sized,
    never all-pairs), cosine >= {_EMB_DEDUP_THETA} marks a duplicate pair,
    and every vector gets a one-hop verdict: canonical_id = min(self, dup
    neighbors), is_dup when that differs from itself. Transitive closure of
    larger clusters is dedup_cc_canonical's job over these pairs.

    At 100 TB the centroids come from a k-means fit and the cid join is the
    same bounded shape; the verdict is one partial-agg groupBy on vec_id.
    Completes the dedup family (exact / minhash / simhash / ngram /
    embedding-cosine) from the training-data-pipeline spec."""
    # Materialize the slim assignment ONCE: the scoring expression over the
    # literal centroids is large (8 × 64-dim literal arrays), and a raw
    # self-join would compile and evaluate it on BOTH join branches —
    # measured 7× slower. The persist is QUERY-SCOPED (util.scoped_persist:
    # released by the next harness query, so a sweep never accumulates it);
    # at cluster scale this is the materialized assignment table an IVF
    # index maintains anyway.
    from .util import scoped_persist

    slim = scoped_persist(
        _ivf_tagged(spark, sf_dir).select(
            "vec_id",
            (-F.col("best.ncid")).alias("cid"),
            "embedding",
            "vnorm",
        )
    )
    a = slim.select(
        F.col("vec_id").alias("vec_a"),
        "cid",
        F.col("embedding").alias("emb_a"),
        F.col("vnorm").alias("norm_a"),
    )
    b = slim.select(
        F.col("vec_id").alias("vec_b"),
        "cid",
        F.col("embedding").alias("emb_b"),
        F.col("vnorm").alias("norm_b"),
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("norm_a") * F.col("norm_b"))
    dups = (
        a.join(b, "cid")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= _EMB_DEDUP_THETA)
    )
    edges = dups.select(F.col("vec_a").alias("v"), F.col("vec_b").alias("nbr")).unionByName(
        dups.select(F.col("vec_b").alias("v"), F.col("vec_a").alias("nbr"))
    )
    canon = F.least(F.col("vec_id"), F.coalesce(F.min("nbr"), F.col("vec_id")))
    return (
        slim.select("vec_id")
        .join(edges, slim["vec_id"] == edges["v"], "left")
        .groupBy("vec_id")
        .agg(canon.alias("canonical_id"), (canon != F.col("vec_id")).alias("is_dup"))
    )


_SEMDEDUP_TAU = _EMB_DEDUP_THETA  # SemDeDup prune threshold


def _semdedup_oracle() -> str:
    """DuckDB replay of the SemDeDup prune: same 6-plane LSH blocks as
    knn_graph, one-hop greedy keep-lowest-id arbitration, per-source
    accounting over documents (doc_id aligns with vec_id)."""
    buckets = ",\n       ".join(
        f"{_lsh_bucket_sql(tp, 'embedding')} AS b{ti}"
        for ti, tp in enumerate(_knn_planes())
    )
    cand_union = "\n    UNION\n    ".join(
        f"SELECT q2.vec_id AS v, c2.vec_id AS w"
        f" FROM buckets q2 JOIN buckets c2 ON q2.b{t} = c2.b{t}"
        f" WHERE c2.vec_id < q2.vec_id"
        for t in range(_N_TABLES)
    )
    return f"""
WITH buckets AS (
SELECT vec_id, embedding,
       {buckets}
FROM embeddings
),
cand AS (
    {cand_union}
),
dropped AS (
    SELECT DISTINCT cd.v
    FROM cand cd
    JOIN embeddings q ON q.vec_id = cd.v
    JOIN embeddings c ON c.vec_id = cd.w
    WHERE {_COSINE_ORACLE_EXPR} >= {_SEMDEDUP_TAU!r}
)
SELECT d.source,
       count(*) AS n_docs,
       count(dr.v) AS n_dropped,
       count(*) - count(dr.v) AS n_kept,
       round((count(*) - count(dr.v)) * 1.0 / count(*), 4) AS pct_kept
FROM documents d LEFT JOIN dropped dr ON dr.v = d.doc_id
GROUP BY d.source
"""


@register("dedup_semdedup_prune", oracle=_semdedup_oracle())
def dedup_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC corpus prune (Abbas et al. 2023, the
    LLM-curation pass that removes semantically redundant documents
    before training): embeddings block into the knn-graph's 6-plane LSH
    buckets, candidate pairs form only within a (table, bucket) block,
    and a document is PRUNED when a same-block neighbor with a SMALLER
    id is within cosine >= tau — the paper's keep-one-per-duplicate-set
    rule made deterministic (greedy keep-lowest-id, one hop). The
    verdict joins back to `documents` (doc_id aligns with vec_id) for
    the deliverable: per-source retention accounting — how much of each
    source survives semantic dedup at tau.

    Differs from dedup_embedding_cosine (pairwise canonical verdicts)
    by producing the corpus-level PRUNE decision + accounting — what a
    data-mixture owner actually consumes.

    Scale: candidate cost is sum of squared block sizes (never
    corpus-squared); the drop verdict is one distinct over the
    surviving pairs and one broadcast-sized anti-join onto documents;
    at 100 TB the blocks come from the same LSH pass an ANN index
    already maintains."""
    from .util import scoped_persist

    b = scoped_persist(
        _lsh_bucketed(spark, sf_dir, with_norm=True, planes=_knn_planes())
    )
    left = b.select(
        F.col("vec_id").alias("v"),
        F.col("embedding").alias("e1"),
        F.col("nrm").alias("n1"),
        "tbl",
        "bucket",
    )
    right = b.select(
        F.col("vec_id").alias("w"),
        F.col("embedding").alias("e2"),
        F.col("nrm").alias("n2"),
        F.col("tbl").alias("tbl_r"),
        F.col("bucket").alias("bucket_r"),
    )
    dropped = (
        left.join(
            right,
            (F.col("tbl") == F.col("tbl_r"))
            & (F.col("bucket") == F.col("bucket_r")),
        )
        .filter(F.col("w") < F.col("v"))  # keep-lowest-id arbitration
        .select(
            "v",
            (_dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= _SEMDEDUP_TAU)
        .select("v")
        .distinct()
    )
    d = table(spark, sf_dir, "documents")
    # no broadcast hint: the dropped set is duplicate-count-proportional
    # (unbounded at 100 TB) — AQE broadcasts when it fits
    flagged = d.join(
        dropped.withColumnRenamed("v", "doc_id").withColumn(
            "_drop", F.lit(1)
        ),
        "doc_id",
        "left",
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count("_drop").alias("n_dropped"),
        (F.count("*") - F.count("_drop")).alias("n_kept"),
        dround(
            (F.count("*") - F.count("_drop")) / F.count("*"), 4
        ).alias("pct_kept"),
    )


_SQ_RERANK = 2 * _TOP_K  # exact-rerank candidate depth


def _sq_bounds(spark: SparkSession, sf_dir: str):
    """Per-dimension corpus min/max (the SQ8 codebook): ONE parallel
    aggregate over the corpus, 2×64 doubles to the driver. mins/maxes are
    exact float→double widenings in both engines, and scale/step are single
    IEEE divisions of those — so the Spark literals and the oracle's
    recomputed values are the same doubles bit-for-bit."""
    e = table(spark, sf_dir, "embeddings")
    row = e.agg(
        *[F.min(F.element_at("embedding", i).cast("double")).alias(f"mn{i}") for i in range(1, _DIM + 1)],
        *[F.max(F.element_at("embedding", i).cast("double")).alias(f"mx{i}") for i in range(1, _DIM + 1)],
    ).collect()[0]
    mns = [float(row[f"mn{i}"]) for i in range(1, _DIM + 1)]
    mxs = [float(row[f"mx{i}"]) for i in range(1, _DIM + 1)]
    scales = [255.0 / (mx - mn) if mx > mn else 0.0 for mn, mx in zip(mns, mxs)]
    steps = [(mx - mn) / 255.0 for mn, mx in zip(mns, mxs)]
    return mns, scales, steps


@register(
    "similarity_ann_sq8",
    oracle=f"""
WITH b AS (
    SELECT CAST(t.i AS INT) AS i,
           min(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE)) AS mn,
           max(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE)) AS mx
    FROM embeddings e CROSS JOIN range(1, {_DIM + 1}) t(i)
    GROUP BY t.i
),
bounds AS (
    SELECT list(mn ORDER BY i)                                            AS mns,
           list(CASE WHEN mx > mn THEN 255.0 / (mx - mn) ELSE 0.0 END ORDER BY i) AS scales,
           list((mx - mn) / 255.0 ORDER BY i)                             AS steps
    FROM b
),
deq AS (
    SELECT e.vec_id,
           list_transform(range(1, {_DIM + 1}),
             i -> bounds.mns[i]
                  + least(255, greatest(0, CAST(floor(
                        (CAST(e.embedding[i] AS DOUBLE) - bounds.mns[i])
                        * bounds.scales[i] + 0.5) AS BIGINT)))
                    * bounds.steps[i]) AS demb
    FROM embeddings e CROSS JOIN bounds
),
q AS (SELECT vec_id AS query_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS qn
      FROM embeddings WHERE vec_id < {_N_QUERIES}),
dn AS (SELECT vec_id, demb,
             sqrt(list_aggregate(list_transform(demb, x -> x * x), 'sum')) AS cn
      FROM deq),
approx AS (
    SELECT q.query_id, d.vec_id AS neighbor_id,
           list_aggregate(list_transform(range(1, {_DIM + 1}),
               i -> CAST(q.embedding[i] AS DOUBLE) * d.demb[i]), 'sum')
             / (q.qn * d.cn) AS acos_
    FROM q JOIN dn d ON d.vec_id <> q.query_id
),
ar AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY acos_ DESC, neighbor_id) AS arnk
       FROM approx),
cand AS (SELECT query_id, neighbor_id FROM ar WHERE arnk <= {_SQ_RERANK}),
sims AS (
    SELECT c.query_id, c.neighbor_id, {_cos_sql("q", "e")} AS cos
    FROM cand c
    JOIN embeddings q ON q.vec_id = c.query_id
    JOIN embeddings e ON e.vec_id = c.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
    FROM sims
)
SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {_TOP_K}
""",
)
def similarity_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized ANN (FAISS SQ8): each corpus vector is compressed to
    64 uint8 codes via per-dimension linear quantization over global
    min/max; the scan ranks candidates by ASYMMETRIC distance (exact query
    × dequantized corpus — ADC), then the top 2k are reranked with exact
    cosine on the raw vectors and top-k emitted.

    100 TB story: the approx scan touches 1 byte/dim instead of 4 — the
    memory-bandwidth-bound phase shrinks 4× and the full-precision vectors
    are only fetched for the output-sized rerank set. The codebook
    (per-dim min/max) is one parallel aggregate; quantize/dequantize are
    per-row literal-array zips — the corpus never shuffles. Every float op
    (scale, dequant, sequential fold dots) mirrors the oracle's arithmetic
    order, so even the 'approximate' ranks are hash-checked exactly."""
    mns, scales, steps = _sq_bounds(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    lit_mn = F.array(*[F.lit(v) for v in mns])
    lit_scale = F.array(*[F.lit(v) for v in scales])
    lit_step = F.array(*[F.lit(v) for v in steps])
    centered = F.zip_with(F.col("embedding"), lit_mn, lambda x, m: x.cast("double") - m)
    code = F.zip_with(
        centered, lit_scale,
        lambda d, s: F.least(F.lit(255), F.greatest(F.lit(0), F.floor(d * s + F.lit(0.5)))),
    )
    scaled = F.zip_with(code, lit_step, lambda c, s: c * s)
    demb = F.zip_with(scaled, lit_mn, lambda d, m: m + d)
    dn = e.select(
        "vec_id", demb.alias("demb")
    ).select("vec_id", "demb", F.sqrt(_sqnorm(F.col("demb"))).alias("cn"))
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("qn"),
    )
    approx = (
        F.broadcast(q)
        .crossJoin(dn)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("q_emb"), F.col("demb")) / (F.col("qn") * F.col("cn"))).alias("acos_"),
        )
    )
    wa = W.partitionBy("query_id").orderBy(F.col("acos_").desc(), F.col("neighbor_id"))
    cand = (
        approx.withColumn("arnk", F.row_number().over(wa))
        .filter(F.col("arnk") <= _SQ_RERANK)
        .select("query_id", "neighbor_id")
    )
    # exact rerank on the raw vectors — output-sized (queries × 2k rows)
    qraw = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("qn"),
    )
    craw = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("cn2"),
    )
    sims = (
        F.broadcast(cand)
        .join(qraw, "query_id")
        .join(craw, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q_emb"), F.col("c_emb")) / (F.col("qn") * F.col("cn2"))).alias("cos"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "rnk", dround("cos", 6).alias("cosine"))
    )


_MAXSIM_QUERY_LABELS = (0, 1)
_MAXSIM_QUERY_CAP = 32  # bounded query set: MaxSim is a RERANK stage


@register(
    "similarity_maxsim_late_interaction",
    oracle=f"""
WITH q AS (SELECT vec_id, label, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS qn
           FROM embeddings
           WHERE label IN {_MAXSIM_QUERY_LABELS}
             AND vec_id < {_MAXSIM_QUERY_CAP}),
c AS (SELECT vec_id, label, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS cn
      FROM embeddings),
best AS (
    SELECT q.vec_id AS q_id, q.label AS q_label, c.label AS d_label,
           round(max(
             list_aggregate(list_transform(range(1, len(q.embedding) + 1),
                 i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum')
             / (q.qn * c.cn)), 6) AS best_cos
    FROM q JOIN c ON c.vec_id <> q.vec_id
    GROUP BY q.vec_id, q.label, c.label
)
SELECT q_label, d_label,
       round(avg(best_cos), 6) AS maxsim
FROM best GROUP BY q_label, d_label
""",
)
def similarity_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT MaxSim) scoring between vector GROUPS: for
    every query vector, its best cosine within each document group (max
    over the group's vectors, self excluded), then the group-level score is
    the mean of those per-vector maxima — sum-of-max, the late-interaction
    aggregation that single-vector similarity cannot express.

    Shape: a BOUNDED query set (two label groups, vec_id-capped — MaxSim is
    a rerank stage, so its query side is a candidate set by construction,
    never corpus-sized) broadcast against the streamed corpus; the max
    collapses per (query vector, doc group) inside the same shuffle that
    the final mean rides — two partial-agg rollups, corpus never shuffles.
    At scale the corpus side too is an ANN candidate set
    (similarity_ann_*), not the whole table. The per-pair max is rounded
    before the mean on both engines, so the 'approximate' interaction
    scores still hash-match exactly."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(
        F.col("label").isin(*_MAXSIM_QUERY_LABELS)
        & (F.col("vec_id") < _MAXSIM_QUERY_CAP)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("d_id"),
        F.col("label").alias("d_label"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("cn"),
    )
    best = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("d_id") != F.col("q_id"))
        .groupBy("q_id", "q_label", "d_label")
        .agg(
            dround(
                F.max(_dot(F.col("q_emb"), F.col("c_emb")) / (F.col("qn") * F.col("cn"))),
                6,
            ).alias("best_cos")
        )
    )
    return best.groupBy("q_label", "d_label").agg(
        dround(F.avg("best_cos"), 6).alias("maxsim")
    )


# ---------------------------------------------------------------------------
# Product quantization (FAISS PQ): the third classic ANN compression next to
# scalar quantization (similarity_ann_sq8) and coarse inverted lists
# (similarity_ann_ivf). 64 dims split into M subspaces; each subspace gets a
# K-codeword codebook fitted by deterministic L2 k-means on the same bounded
# sample the IVF fit uses; a vector's code is M small integers (M*log2(K)
# bits vs 64*32 bits raw).
_PQ_M = 4
_PQ_SUBDIM = _DIM // _PQ_M
_PQ_K = 4
_PQ_ROUNDS = 2
_PQ_INIT_LO = 8  # codebook init: subvectors of vec_id 8..8+K-1 (seeded)


def _pq_fit_ctes() -> str:
    """Unrolled per-subspace Lloyd's (L2) as DuckDB CTEs — the PQ analog of
    _IVF_FIT_CTES: same bounded sample, same sequential fold orders, so the
    Python fit (_fit_pq) is replayed bitwise."""
    parts = []
    for m in range(_PQ_M):
        off = m * _PQ_SUBDIM
        parts.append(f"""
ps{m} AS (SELECT vec_id, list_transform(range({off + 1}, {off + _PQ_SUBDIM + 1}),
              i -> CAST(embedding[i] AS DOUBLE)) AS sub
          FROM embeddings WHERE vec_id < {_IVF_SAMPLE_N}),
p{m}c0 AS (SELECT vec_id - {_PQ_INIT_LO} AS k, sub AS cw FROM ps{m}
           WHERE vec_id BETWEEN {_PQ_INIT_LO} AND {_PQ_INIT_LO + _PQ_K - 1})""")
        for r in range(1, _PQ_ROUNDS + 1):
            prev = f"p{m}c{r - 1}"
            dist = (
                f"list_aggregate(list_transform(range(1, {_PQ_SUBDIM + 1}),"
                f" i -> (s.sub[i] - c.cw[i]) * (s.sub[i] - c.cw[i])), 'sum')"
            )
            parts.append(f"""
p{m}s{r} AS (SELECT s.vec_id, c.k, {dist} AS dist FROM ps{m} s CROSS JOIN {prev} c),
p{m}r{r} AS (SELECT vec_id, k,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rr
             FROM p{m}s{r}),
p{m}g{r} AS (SELECT r.k, list(s.sub ORDER BY s.vec_id) AS subs, count(*) AS n
             FROM p{m}r{r} r JOIN ps{m} s USING (vec_id) WHERE r.rr = 1 GROUP BY r.k),
p{m}c{r} AS (SELECT p.k,
                    COALESCE(
                      (SELECT list_transform(
                          list_reduce(g.subs,
                              (x, y) -> list_transform(range(1, {_PQ_SUBDIM + 1}), i -> x[i] + y[i])),
                          v -> v / g.n)
                       FROM p{m}g{r} g WHERE g.k = p.k),
                      p.cw) AS cw
             FROM {prev} p)""")
    return ",".join(parts)


def _pq_encode_ctes() -> str:
    """Encode EVERY corpus vector against the fitted codebooks (argmin L2,
    ties to the smaller code) and reconstruct its PQ approximation as the
    concatenation of its chosen codewords."""
    parts = []
    for m in range(_PQ_M):
        off = m * _PQ_SUBDIM
        final = f"p{m}c{_PQ_ROUNDS}"
        dist = (
            f"list_aggregate(list_transform(range(1, {_PQ_SUBDIM + 1}),"
            f" i -> (es.sub[i] - c.cw[i]) * (es.sub[i] - c.cw[i])), 'sum')"
        )
        parts.append(f"""
es{m} AS (SELECT vec_id, list_transform(range({off + 1}, {off + _PQ_SUBDIM + 1}),
              i -> CAST(embedding[i] AS DOUBLE)) AS sub
          FROM embeddings),
ed{m} AS (SELECT es.vec_id, c.cw,
                 row_number() OVER (PARTITION BY es.vec_id ORDER BY {dist}, c.k) AS rr
          FROM es{m} es CROSS JOIN {final} c),
ec{m} AS (SELECT vec_id, cw FROM ed{m} WHERE rr = 1)""")
    concat = " || ".join(f"ec{m}.cw" for m in range(_PQ_M))
    joins = " ".join(f"JOIN ec{m} ON ec{m}.vec_id = e.vec_id" for m in range(_PQ_M))
    parts.append(f"""
recon AS (SELECT e.vec_id, {concat} AS demb FROM embeddings e {joins})""")
    return ",".join(parts)


def _fit_pq(spark: SparkSession, sf_dir: str) -> list[list[list[float]]]:
    """Deterministic per-subspace L2 k-means on the driver (the PQ codebook
    fit): bounded sample (vec_id < {_IVF_SAMPLE_N}), seeded init, fixed
    rounds, sequential arithmetic — replayed bitwise by _pq_fit_ctes().
    Returns books[m][k] = 16-dim codeword. At 100 TB the sample is a bigger
    bounded draw; encoding stays a per-row expression over M*K literal
    codewords, so the corpus never shuffles for the index build."""
    e = table(spark, sf_dir, "embeddings")
    sample = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < _IVF_SAMPLE_N).collect()
    }
    order = sorted(sample)
    books = []
    for m in range(_PQ_M):
        off = m * _PQ_SUBDIM
        subs = {vid: sample[vid][off:off + _PQ_SUBDIM] for vid in order}
        cents = [(k, list(subs[_PQ_INIT_LO + k])) for k in range(_PQ_K)]
        for _ in range(_PQ_ROUNDS):
            members: dict[int, list[list[float]]] = {k: [] for k, _ in cents}
            for vid in order:
                s = subs[vid]
                best_k, best_d = None, None
                for k, cw in cents:  # ascending k → ties keep the smaller
                    d = 0.0
                    for i in range(_PQ_SUBDIM):
                        d += (s[i] - cw[i]) * (s[i] - cw[i])
                    if best_d is None or d < best_d:
                        best_k, best_d = k, d
                members[best_k].append(s)
            new_cents = []
            for k, old in cents:
                mem = members[k]
                if not mem:
                    new_cents.append((k, old))
                    continue
                acc = list(mem[0])  # left fold in vec_id order, like
                for mm in mem[1:]:  # DuckDB's list_reduce
                    for i in range(len(acc)):
                        acc[i] = acc[i] + mm[i]
                new_cents.append((k, [v / len(mem) for v in acc]))
            cents = new_cents
        books.append([cw for _, cw in cents])
    return books


@register(
    "similarity_ann_pq",
    oracle=f"""
WITH {_pq_fit_ctes()},
{_pq_encode_ctes()},
q AS (SELECT vec_id AS query_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS qn
      FROM embeddings WHERE vec_id < {_N_QUERIES}),
dn AS (SELECT vec_id, demb,
              sqrt(list_aggregate(list_transform(demb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS cn
       FROM recon),
approx AS (
    SELECT q.query_id, d.vec_id AS neighbor_id,
           list_aggregate(list_transform(range(1, {_DIM + 1}),
               i -> CAST(q.embedding[i] AS DOUBLE) * CAST(d.demb[i] AS DOUBLE)), 'sum')
             / (q.qn * d.cn) AS acos_
    FROM q JOIN dn d ON d.vec_id <> q.query_id
),
ar AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY acos_ DESC, neighbor_id) AS arnk
       FROM approx),
cand AS (SELECT query_id, neighbor_id FROM ar WHERE arnk <= {_SQ_RERANK}),
sims AS (
    SELECT c.query_id, c.neighbor_id, {_cos_sql("q", "e")} AS cos
    FROM cand c
    JOIN embeddings q ON q.vec_id = c.query_id
    JOIN embeddings e ON e.vec_id = c.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
    FROM sims
)
SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {_TOP_K}
""",
)
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (FAISS PQ): each corpus vector compresses to
    {_PQ_M} sub-codes ({_PQ_M}×log2({_PQ_K}) bits vs {_DIM}×32 raw) against
    per-subspace codebooks fitted by deterministic L2 k-means
    (_fit_pq/_pq_fit_ctes — same bounded-sample/seeded/sequential contract
    as the IVF fit, so the 'approximate' index is hash-checked exactly).
    The scan ranks by asymmetric distance (exact query × PQ-reconstructed
    corpus), redeems the top {_SQ_RERANK} with exact cosine, emits top-k.

    100 TB story: codebooks are M×K literal arrays in the plan — encoding
    and reconstruction are per-row codegen expressions, the corpus never
    shuffles for the index build, and the approx phase reads
    {_PQ_M * 2}B/vector instead of {_DIM * 4}B (a {(_DIM * 4) // (_PQ_M * 2)}×
    bandwidth cut — the reason PQ is the standard billion-vector format).
    Exact vectors are fetched only for the output-sized rerank."""
    books = _fit_pq(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    demb_parts = []
    for m in range(_PQ_M):
        off = m * _PQ_SUBDIM
        sub = F.slice(F.col("embedding"), off + 1, _PQ_SUBDIM)
        structs = []
        for k in range(_PQ_K):
            cw = F.array(*[F.lit(v) for v in books[m][k]])
            d = F.aggregate(
                F.zip_with(
                    sub, cw,
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            structs.append(F.struct(d.alias("d"), F.lit(k).alias("k")))
        best = F.array_min(F.array(*structs))  # min (dist, k): ties → smaller k
        cw_arrays = F.array(
            *[F.array(*[F.lit(v) for v in books[m][k]]) for k in range(_PQ_K)]
        )
        demb_parts.append(F.element_at(cw_arrays, best["k"] + 1))
    demb = F.concat(*demb_parts)
    dn = e.select("vec_id", demb.alias("demb")).select(
        "vec_id", "demb", F.sqrt(_sqnorm(F.col("demb"))).alias("cn")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("qn"),
    )
    approx = (
        F.broadcast(q)
        .crossJoin(dn)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("q_emb"), F.col("demb")) / (F.col("qn") * F.col("cn"))).alias("acos_"),
        )
    )
    wa = W.partitionBy("query_id").orderBy(F.col("acos_").desc(), F.col("neighbor_id"))
    cand = (
        approx.withColumn("arnk", F.row_number().over(wa))
        .filter(F.col("arnk") <= _SQ_RERANK)
        .select("query_id", "neighbor_id")
    )
    qraw = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("qn"),
    )
    craw = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("cn2"),
    )
    sims = (
        F.broadcast(cand)
        .join(qraw, "query_id")
        .join(craw, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q_emb"), F.col("c_emb")) / (F.col("qn") * F.col("cn2"))).alias("cos"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "rnk", dround("cos", 6).alias("cosine"))
    )


_RANGE_TAU = 0.3


@register(
    "similarity_range_search",
    oracle=f"""
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
       round({_COSINE_ORACLE_EXPR}, 6) AS cosine
FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
WHERE q.vec_id < {_N_QUERIES} AND {_COSINE_ORACLE_EXPR} >= {_RANGE_TAU}
""",
)
def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine RANGE search (radius query): every corpus vector within
    similarity >= tau of each query — the other fundamental ANN query shape
    beside top-k (fixed-quality retrieval: "all near-duplicates", "all
    candidates above the rerank floor"), where the result size is
    data-driven, not k-capped.

    Exact baseline plan, same as similarity_topk: broadcast the bounded
    query set, stream the corpus once, norms hoisted to one fold per side.
    No window/rank at all — range search needs no per-query sort, so the
    plan is a pure map-side filter after the broadcast join: ZERO shuffles
    over the corpus. At 100 TB the LSH/IVF bucket routes (previous ops)
    bound the scanned fraction; the threshold comparison itself is
    bitwise-stable because both engines fold the dot product in the same
    sequential order."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("q_norm"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(_sqnorm(F.col("embedding"))).alias("c_norm"),
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm")),
        )
        .filter(F.col("cos") >= _RANGE_TAU)
        .select("query_id", "neighbor_id", "neighbor_label", dround("cos", 6).alias("cosine"))
    )


_KNN_K = 3


def _knn_graph_oracle() -> str:
    """DuckDB replay of the LSH-bucketed kNN graph: EVERY vector is a
    query; candidates are bucket-mates in any of the hash tables (the
    knn-specific 6-plane tables — the oracle replays the same literals)."""
    buckets = ",\n       ".join(
        f"{_lsh_bucket_sql(tp, 'embedding')} AS b{ti}"
        for ti, tp in enumerate(_knn_planes())
    )
    cand_union = "\n    UNION\n    ".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id"
        f" FROM buckets q JOIN buckets c ON q.b{t} = c.b{t}"
        f" WHERE c.vec_id <> q.vec_id"
        for t in range(_N_TABLES)
    )
    return f"""
WITH buckets AS (
SELECT vec_id, embedding,
       {buckets}
FROM embeddings
),
cand AS (
    {cand_union}
),
sims AS (
    SELECT cd.query_id, cd.neighbor_id,
           {_COSINE_ORACLE_EXPR} AS cos
    FROM cand cd
    JOIN embeddings q ON q.vec_id = cd.query_id
    JOIN embeddings c ON c.vec_id = cd.neighbor_id
),
ranked AS (SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           FROM sims)
SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {_KNN_K}
"""


@register("similarity_knn_graph", oracle=_knn_graph_oracle())
def similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN GRAPH over the whole corpus (every vector is a query) — the
    input structure for graph-based dedup clustering, semantic coverage
    maps, and diversity-aware sampling. Candidates come from the same
    3-table random-hyperplane LSH as similarity_ann_lsh: a bucket
    SELF-join on (table, bucket) makes candidate count output-sized —
    sum of squared bucket sizes, never corpus², and exact cosine + per-
    node top-k runs on candidates only.

    Scale: the bucketed corpus is computed once (query-scoped persist —
    both join sides read the hot cache, not two corpus scans); the self-
    join is a hash join on renamed keys (the alias-only self-join
    degenerates to a nested loop — same trap minhash_pairs documents);
    per-node top-k is a window over candidate groups, not a global sort.
    Bucket width (planes/table) is THE skew lever at deployment: more
    planes → smaller buckets → fewer candidate pairs per node — this key
    hashes with 6 planes (64 buckets/table) vs the query keys' 4, cutting
    the candidate cosine cost ~4x (VERDICT r10 #7 profile: the
    interpreted 64-dim cosine fold over candidates dominated)."""
    from .util import scoped_persist

    # norms hoisted into the persisted bucketed frame (one sqrt per corpus
    # row, not two per candidate pair — VERDICT r7 #8)
    b = scoped_persist(
        _lsh_bucketed(spark, sf_dir, with_norm=True, planes=_knn_planes())
    )
    left = b.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "tbl",
        "bucket",
    )
    right = b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
        F.col("tbl").alias("tbl_r"),
        F.col("bucket").alias("bucket_r"),
    )
    # cosine BEFORE the cross-table distinct: the dedup shuffle then
    # carries (id, id, double) instead of two embedding payloads
    sims = (
        left.join(
            right,
            (F.col("tbl") == F.col("tbl_r")) & (F.col("bucket") == F.col("bucket_r")),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm"))
            ).alias("cos"),
        )
    )
    # union over tables deduped INSIDE the rank window (_ranked_unique)
    return (
        _ranked_unique(sims)
        .filter(F.col("rnk") <= _KNN_K)
        .select("query_id", "neighbor_id", "rnk", dround("cos", 6).alias("cosine"))
    )
