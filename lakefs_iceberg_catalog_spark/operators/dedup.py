"""Ring C — deduplication family over `documents` (BASELINE.json
north-star): exact, MinHash+LSH near-dup, n-gram Jaccard, SimHash.

Hashing is md5 everywhere a value must be identical in Spark and DuckDB —
both engines hash the UTF-8 bytes, so signatures/band keys agree
bit-for-bit and the oracle can replay the whole pipeline in SQL.

Scale notes (100 TB):
- dedup_exact: one hash-shuffle on the content digest; partial agg collapses
  per-partition duplicates before the exchange.
- MinHash-LSH: the ONLY join is on (band, band_key) — docs that share no
  band never meet, so candidate generation is output-sized, not O(n²).
  Band keys are md5-uniform → no skew. k/b/r are constants; signature
  computation is per-row higher-order array ops, no shuffle.
- n-gram Jaccard is the verify step and the same-source variant shows the
  blocked-all-pairs pattern with a document-frequency cap bounding hot-
  shingle fanout; at 100 TB you ONLY run it on LSH candidates.
- SimHash: pure codegen'd expression pipeline (md5 bits + majority vote via
  partial aggregation); Hamming-neighbor lookup joins on rotated key
  prefixes (not included — bucket join shown by the LSH operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .util import defer_release, dround, gated_broadcast, pin, scoped_persist

_SHINGLE_N = 3
_SEEDS = list(range(8))       # 8 minhash permutations
_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]  # 4 bands × 2 rows
_MINHASH_THETA = 0.5
_SAME_SOURCE_THETA = 0.3

# Universal-hash minhash permutations: h_s(x) = (a_s·x + b_s) mod p over a
# 32-bit digest prefix x, p the smallest prime > 2³². ONE md5 per shingle
# (the digest prefix), then 8 integer maps — versus 8 md5s of seed-prefixed
# strings: measured ~13× less whole-stage-codegen JIT on the signature
# aggregate (7.7 s → well under 1 s first-run at sf0.1) and cheaper
# steady-state (long-min beats 32-char-string-min). a_s < 2³⁰ keeps
# a_s·x < 2⁶² — no int64 overflow, so DuckDB BIGINT arithmetic replays the
# signatures bit-for-bit (`CAST('0x…' AS BIGINT)` parses the same prefix).
_MH_P = 4294967311
_MH_COEF = [
    (541, 7), (1223, 131), (2741, 1031), (5077, 8191),
    (7919, 65537), (104729, 524287), (224737, 6700417),
    (350377, 2147483647),
]


def minhash_bands(rows: DataFrame) -> DataFrame:
    """(doc_id, band, key) LSH band rows from distinct shingle rows: digest
    each shingle ONCE, min-aggregate the 8 integer permutations per doc,
    explode band structs (never a per-band union re-deriving signatures).
    Shared by the dedup keys and the training-corpus pipeline."""
    x = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    with_x = rows.select("doc_id", x.alias("x"))
    m = with_x.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(_MH_P)).alias(f"h{s}")
            for s, (a, b) in zip(_SEEDS, _MH_COEF)
        ]
    )
    return m.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws("_", f"h{a}", f"h{b}").alias("key"),
                    )
                    for bi, (a, b) in enumerate(_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _mh_hash_sql(var: str, seed: int) -> str:
    """DuckDB replay of permutation `seed` applied to shingle expr `var`."""
    a, b = _MH_COEF[seed]
    return (
        f"({a} * CAST(('0x' || substr(md5({var}), 1, 8)) AS BIGINT) + {b})"
        f" % {_MH_P}"
    )


# m/bands CTE bodies shared by every minhash oracle (dedup + pipeline)
_MH_SIG_SQL = ",\n   ".join(
    f"list_min(list_transform(sh, t -> {_mh_hash_sql('t', s)})) AS h{s}"
    for s in _SEEDS
)
_MH_BANDS_SQL = "\n  UNION ALL ".join(
    f"SELECT doc_id, {bi} AS band, "
    f"CAST(h{a} AS VARCHAR) || '_' || CAST(h{b} AS VARCHAR) AS key FROM m"
    for bi, (a, b) in enumerate(_BANDS)
)


def shingle_rows_of(docs: DataFrame) -> DataFrame:
    """(doc_id, source, shingle) distinct word-3-gram rows for an arbitrary
    documents-shaped DataFrame (doc_id, source, text).

    Exploded-row form rather than per-doc arrays: Spark's higher-order array
    lambdas (transform/aggregate) are interpreted, not codegen'd — building
    shingles via posexplode + lead windows keeps the whole pipeline inside
    WholeStageCodegen, and at 100 TB rows shuffle/spill incrementally where
    giant array cells do not. Callers that filter docs (quality gates)
    should filter BEFORE this call so discarded docs are never tokenized."""
    spark = docs.sparkSession
    # local testdata is one parquet file → one input partition; spread the
    # work. On a real corpus the scan yields many splits already.
    d = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    tok = d.select("doc_id", "source", F.posexplode(F.split("text", " ")).alias("pos", "w0"))
    from pyspark.sql.window import Window as W

    w = W.partitionBy("doc_id").orderBy("pos")
    return (
        tok.withColumn("w1", F.lead("w0", 1).over(w))
        .withColumn("w2", F.lead("w0", 2).over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "source", F.concat_ws(" ", "w0", "w1", "w2").alias("shingle"))
        .distinct()
    )


def _shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingle_rows_of(table(spark, sf_dir, "documents").select("doc_id", "source", "text"))


def _pair_jaccard(cand: DataFrame, rows: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs via a shingle-level
    join: |A∩B| = matched shingle rows per pair, sizes from per-doc counts.
    Pairs with empty intersection drop out of the join — they have J=0 and
    are below any threshold by construction.

    The candidate side is BROADCAST into both shingle joins: cand is the
    output-sized product of LSH blocking (pairs that share a band — bounded
    by the near-dup rate, never O(n²)), while the probe side is corpus-sized
    shingle rows. Left to AQE the joins planned as sort-merge, shuffling
    260k shingle rows twice (measured 5.9× slower at sf0.1). If a corpus's
    candidate set ever outgrows broadcast (≫10⁷ pairs), drop the hint and
    pre-restrict `rows` with a semi-join on the candidate doc ids instead —
    the pair join then shuffles only candidate docs' shingles."""
    cand = F.broadcast(cand)
    cnt = rows.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ra = rows.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    rb = rows.select(F.col("doc_id").alias("doc_b_r"), F.col("shingle").alias("sh_b"))
    inter = (
        cand.join(ra, "doc_a")
        .join(rb, (F.col("doc_b") == F.col("doc_b_r")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"),
        )
    )


_ORACLE_SHINGLES = f"""
d AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
s AS (SELECT doc_id, source,
             list_distinct(list_transform(range(1, len(w) - {_SHINGLE_N - 2}),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM d WHERE len(w) >= {_SHINGLE_N})
"""


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text)   AS text_hash,
       min(doc_id) AS keep_doc_id,
       count(*)    AS n_copies
FROM documents
GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the content digest: keep the smallest doc_id per hash.
    (`dropDuplicates` keeps an arbitrary row — the groupBy form is the
    deterministic, oracle-checkable variant of the same single shuffle.)"""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.encode("text", "UTF-8")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


_MINHASH_ORACLE_CTES = f"""{_ORACLE_SHINGLES},
m AS (SELECT doc_id, sh,
   {_MH_SIG_SQL}
      FROM s),
bands AS (
  {_MH_BANDS_SQL}
),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                                   AND a.doc_id < b.doc_id),
v AS (SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS j
      FROM cand c
      JOIN s sa ON sa.doc_id = c.doc_a
      JOIN s sb ON sb.doc_id = c.doc_b)"""


@register(
    "dedup_near_minhash",
    oracle=f"""
WITH {_MINHASH_ORACLE_CTES}
SELECT doc_a, doc_b, round(j, 6) AS jaccard
FROM v WHERE j >= {_MINHASH_THETA}
""",
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: MinHash signatures over word-3-gram shingles →
    banded LSH (4 bands × 2 rows) → candidate pairs from band-key collisions
    → exact Jaccard verification ≥ θ.

    Deterministic permutations: universal hashes (a_s·x + b_s) mod p over a
    32-bit md5 prefix of each shingle (_MH_COEF literals) — engine-
    independent integer arithmetic both engines replay bit-for-bit, no
    fitted model (unlike MLlib's MinHashLSH whose random coefficients the
    oracle could not replay), and one digest per shingle instead of one per
    (shingle, seed)."""
    return minhash_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", dround("j", 6).alias("jaccard")
    )


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs (doc_a, doc_b, j ≥ θ) — the LSH pipeline
    shared by the pair key and the connected-components canonicalizer.

    The shingle rows feed the signature aggregation AND both sides of the
    verify join — a diamond Catalyst cannot share (column pruning
    specializes each branch's copy, so ReuseExchange never fires; see
    util.scoped_persist). They are persisted with QUERY-SCOPED lifetime:
    the returned plan is lazy and reads the hot cache, and the next query
    through any harness entry point releases it — bounded sweep storage
    without round 3's materialize-on-every-call checkpoint tax."""
    rows = scoped_persist(_shingle_rows(spark, sf_dir))
    # signatures + band rows: one digest per shingle, integer permutation
    # mins, band-struct explode (minhash_bands)
    bands = scoped_persist(minhash_bands(rows))
    # Self-join with RENAMED right side: alias-only self-joins can resolve
    # both sides to the same attribute ids, silently dropping the equality
    # conjuncts and degenerating to a nested-loop cross join (measured 213s
    # vs <1s at sf0.1). Disjoint column names force the hash join on
    # (band, key).
    right = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_r"), F.col("key").alias("key_r")
    )
    cand = (
        bands.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("key") == F.col("key_r"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    return _pair_jaccard(cand, rows).filter(F.col("j") >= _MINHASH_THETA)


@register(
    "dedup_cc_canonical",
    oracle=f"""
WITH RECURSIVE {_MINHASH_ORACLE_CTES},
pairs AS (SELECT doc_a, doc_b FROM v WHERE j >= {_MINHASH_THETA}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b, doc_a FROM pairs),
reach(node, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(label) AS canonical_id
FROM reach GROUP BY node
""",
)
def dedup_cc_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup endgame: collapse the near-dup PAIR graph into clusters and
    elect one canonical document per cluster (the smallest doc_id in each
    connected component; singletons are their own canonical). Pairs come
    from the LSH pipeline (dedup_near_minhash); a training-corpus build
    keeps exactly the rows where doc_id = canonical_id.

    Distributed min-label propagation: every doc starts labeled with its
    own id; each round, labels flow across edges and every node keeps the
    minimum seen. Rounds needed = graph diameter (near-dup clusters are
    tiny, so 2-3 in practice; hard cap asserts convergence). Each round is
    one hash-join + one partial-agg groupBy — the same alternating pattern
    GraphFrames' connectedComponents runs at cluster scale; the driver only
    sees a per-round convergence counter, never row data. The DuckDB oracle
    replays the components with a recursive CTE, so the iterative operator
    is still hash-checked."""
    # The pair set is re-read every propagation round, so this is the one
    # dedup entry point where cutting lineage pays: pin it ONCE (reliable
    # checkpoint when SPARK_GRAFT_CHECKPOINT_DIR points at shared storage —
    # the cluster-mode path — else localCheckpoint) instead of re-running
    # the whole LSH pipeline per round.
    pairs = pin(minhash_pairs(spark, sf_dir).select("doc_a", "doc_b"))
    docs = table(spark, sf_dir, "documents").select("doc_id")
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).persist()
    # Iterate ONLY over nodes that appear in at least one edge: a doc with
    # no near-dup pair is a fixed point (its own canonical) and never
    # changes, and near-dup graphs are sparse — at corpus scale the
    # edge-touched set is a small fraction of the corpus, so every round's
    # shuffle moves |touched| rows, not |corpus|. Singletons rejoin at the
    # end via a left join + coalesce.
    touched = edges.select(F.col("src").alias("doc_id")).distinct()
    labels = touched.select("doc_id", F.col("doc_id").alias("label")).persist()
    # Label generations stay cached until the harness releases the query's
    # scope: unpersisting round r's labels while round r+1's cache entry
    # depends on it can drop the dependent entry (Spark re-compiles
    # dependent InMemoryRelations on uncache), forcing a rounds-deep
    # recompute. Storage held is O(rounds × touched) label rows — tiny.
    generations: list[DataFrame] = [labels]
    for _ in range(20):
        # One shuffle per round: the node's OWN row carries its previous
        # label in `old` (exactly one non-null per doc, so max() recovers
        # it), neighbor rows carry null — the same min-label groupBy then
        # yields BOTH the new label and the convergence signal, replacing
        # the old new-vs-old equi-join (a second full shuffle of the label
        # set per round) with a filter over the already-persisted result.
        nbr = edges.join(
            labels.select(F.col("doc_id").alias("src"), "label"), "src"
        ).select(
            F.col("dst").alias("doc_id"),
            "label",
            F.lit(None).cast("bigint").alias("old"),
        )
        cur = labels.select("doc_id", "label", F.col("label").alias("old"))
        merged = (
            cur.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
            .persist()
        )
        changed = merged.filter(F.col("label") < F.col("old")).count()
        labels = merged
        generations.append(merged)
        if changed == 0:
            break
    else:
        raise RuntimeError("connected components did not converge in 20 rounds")
    final = pin(
        docs.join(labels.select("doc_id", "label"), "doc_id", "left").select(
            "doc_id",
            F.coalesce("label", "doc_id").alias("canonical_id"),
        )
    )
    # final is lineage-CUT (pin = checkpoint), so it no longer references
    # any of the iteration's caches — every intermediate (label
    # generations, edges, the pinned pair set) plus final itself is
    # registered for release at the next harness query; release_scoped
    # frees checkpoint block storage through the LogicalRDD (plain
    # unpersist is a no-op on checkpointed frames).
    for h in (*generations, edges, pairs):
        defer_release(h)
    return defer_release(final)


_NGRAM_DF_CAP = 16


def ngram_kept_rows(rows: DataFrame, df_cap: int | None) -> DataFrame:
    """Drop shingles whose document frequency within a `source` block exceeds
    df_cap — the standard df-cut that keeps blocked n-gram Jaccard safe at
    scale: a shingle shared by k docs of one block yields C(k,2) join rows,
    so one hot boilerplate shingle in a big block is quadratic.

    The HOT set (df > cap) is computed with a partial-aggregating groupBy
    and anti-joined back as a broadcast: hot shingles are by definition the
    boilerplate tail, orders of magnitude smaller than the kept rows, so
    the anti-join probe is a map-side hash lookup — no shuffle of the
    shingle rows and no sort. The previous window-count formulation
    (count OVER (PARTITION BY source, shingle)) shared the pair join's
    exchange but buffered every one-row group in the window operator's
    spillable array — measured 1.52 s vs 0.74 s noop for this stage at
    sf0.1, and at 100 TB it sorts the full corpus-sized shingle set.
    gated_broadcast fails closed if a pathological corpus ever produces a
    hot set above the broadcast gate (AQE then picks the join). Null-safe
    keys keep the exotic NULL-source block semantics identical to the
    window form (NULLs group together). Callers that consume ``rows``
    once should persist it (both df-cut sides read it)."""
    if df_cap is None:
        return rows
    hot = (
        rows.groupBy("source", "shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select(F.col("source").alias("source_h"), F.col("shingle").alias("shingle_h"))
    )
    return rows.join(
        gated_broadcast(hot),
        (F.col("source").eqNullSafe(F.col("source_h")))
        & (F.col("shingle").eqNullSafe(F.col("shingle_h"))),
        "left_anti",
    )


def ngram_pairs(kept: DataFrame) -> DataFrame:
    """Candidate pairs + intersection sizes from the (source, shingle) join.
    One join does both candidate generation AND |A∩B|: docs sharing ≥1 kept
    shingle within the source block meet on (source, shingle), and the
    per-pair row count IS the intersection size. Zero-overlap pairs have
    J=0 < θ and are correctly absent; the all-pairs cross product never
    materializes."""
    ra = kept.select(F.col("doc_id").alias("doc_a"), "source", F.col("shingle").alias("sh_a"))
    rb = kept.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("source_r"), F.col("shingle").alias("sh_b")
    )
    return (
        ra.join(
            rb,
            (F.col("source") == F.col("source_r"))
            & (F.col("sh_a") == F.col("sh_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b", "source")
        .agg(F.count(F.lit(1)).alias("i"))
    )


def ngram_jaccard_of(docs: DataFrame, theta: float, df_cap: int | None) -> DataFrame:
    """Blocked exact n-gram Jaccard over a documents-shaped DataFrame; the
    Jaccard universe is the df-capped shingle set (denominators count kept
    shingles only, mirrored exactly by the DuckDB oracle).

    The kept-shingle subtree feeds the pair join (both sides) and the
    per-doc counts — the same unshareable diamond as minhash_pairs, so it
    gets the same query-scoped persist (see util.scoped_persist); the raw
    shingle rows feed both sides of the df-cut (hot-set aggregate + anti-
    join probe), so they are persisted too. The returned plan stays lazy."""
    kept = scoped_persist(ngram_kept_rows(scoped_persist(shingle_rows_of(docs)), df_cap))
    inter = ngram_pairs(kept)
    cnt = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "source",
            (F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"),
        )
        .filter(F.col("j") >= theta)
        .select("doc_a", "doc_b", "source", dround("j", 6).alias("jaccard"))
    )
    return out


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_ORACLE_SHINGLES},
r AS (SELECT doc_id, source, unnest(sh) AS shingle FROM s),
kept AS (SELECT doc_id, source, shingle FROM r
         QUALIFY count(*) OVER (PARTITION BY source, shingle) <= {_NGRAM_DF_CAP}),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source AS source, count(*) AS i
      FROM kept a JOIN kept b ON a.source = b.source AND a.shingle = b.shingle
                              AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3),
p AS (SELECT i.doc_a, i.doc_b, i.source,
             CAST(i.i AS DOUBLE) / (ca.n_sh + cb.n_sh - i.i) AS j
      FROM i JOIN cnt ca ON ca.doc_id = i.doc_a
             JOIN cnt cb ON cb.doc_id = i.doc_b)
SELECT doc_a, doc_b, source, round(j, 6) AS jaccard
FROM p WHERE j >= {_SAME_SOURCE_THETA}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard within a blocking key (same `source`): the
    blocked-all-pairs pattern, made scale-safe by a document-frequency cap —
    shingles appearing in more than {_NGRAM_DF_CAP} docs of a block are
    boilerplate and are dropped BEFORE the pair join, bounding the per-
    shingle fanout at C(cap,2). The block join is an equi-join on
    (source, shingle); at 100 TB the remaining knob is block size (or route
    through LSH candidates — previous op). The hot-shingle quadratic
    blow-up this prevents is regression-tested in tests/test_ringc.py."""
    return ngram_jaccard_of(
        table(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        _SAME_SOURCE_THETA,
        _NGRAM_DF_CAP,
    )


# Per-(token, bit) vote: hex digit (bit div 4) of the token hash, bit
# (3 - bit%4) within the nibble — i.e. bit index counted MSB-first over the
# first 8 md5 bytes, exactly the layout of numpy unpackbits on digest[:8].
# Bit 0 (the sign bit of a 64-bit value) is dropped to stay in signed-long
# range; positions 1..63 contribute 2^(63-bit).
_SIMHASH_VOTE = (
    "2 * (shiftright(instr('0123456789abcdef', substring(hx, cast(bit div 4 as int) + 1, 1)) - 1,"
    " cast(3 - bit % 4 as int)) & 1) - 1"
)


_SIMHASH_ORACLE_CTES = """
t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT doc_id, substr(md5(tok), 1, 16) AS hx FROM t),
b AS (SELECT doc_id, hx, bit FROM h CROSS JOIN (SELECT unnest(range(1, 64)) AS bit) bits),
v AS (SELECT doc_id, bit,
         SUM(2 * (((instr('0123456789abcdef', substr(hx, CAST(bit // 4 AS INTEGER) + 1, 1)) - 1)
                   >> CAST(3 - bit % 4 AS INTEGER)) & 1) - 1) AS votes
      FROM b GROUP BY doc_id, bit),
sim AS (SELECT doc_id,
               CAST(SUM(CASE WHEN votes > 0
                             THEN CAST(1 AS BIGINT) << CAST(63 - bit AS INTEGER)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM v GROUP BY doc_id)
"""


def simhash_of(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) for a (doc_id, text) DataFrame — the JVM pipeline
    shared by the per-doc key and the Hamming-pair operator."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    hx = toks.select("doc_id", F.substring(F.md5(F.col("tok").cast("binary")), 1, 16).alias("hx"))
    bits = hx.select(
        "doc_id", "hx", F.explode(F.sequence(F.lit(1), F.lit(63))).alias("bit")
    )
    votes = bits.groupBy("doc_id", "bit").agg(
        F.sum(F.expr(_SIMHASH_VOTE)).alias("votes")
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("votes") > 0,
                F.expr("shiftleft(cast(1 as bigint), cast(63 - bit as int))"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("simhash")
    )


@register(
    "dedup_simhash",
    oracle=f"""
WITH {_SIMHASH_ORACLE_CTES}
SELECT doc_id, simhash FROM sim
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: per-token md5-derived 64-bit hashes,
    bitwise majority vote over token occurrences. Near-dups = small Hamming
    distance; pairing rides dedup_simhash_pairs (next op).

    Fully JVM-side (no Python in the hot path): posexplode tokens → built-in
    md5 → per-bit extraction from the hex digits via integer shifts → votes
    summed by (doc, bit) with map-side partial aggregation → the final
    per-doc fold packs majority bits back into one long. Every expression is
    whole-stage-codegen'd; the 63× bit fanout collapses in the partial agg
    before any shuffle, so the exchange carries ≤ 63 rows per document.
    DuckDB replays the identical arithmetic, so the key is hash-matched
    (it was rows-only while the hashing lived in a Python loop)."""
    return simhash_of(table(spark, sf_dir, "documents").select("doc_id", "text"))


_HAM_T = 3
_SIMHASH_BANDS = 4  # 4 × 16-bit chunks: pigeonhole-complete for hamming <= 3


@register(
    "dedup_simhash_pairs",
    oracle=f"""
WITH {_SIMHASH_ORACLE_CTES},
bands AS (SELECT doc_id, simhash, band, (simhash >> CAST(band * 16 AS INTEGER)) & 65535 AS key
          FROM sim CROSS JOIN (SELECT unnest(range(0, {_SIMHASH_BANDS})) AS band) b),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                         b.doc_id AS doc_b, b.simhash AS sh_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                                   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {_HAM_T}
""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS: band each 64-bit signature into 4 × 16-bit
    chunks; two signatures within Hamming distance {_HAM_T} must agree on at
    least one whole chunk (pigeonhole: 3 differing bits cannot touch all 4
    chunks), so the chunk equi-join finds every such pair with NO all-pairs
    product — the same output-sized-join property as the MinHash band join.
    Verification is one codegen'd xor + bit_count on the candidates.

    At 100 TB the join is a hash join on (band, key); band keys inherit
    md5 uniformity from the signature bits, so no skew. Raising the radius
    means more/narrower bands (b bands guarantee hamming < b), not a wider
    scan."""
    # the signature pipeline (tokenize → md5 → 63-bit fanout → two
    # aggregation levels) feeds BOTH sides of the band self-join — the
    # same unshareable diamond as minhash_pairs, so the per-doc signature
    # frame (1 row/doc) gets the query-scoped persist; without it the
    # whole simhash computation ran twice per action (measured 3.8 s →
    # 1.6 s steady at sf0.1)
    sim = scoped_persist(
        simhash_of(table(spark, sf_dir, "documents").select("doc_id", "text"))
    )
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BANDS - 1))).alias("band"),
    ).withColumn("key", F.expr("shiftright(simhash, cast(band * 16 as int)) & 65535"))
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
        F.col("band").alias("band_r"),
        F.col("key").alias("key_r"),
    )
    cand = (
        bands.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("key") == F.col("key_r"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "doc_b", "sh_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("cast(bit_count(sh_a ^ sh_b) as int)"))
        .filter(F.col("hamming") <= _HAM_T)
        .select("doc_a", "doc_b", "hamming")
    )


@register(
    "dedup_repeated_spans",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, len(w) AS n_words, i AS pos, w[i] || ' ' || w[i+1] AS gram
      FROM d, unnest(range(1, len(w))) t(i) WHERE len(w) >= 2),
r AS (SELECT doc_id, n_words, pos, gram,
             row_number() OVER (PARTITION BY doc_id, gram ORDER BY pos) AS rn
      FROM g)
SELECT doc_id,
       CAST(max(n_words) AS BIGINT)                        AS n_words,
       count(*)                                            AS n_grams,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
       round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6)                                AS repeat_frac
FROM r GROUP BY doc_id
""",
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-span detection — the repetition-REMOVAL stage
    of a training pipeline (cut re-pasted boilerplate inside one document,
    as opposed to text_repetition_signals which only scores it): every
    bigram occurrence after a gram's first is a span duplicate; the per-doc
    report (gram count, duplicate count, duplicate fraction) is what the
    cleaner acts on — dropping position rn>1 spans reconstructs the
    deduplicated text.

    Shape: explode to word rows, lead-window bigrams, rank occurrences per
    (doc, gram) by position, one per-doc rollup. Both windows and the
    rollup key on doc_id — per-document parallel at 100 TB, no cross-doc
    shuffle at all."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w0")
    )
    from pyspark.sql.window import Window as W

    worder = W.partitionBy("doc_id").orderBy("pos")
    grams = (
        d.withColumn("n_words", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
        .withColumn("w1", F.lead("w0", 1).over(worder))
        .filter(F.col("w1").isNotNull())
        .select("doc_id", "n_words", "pos", F.concat_ws(" ", "w0", "w1").alias("gram"))
    )
    ranked = grams.withColumn(
        "rn", F.row_number().over(W.partitionBy("doc_id", "gram").orderBy("pos"))
    )
    rep = F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
    return ranked.groupBy("doc_id").agg(
        F.max("n_words").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).alias("n_grams"),
        rep.cast("bigint").alias("n_repeated"),
        dround(rep.cast("double") / F.count(F.lit(1)), 6).alias("repeat_frac"),
    )


@register(
    "dedup_cross_source",
    oracle=f"""
WITH {_MINHASH_ORACLE_CTES}
SELECT v.doc_a, v.doc_b, sa.source AS source_a, sb.source AS source_b,
       round(v.j, 6) AS jaccard
FROM v
JOIN s sa ON sa.doc_id = v.doc_a
JOIN s sb ON sb.doc_id = v.doc_b
WHERE v.j >= {_MINHASH_THETA} AND sa.source <> sb.source
""",
)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-dup detection — the crawl-merge question: which
    near-duplicate pairs span DIFFERENT sources (the ones a multi-crawl
    union must arbitrate, vs within-source dups a single crawl's own dedup
    already handles). Reuses the full MinHash-LSH pipeline; the source
    attribution joins the (doc_id, source) map onto the output-sized
    verified pairs — broadcast while the map's size estimate stays under
    gated_broadcast's limit (it is doc-cardinality, so at 100 TB the gate
    drops the hint and the planner instead broadcasts the SMALL pairs
    side at runtime via AQE)."""
    pairs = minhash_pairs(spark, sf_dir)
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"))
    return (
        pairs.join(gated_broadcast(sa), "doc_a")
        .join(gated_broadcast(sb), "doc_b")
        .filter(F.col("source_a") != F.col("source_b"))
        .select("doc_a", "doc_b", "source_a", "source_b", dround("j", 6).alias("jaccard"))
    )


_SPAN_WORDS = 8   # span width (words)
_SPAN_STRIDE = 4  # stride between span starts


@register(
    "dedup_shared_spans_cross",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (
    SELECT doc_id,
           array_to_string(w[p:p + {_SPAN_WORDS - 1}], ' ') AS span
    FROM d, unnest(range(1, len(w) - {_SPAN_WORDS - 2}, {_SPAN_STRIDE})) t(p)
    WHERE len(w) >= {_SPAN_WORDS}
),
df AS (SELECT span, count(DISTINCT doc_id) AS ndocs FROM s GROUP BY span)
SELECT s.doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       round(CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS shared_frac
FROM s JOIN df USING (span)
GROUP BY s.doc_id
""",
)
def dedup_shared_spans_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document exact-span duplication — the fixed-window
    approximation of suffix-array substring dedup (the 'Deduplicating
    Training Data Makes Language Models Better' recipe): strided
    {_SPAN_WORDS}-word spans per document, a span is 'shared' when it
    appears verbatim in ≥2 documents, and each document reports its shared
    fraction — the signal the cleaner cuts spans (or whole documents) on.
    Complements dedup_repeated_spans (intra-doc) and dedup_near_minhash
    (whole-doc near-dup).

    Scale: there is NO pair join anywhere — span sharing needs only a
    per-span distinct-doc count (one shuffle on the span key, partial
    aggs) joined back to the span rows on the same key (same
    partitioning, no second exchange), then a per-doc rollup. Hot
    boilerplate spans cost their row count, never a C(n,2) fanout — the
    trap the pairwise formulations hit."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    spans = (
        d.filter(F.size("w") >= _SPAN_WORDS)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(w) - {_SPAN_WORDS}, {_SPAN_STRIDE}),"
                    f" p -> array_join(slice(w, p + 1, {_SPAN_WORDS}), ' '))"
                )
            ).alias("span"),
        )
    )
    from .util import scoped_persist

    spans = scoped_persist(spans)  # feeds the doc-frequency agg AND the join
    span_df = spans.groupBy("span").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    shared = F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
    return (
        spans.join(span_df, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            shared.cast("bigint").alias("n_shared"),
            dround(shared.cast("double") / F.count(F.lit(1)), 6).alias("shared_frac"),
        )
    )


_CONTAINMENT_THETA = 0.8


@register(
    "dedup_containment",
    oracle=f"""
WITH {_ORACLE_SHINGLES},
r AS (SELECT doc_id, source, unnest(sh) AS shingle FROM s),
kept AS (SELECT doc_id, source, shingle FROM r
         QUALIFY count(*) OVER (PARTITION BY source, shingle) <= {_NGRAM_DF_CAP}),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source AS source, count(*) AS i
      FROM kept a JOIN kept b ON a.source = b.source AND a.shingle = b.shingle
                              AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3),
dirs AS (
  SELECT i.doc_a AS doc_sub, i.doc_b AS doc_super, i.source,
         CAST(i.i AS DOUBLE) / ca.n_sh AS c
  FROM i JOIN cnt ca ON ca.doc_id = i.doc_a
  UNION ALL
  SELECT i.doc_b, i.doc_a, i.source, CAST(i.i AS DOUBLE) / cb.n_sh
  FROM i JOIN cnt cb ON cb.doc_id = i.doc_b)
SELECT doc_sub, doc_super, source, round(c, 6) AS containment
FROM dirs WHERE c >= {_CONTAINMENT_THETA}
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram CONTAINMENT within a source block: C(A→B) =
    |sh(A) ∩ sh(B)| / |sh(A)| — the asymmetric companion to Jaccard that
    catches a short document swallowed whole by a longer one (quote
    aggregation, boilerplate wrapping, prompt-in-completion leaks), where
    Jaccard stays low because the union is dominated by the big doc. The
    standard training-data decontamination measure (Broder's containment,
    the basis of "13-gram overlap" eval-leak checks).

    Scale shape: identical to dedup_ngram_jaccard — ONE (source, shingle)
    equi-join under the df-cap bound produces intersections; both directed
    containments come from the same intersection row joined to the two
    per-doc counts, so asymmetry costs a union of two projections, not a
    second pair join."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    kept = scoped_persist(
        ngram_kept_rows(scoped_persist(shingle_rows_of(docs)), _NGRAM_DF_CAP)
    )
    inter = ngram_pairs(kept)
    cnt = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    joined = scoped_persist(inter.join(ca, "doc_a").join(cb, "doc_b"))
    fwd = joined.select(
        F.col("doc_a").alias("doc_sub"),
        F.col("doc_b").alias("doc_super"),
        "source",
        (F.col("i").cast("double") / F.col("na")).alias("c"),
    )
    bwd = joined.select(
        F.col("doc_b").alias("doc_sub"),
        F.col("doc_a").alias("doc_super"),
        "source",
        (F.col("i").cast("double") / F.col("nb")).alias("c"),
    )
    return (
        fwd.unionAll(bwd)
        .filter(F.col("c") >= _CONTAINMENT_THETA)
        .select("doc_sub", "doc_super", "source", dround("c", 6).alias("containment"))
    )


@register(
    "dedup_novelty_score",
    oracle=f"""
WITH {_ORACLE_SHINGLES},
r AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM r GROUP BY shingle)
SELECT r.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = r.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN f.first_doc = r.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty
FROM r JOIN firsts f ON f.shingle = r.shingle
GROUP BY r.doc_id
""",
)
def dedup_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle NOVELTY in corpus order: the fraction of a
    doc's 3-gram shingles whose FIRST corpus occurrence (min doc_id) is the
    doc itself — the streaming-ingestion dedup measure ("how much of this
    crawl snapshot is new text?") and the memorization-risk score training
    curricula sort by (a 0.0-novelty doc is pure re-crawl; dedup_exact
    can't see it unless it's byte-identical, Jaccard only pairs it with ONE
    other doc — novelty charges it against the whole corpus at once).

    Scale shape: the first-occurrence table is ONE partial-aggregable
    min() groupBy on shingle; the ownership check joins the shingle rows
    back on the SAME shingle key, so the exchange is shared/co-partitioned,
    then one doc-keyed rollup. Nothing is pairwise — cost is linear in
    total shingles regardless of how duplicated the corpus is. In a true
    streaming setting min(doc_id) becomes min(ingest_seq) and the firsts
    table is the persistent state."""
    # the shingle rows feed the firsts aggregate AND the ownership join
    # probe — the exchanges hash the same key but Catalyst cannot share
    # them (the subtrees differ after column pruning), so without a
    # persist the explode+window shingle pass ran twice per action
    rows = scoped_persist(
        shingle_rows_of(
            table(spark, sf_dir, "documents").select("doc_id", "source", "text")
        ).select("doc_id", "shingle")
    )
    firsts = rows.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    owned = rows.join(firsts, "shingle")
    return (
        owned.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            dround(F.col("n_novel").cast("double") / F.col("n_shingles"), 6).alias("novelty"),
        )
    )


@register(
    "dedup_scrub_repeated_chunks",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents
),
c AS (
  SELECT doc_id, i AS cid,
         array_to_string(w[(i*3)+1:(i*3)+3], ' ') AS chunk
  FROM d, unnest(range(0, CAST(ceil(len(w) / 3.0) AS BIGINT))) t(i)
),
f AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM c GROUP BY chunk)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT)                                   AS n_chunks,
       CAST(sum(CASE WHEN f.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       md5(coalesce(string_agg(CASE WHEN f.df < 3 THEN c.chunk END,
                               ' ' ORDER BY c.cid), ''))          AS cleaned_md5,
       CAST(length(coalesce(string_agg(CASE WHEN f.df < 3 THEN c.chunk END,
                                       ' ' ORDER BY c.cid), '')) AS BIGINT)
                                                                  AS cleaned_len
FROM c JOIN f USING (chunk)
GROUP BY c.doc_id
""",
)
def dedup_scrub_repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-chunk SCRUB with document reassembly — the
    CCNet/FineWeb 'line-level dedup' stage: split every document into
    consecutive 3-word chunks, count each chunk's document frequency across
    the corpus, drop chunks appearing in ≥3 distinct documents (boilerplate
    by definition), and REBUILD each document from its surviving chunks in
    order. Unlike dedup_repeated_spans (intra-doc repetition report), this
    is the cross-doc removal op: the output is the cleaned corpus (here
    md5+length of the rebuilt text, driver-canonicalizable).

    Shape (100 TB): chunking is a map-side explode (≤1 chunk row per 3
    words); document frequency is ONE shuffle keyed on the chunk; the
    frequency join returns on the same chunk-hash partitioning (no extra
    exchange); reassembly is one per-doc shuffle whose state is bounded by
    document length. No pair joins, nothing driver-side, and every stage
    keys on either the chunk or the doc — both well-distributed."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    n_chunks = F.greatest(
        F.ceil(F.size("w") / F.lit(3.0)).cast("int"), F.lit(1)
    )
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice("w", i * 3 + 1, 3), " "),
            )
        ).alias("cid", "chunk"),
    )
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("df")
    )
    j = chunks.join(freq, "chunk")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("df") >= 3).cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("df") < 3, F.struct("cid", "chunk"))
                        )
                    ),
                    lambda x: x["chunk"],
                ),
                " ",
            ).alias("_cleaned"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dropped",
            F.md5("_cleaned").alias("cleaned_md5"),
            F.length("_cleaned").cast("long").alias("cleaned_len"),
        )
    )


@register(
    "dedup_cluster_representative",
    oracle=f"""
WITH RECURSIVE {_MINHASH_ORACLE_CTES},
pairs AS (SELECT doc_a, doc_b FROM v WHERE j >= {_MINHASH_THETA}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b, doc_a FROM pairs),
reach(node, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
),
labels AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
j AS (
    SELECT l.cluster_id, d.doc_id, d.n_chars
    FROM labels l JOIN documents d ON d.doc_id = l.doc_id
),
ranked AS (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM j
),
agg AS (
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_chars) AS BIGINT) AS rep_chars
    FROM j GROUP BY cluster_id
)
SELECT a.cluster_id, r.doc_id AS rep_doc_id, a.n_docs, a.rep_chars
FROM agg a JOIN ranked r ON r.cluster_id = a.cluster_id AND r.rn = 1
""",
)
def dedup_cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster REPRESENTATIVE election — the step after canonicalization a
    corpus build actually keeps: within each near-dup connected component,
    keep the doc with the MOST content (max n_chars, ties to the smallest
    doc_id), not the arbitrary min-id canonical — near-dup clusters often
    mix truncated and full versions of a page, and min-id keeps a random
    one. Output is one row per cluster: (cluster_id, rep_doc_id, n_docs,
    rep_chars); singletons elect themselves.

    Scale: reuses dedup_cc_canonical's min-label propagation (hash joins +
    partial-agg rounds, diameter-bounded) for the cluster ids, then ONE
    groupBy with min_by over a (neg chars, id) struct — max-content
    tie-broken election in a single shuffle, no window over a global sort.
    (min_by plans as SortAggregate with a partial phase — same contract
    as the other tie-broken first/last aggregates, see test_plans.)"""
    labels = dedup_cc_canonical(spark, sf_dir)  # (doc_id, canonical_id)
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = labels.join(docs, "doc_id")
    return (
        j.groupBy(F.col("canonical_id").alias("cluster_id"))
        .agg(
            F.min_by(
                "doc_id", F.struct((-F.col("n_chars")).alias("neg"), F.col("doc_id"))
            ).alias("rep_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max("n_chars").cast("bigint").alias("rep_chars"),
        )
        .select("cluster_id", "rep_doc_id", "n_docs", "rep_chars")
    )
