"""The north-star showcase: an end-to-end training-data pipeline as ONE
declarative DataFrame program — quality gate → exact dedup → near-dup
removal (MinHash-LSH) → per-language corpus accounting — with the whole
pipeline replayed in SQL as its oracle.

Scale notes (100 TB): each stage is exactly the operator documented in its
home module (text.py / dedup.py); composing them adds no new shuffles beyond
the stages' own — Catalyst pipelines the quality filter into the scan, the
dedup keys reuse one exchange, and the only join is the output-sized LSH
band join. This file is the proof that the pieces compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .dedup import (
    _MH_BANDS_SQL,
    _MH_SIG_SQL,
    _MINHASH_THETA,
    minhash_bands,
    shingle_rows_of,
)
from .util import dround, scoped_persist

_ORACLE = f"""
WITH quality AS (
    SELECT doc_id, lang, text,
           len(string_split(text, ' ')) AS n_words
    FROM documents
    WHERE len(string_split(text, ' ')) >= 20
      AND CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) BETWEEN 3 AND 12
      AND n_chars >= 100
),
exact AS (  -- keep the smallest doc_id per identical text
    SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
),
q2 AS (SELECT q.* FROM quality q JOIN exact e ON q.doc_id = e.doc_id),
d AS (SELECT doc_id, string_split(text,' ') AS w FROM q2),
s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM d WHERE len(w) >= 3),
m AS (SELECT doc_id, sh,
   {_MH_SIG_SQL}
      FROM s),
bands AS (
  {_MH_BANDS_SQL}
),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                                   AND a.doc_id < b.doc_id),
dupes AS (  -- drop the higher doc_id of every verified near-dup pair
    SELECT DISTINCT c.doc_b AS doc_id
    FROM cand c
    JOIN s sa ON sa.doc_id = c.doc_a
    JOIN s sb ON sb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= {_MINHASH_THETA}
),
corpus AS (SELECT * FROM q2 WHERE doc_id NOT IN (SELECT doc_id FROM dupes))
SELECT lang,
       count(*)                         AS n_docs,
       CAST(sum(n_words) AS BIGINT)     AS total_words,
       CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS est_tokens
FROM corpus
GROUP BY lang
"""


@register("pipeline_training_corpus", oracle=_ORACLE)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality gate → exact dedup (content digest) → near-dup
    removal (MinHash-LSH, drop the higher id of each verified pair) →
    per-language corpus size/token accounting."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    quality = d.filter(
        (n_words >= 20)
        & (F.col("n_chars").cast("double") / n_words).between(3, 12)
        & (F.col("n_chars") >= 100)
    ).select("doc_id", "lang", "text", n_words.alias("n_words"))

    # exact dedup: keep min doc_id per content digest
    keep_exact = (
        quality.groupBy(F.md5(F.encode("text", "UTF-8")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # q2 is itself a diamond: it feeds the shingle pipeline AND the final
    # corpus anti-join — without the persist the quality gate + digest
    # dedup (a full-text shuffle) runs twice per action
    from .util import scoped_persist

    q2 = scoped_persist(quality.join(keep_exact, "doc_id"))

    # near-dup removal over the SURVIVING docs only — discarded docs are
    # never tokenized (quality gate runs before the explode). The shingle
    # rows feed the signature agg and both verify-join sides — a diamond
    # Catalyst can't share (util.scoped_persist) — so they carry a
    # query-scoped persist, released by the next harness query.
    rows = scoped_persist(
        shingle_rows_of(q2.withColumn("source", F.lit("")).select("doc_id", "source", "text"))
    )
    bands = scoped_persist(minhash_bands(rows))
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
    from .dedup import _pair_jaccard

    dupes = (
        _pair_jaccard(cand, rows)
        .filter(F.col("j") >= _MINHASH_THETA)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    corpus = q2.join(dupes, "doc_id", "left_anti")

    return corpus.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum(F.ceil(F.length("text") / 4.0)).alias("est_tokens"),
    )


@register(
    "sample_stratified_hash",
    oracle="""
WITH b AS (
    SELECT doc_id, source,
           (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || source), 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || source), 2, 1)) - 1) AS bucket,
           CASE WHEN source LIKE 'src1%' THEN 192 ELSE 64 END AS thresh
    FROM documents
)
SELECT doc_id, source, CAST(bucket AS INTEGER) AS bucket
FROM b WHERE bucket < thresh
""",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the corpus-balancing primitive:
    each document hashes to one of 256 uniform buckets via md5(doc_id|source)
    and survives iff its bucket falls under the stratum's quota (here 192/256
    for the src1* family, 64/256 otherwise — at deployment the quota map
    comes from the mixture spec). Hash-gated sampling is reproducible across
    runs/engines and needs no RNG state, unlike df.sample; the filter is a
    pure expression inside the scan's codegen stage — nothing shuffles, and
    the same row set survives at any parallelism. The DuckDB oracle replays
    the bucket arithmetic exactly."""
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.encode(F.concat_ws("|", F.col("doc_id").cast("string"), "source"), "UTF-8"))
    bucket = F.expr(
        "(instr('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(_h, 2, 1)) - 1)"
    )
    thresh = F.when(F.col("source").startswith("src1"), F.lit(192)).otherwise(F.lit(64))
    return (
        d.withColumn("_h", h)
        .withColumn("bucket", bucket.cast("int"))
        .filter(F.col("bucket") < thresh)
        .select("doc_id", "source", "bucket")
    )


@register(
    "pipeline_corpus_mixture",
    oracle="""
WITH quality AS (
    SELECT doc_id, source, text
    FROM documents
    WHERE len(string_split(text, ' ')) >= 20 AND n_chars >= 100
),
sampled AS (
    SELECT doc_id, source, text,
           (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || source), 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|' || source), 2, 1)) - 1) AS bucket,
           CASE WHEN source LIKE 'src1%' THEN 192 ELSE 64 END AS thresh
    FROM quality
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS est_tokens
FROM sampled WHERE bucket < thresh
GROUP BY source
""",
)
def pipeline_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture building — the OTHER half of corpus construction: quality
    gate → hash-gated stratified sampling (per-source quotas from the
    mixture spec) → per-source document/token accounting. Both stages are
    pure scan-stage expressions, so the whole pipeline is ONE map-only pass
    plus the final small aggregate: at 100 TB this is a single read of the
    corpus, no joins, no wide shuffles."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    quality = d.filter((F.size(words) >= 20) & (F.col("n_chars") >= 100))
    h = F.md5(F.encode(F.concat_ws("|", F.col("doc_id").cast("string"), "source"), "UTF-8"))
    bucket = F.expr(
        "(instr('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(_h, 2, 1)) - 1)"
    )
    thresh = F.when(F.col("source").startswith("src1"), F.lit(192)).otherwise(F.lit(64))
    return (
        quality.withColumn("_h", h)
        .filter(bucket < thresh)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.ceil(F.length("text") / 4.0)).alias("est_tokens"),
        )
    )


_PACK_CAP = 2048  # tokens per packed training sequence


@register(
    "pipeline_pack_sequences",
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
    FROM documents
),
c AS (
    SELECT doc_id, lang, est_tokens,
           COALESCE(sum(est_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM t
)
SELECT doc_id, lang, est_tokens,
       CAST(cum_before // {_PACK_CAP} AS BIGINT)  AS seq_id,
       CAST(cum_before % {_PACK_CAP} AS BIGINT)   AS seq_offset,
       (cum_before % {_PACK_CAP}) + est_tokens > {_PACK_CAP} AS spans_boundary
FROM c
""",
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-then-chunk placement every LLM training
    pipeline runs after dedup/mixing: documents are concatenated in a
    deterministic order within each language stream and chunked into
    fixed-capacity token windows; each doc gets its (sequence id, offset)
    placement plus a flag for docs that straddle a window boundary (the
    rows an attention-mask builder must split).

    The whole operator is ONE window cumsum: partition by the stream key,
    order by doc id, running token total before the current row — all
    integer arithmetic, so placements are bitwise-reproducible on any
    engine (the DuckDB oracle replays them exactly).

    Scale (100 TB): one shuffle on the stream key, then a sort within each
    partition — the same cost as any windowed aggregation; no per-row
    Python, no driver involvement. At deployment the partition key becomes
    (stream, shard) with `shard = hash(doc_id) % K` and sequence ids offset
    by shard base, bounding any one partition's sort to 1/K of the stream
    while keeping placements deterministic; skewed language mixes get K
    proportional to stream size."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    est = F.ceil(F.length("text") / 4.0).cast("bigint")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("est_tokens").over(w), F.lit(0))
    return (
        d.select("doc_id", "lang", est.alias("est_tokens"))
        .withColumn("cum_before", cum_before)
        .select(
            "doc_id",
            "lang",
            "est_tokens",
            (F.col("cum_before") / _PACK_CAP).cast("bigint").alias("seq_id"),
            (F.col("cum_before") % _PACK_CAP).alias("seq_offset"),
            (
                (F.col("cum_before") % _PACK_CAP) + F.col("est_tokens") > _PACK_CAP
            ).alias("spans_boundary"),
        )
    )


@register(
    "pipeline_contamination_check",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM d WHERE len(w) >= 3),
r AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
eval_g  AS (SELECT doc_id, shingle FROM r WHERE doc_id < 50),
train_g AS (SELECT DISTINCT shingle FROM r WHERE doc_id >= 50),
hits AS (
    SELECT e.doc_id, count(*) AS n_overlap
    FROM eval_g e JOIN train_g t USING (shingle)
    GROUP BY e.doc_id
),
tot AS (SELECT doc_id, len(sh) AS n_grams FROM s WHERE doc_id < 50)
SELECT tot.doc_id,
       CAST(tot.n_grams AS BIGINT) AS n_grams,
       CAST(COALESCE(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(CAST(COALESCE(hits.n_overlap, 0) AS DOUBLE) / tot.n_grams, 6)
           AS contamination
FROM tot LEFT JOIN hits USING (doc_id)
ORDER BY doc_id
""",
)
def pipeline_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination — the overlap audit every training corpus
    needs before a benchmark is trusted: for each EVAL document (doc_id <
    50 stands in for the held-out set), the fraction of its word 3-grams
    that also occur anywhere in the TRAINING split. A contaminated eval
    doc scores near 1; documents sharing only stock vocabulary score low.

    Scale (100 TB): both splits shingle through the same codegen'd
    explode+window path (dedup.shingle_rows_of), the train side collapses
    to DISTINCT grams (one hash aggregate), and the containment test is a
    single equi-join on the gram — output bounded by eval grams, never
    train × eval. The eval side is tiny by construction, so at deployment
    it broadcasts and the train scan never shuffles."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    rows = shingle_rows_of(d)
    eval_g = rows.filter(F.col("doc_id") < 50).select("doc_id", "shingle")
    train_g = (
        rows.filter(F.col("doc_id") >= 50).select("shingle").distinct()
    )
    hits = (
        eval_g.join(train_g, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    totals = (
        rows.filter(F.col("doc_id") < 50)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
            dround(
                F.coalesce("n_overlap", F.lit(0)).cast("double") / F.col("n_grams"),
                6,
            ).alias("contamination"),
        )
        .orderBy("doc_id")
    )


_N_SHARDS = 16


@register(
    "pipeline_doc_shard",
    oracle=f"""
WITH sharded AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % {_N_SHARDS} AS shard,
           CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
    FROM documents
)
SELECT CAST(shard AS INT)             AS shard,
       count(*)                       AS n_docs,
       CAST(sum(est_tokens) AS BIGINT) AS total_tokens
FROM sharded GROUP BY shard ORDER BY shard
""",
)
def pipeline_doc_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus sharding — the reproducible train-data split:
    each document routes to shard = md5-prefix(doc_id) mod {_N_SHARDS}, so
    any worker on any engine re-derives the same assignment with no shared
    state (the property that makes distributed tokenization jobs and
    restart-safe dataloaders possible). The digest is uniform, so shard
    token budgets self-balance — the spread shrinks as 1/√(docs per
    shard); at the fixture's ~31 docs/shard the assert bounds it at 3×,
    at production scale it converges to ~1×. One map-only projection +
    one {_N_SHARDS}-group aggregate — nothing shuffles but the final
    tiny rollup."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % F.lit(_N_SHARDS)
        ).cast("int").alias("shard"),
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("est_tokens"),
    )
    out = (
        d.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("est_tokens").alias("total_tokens"),
        )
        .orderBy("shard")
    )
    toks = [r["total_tokens"] for r in out.collect()]
    assert len(toks) == _N_SHARDS and max(toks) < 3 * min(toks), (
        "shard balance collapsed",
        toks,
    )
    return out


_BATCH_SIZE = 16


@register(
    "pipeline_batch_padding",
    oracle=f"""
WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
arrival AS (
    SELECT 'arrival' AS strategy, CAST(doc_id // {_BATCH_SIZE} AS INT) AS batch, n_tok FROM d
),
srt AS (
    SELECT 'length_sorted' AS strategy,
           CAST((row_number() OVER (ORDER BY n_tok, doc_id) - 1) // {_BATCH_SIZE} AS INT) AS batch,
           n_tok
    FROM d
),
u AS (SELECT * FROM arrival UNION ALL SELECT * FROM srt),
b AS (SELECT strategy, batch,
             count(*) AS n_docs, sum(n_tok) AS toks, max(n_tok) AS mx
      FROM u GROUP BY strategy, batch)
SELECT strategy,
       count(*)                                        AS n_batches,
       CAST(sum(toks) AS BIGINT)                       AS total_tokens,
       CAST(sum(n_docs * mx - toks) AS BIGINT)         AS padding_tokens,
       round(CAST(sum(n_docs * mx - toks) AS DOUBLE)
             / sum(n_docs * mx), 6)                    AS waste_frac
FROM b GROUP BY strategy
""",
)
def pipeline_batch_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-padding economics — the dynamic-batching question every
    training/inference pipeline answers: how much compute is padding under
    arrival-order batching vs length-sorted batching (batch={_BATCH_SIZE},
    pad-to-longest). Length bucketing is asserted strictly better mid-flow
    — the measured justification for the sort.

    Shape: token counts are a scan-stage expression; arrival batches need
    no shuffle at all (doc_id div); the sorted strategy is ONE rank window
    (at 100 TB: approximate bucketing by length quantiles — computed from a
    sample — replaces the global rank with a scan-stage bucket expression,
    same accounting)."""
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    arrival = d.select(
        F.lit("arrival").alias("strategy"),
        (F.col("doc_id") / _BATCH_SIZE).cast("int").alias("batch"),
        "n_tok",
    )
    rn = F.row_number().over(W.orderBy("n_tok", "doc_id"))
    srt = d.select(
        F.lit("length_sorted").alias("strategy"),
        ((rn - 1) / _BATCH_SIZE).cast("int").alias("batch"),
        "n_tok",
    )
    b = (
        arrival.unionByName(srt)
        .groupBy("strategy", "batch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("toks"),
            F.max("n_tok").alias("mx"),
        )
    )
    pad = F.sum(F.col("n_docs") * F.col("mx") - F.col("toks"))
    out = b.groupBy("strategy").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        pad.cast("bigint").alias("padding_tokens"),
        dround(pad.cast("double") / F.sum(F.col("n_docs") * F.col("mx")), 6).alias(
            "waste_frac"
        ),
    )
    waste = {r["strategy"]: r["waste_frac"] for r in out.collect()}
    assert waste["length_sorted"] < waste["arrival"], waste
    return out


_INTERLEAVE_N = 200


@register(
    "pipeline_interleave_mixture",
    oracle=f"""
WITH w AS (
  SELECT doc_id, source,
         CASE WHEN source LIKE 'src1%' THEN 3.0 ELSE 1.0 END AS wt,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents
),
pos AS (SELECT doc_id, source, (rk - 0.5) / wt AS p FROM w),
take AS (SELECT doc_id, source,
                row_number() OVER (ORDER BY p, source, doc_id) AS gpos
         FROM pos)
SELECT source, count(*) AS n_taken,
       round(CAST(count(*) AS DOUBLE) / {_INTERLEAVE_N}, 6) AS share
FROM take WHERE gpos <= {_INTERLEAVE_N}
GROUP BY source
""",
)
def pipeline_interleave_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture interleave — stride scheduling, the dataloader
    algorithm that serves sources proportionally to their weights WITHOUT
    randomness: each source's k-th document sits at virtual position
    (k − ½)/weight, and the global training order is positions ascending
    (deterministic tiebreak). The first {_INTERLEAVE_N} positions then hold
    each source in proportion to its weight (src1* at 3×) — asserted
    mid-flow — and any worker can recompute the exact same order.

    Scale: per-source ranks are per-key windows (one shuffle on source);
    the global take-first-N here is a rank window, which at 100 TB becomes
    per-source QUOTAS (n_i = N·w_i/Σw, a driver-side computation) gating
    the per-source ranks — same order, no global sort."""
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("source").startswith("src1"), 3.0).otherwise(1.0).alias("wt"),
    )
    rk = F.row_number().over(W.partitionBy("source").orderBy("doc_id"))
    pos = d.select("doc_id", "source", ((rk - 0.5) / F.col("wt")).alias("p"))
    gpos = F.row_number().over(W.orderBy("p", "source", "doc_id"))
    out = (
        pos.withColumn("gpos", gpos)
        .filter(F.col("gpos") <= _INTERLEAVE_N)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_taken"),
            dround(F.count(F.lit(1)).cast("double") / _INTERLEAVE_N, 6).alias("share"),
        )
    )
    shares = {r["source"]: r["n_taken"] for r in out.collect()}
    heavy = sum(v for s, v in shares.items() if s.startswith("src1"))
    assert heavy > _INTERLEAVE_N // 2, shares  # 3x sources dominate the mix
    return out


_SHUFFLE_SEED = "42"


@register(
    "pipeline_global_shuffle",
    oracle=f"""
WITH keyed AS (
    SELECT doc_id, md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS skey
    FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY skey, doc_id) AS BIGINT) AS position,
       doc_id
FROM keyed
""",
)
def pipeline_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle — the reproducible training-order
    primitive: every epoch's example order is ORDER BY md5(seed:doc_id), so
    any worker (or any engine — the digest is cross-engine) re-derives the
    identical permutation with no shared RNG state, and changing the seed
    string re-shuffles the whole corpus.

    Scale (100 TB): the naive plan is a global-window row_number — a
    single-partition sort that dies at scale. This implements the two-phase
    global-index pattern instead: range-exchange on the shuffle key (the
    only full-data shuffle, and it is the sort Spark would need anyway),
    per-partition local row_number, then add per-partition offsets computed
    from an O(partitions)-row driver-side count — position = offset +
    local rank. The plan's widest window is partitioned by partition id,
    never ONE global partition."""
    from pyspark.sql.window import Window as W

    n_parts = 8
    keyed = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit(_SHUFFLE_SEED + ":"), F.col("doc_id").cast("string"))).alias("skey"),
    )
    ranged = keyed.repartitionByRange(n_parts, "skey", "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = scoped_persist(ranged)
    # O(partitions) rows to the driver: cumulative offsets per range slice
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]),
        F.col("_pid"),
    )
    local = F.row_number().over(W.partitionBy("_pid").orderBy("skey", "doc_id"))
    return ranged.select(
        (off_expr + local).cast("bigint").alias("position"), "doc_id"
    )


_SYS_SAMPLE_N = 64  # target draws per epoch


@register(
    "sample_tokens_systematic",
    oracle=f"""
WITH w AS (
    SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
    FROM documents
),
c AS (
    SELECT doc_id, est_tokens,
           CAST(sum(est_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
    FROM w
),
tot AS (SELECT CAST(sum(est_tokens) AS BIGINT) // {_SYS_SAMPLE_N} AS stride FROM c)
SELECT c.doc_id, c.est_tokens, c.cum
FROM c CROSS JOIN tot
WHERE ((c.cum - 1 - stride // 2 + stride) // stride)
    > ((c.cum - c.est_tokens - 1 - stride // 2 + stride) // stride)
ORDER BY c.doc_id
""",
)
def sample_tokens_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-proportional systematic sampling — the deterministic
    probability-proportional-to-size draw a mixture builder uses to pick
    ~{_SYS_SAMPLE_N} documents with selection probability proportional to
    their token count, with NO RNG state and exact integer arithmetic (so
    any engine re-derives the same draw): lay documents on a token number
    line (cumulative token sums in doc_id order), drop equally-spaced
    pointers stride = total/{_SYS_SAMPLE_N} apart, select the document each
    pointer lands in. Long docs can win multiple pointers but appear once.

    Scale (100 TB): the cumulative sum is the global_shuffle two-phase
    pattern — range-exchange on doc_id, per-partition integer cumsum, an
    O(partitions)-row offset map added back — never a single-partition
    window; integer sums are exact under any partitioning, which is WHY the
    weight is token count, not a float score. The pointer test is a pure
    per-row expression."""
    from pyspark.sql.window import Window as W

    n_parts = 8
    w = table(spark, sf_dir, "documents").select(
        "doc_id", F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("est_tokens")
    )
    ranged = w.repartitionByRange(n_parts, "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = scoped_persist(ranged)
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum("est_tokens").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    total, stride = acc, acc // _SYS_SAMPLE_N
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]),
        F.col("_pid"),
    )
    local_cum = F.sum("est_tokens").over(
        W.partitionBy("_pid").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    )
    c = ranged.select(
        "doc_id", "est_tokens", (off_expr + local_cum).alias("cum")
    )
    # non-negative numerators (cum >= 0 ⇒ cum-1-half+stride > 0), so
    # truncating integer DIV equals floor division on BOTH engines — the
    # pointer test never touches float arithmetic
    half = stride // 2
    hit = F.expr(
        f"(cum - 1 - {half} + {stride}) DIV {stride}"
        f" > (cum - est_tokens - 1 - {half} + {stride}) DIV {stride}"
    )
    out = c.filter(hit).orderBy("doc_id")
    n = out.count()
    assert abs(n - _SYS_SAMPLE_N) <= 2, n  # systematic draw lands on target
    return out


@register(
    "pipeline_epoch_resample",
    # factor per source in integer QUARTERS (src<i> → (2 + 3·(i%4))/4 =
    # 0.5/1.25/2.0/2.75 epochs): full copies = q // 4, fractional copy
    # gated on an md5 bucket < (q % 4)·64 of 256 — all-integer arithmetic
    # both engines replay bit-for-bit (no RNG, no floats).
    oracle="""
WITH f AS (
    SELECT doc_id, source,
           2 + (CAST(substr(source, 4, 10) AS INTEGER) % 4) * 3 AS q,
           (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|epoch'), 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || '|epoch'), 2, 1)) - 1) AS bucket
    FROM documents
),
n AS (
    SELECT doc_id, source,
           q // 4 + CASE WHEN bucket < (q % 4) * 64 THEN 1 ELSE 0 END AS n_copies
    FROM f
)
SELECT doc_id, source, CAST(u.copy_idx AS INTEGER) AS copy_idx
FROM n, LATERAL unnest(generate_series(1, n_copies)) AS u(copy_idx)
WHERE n_copies >= 1
""",
)
def pipeline_epoch_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional epoch weighting — the training-mixture primitive that
    repeats high-value sources >1 epoch and subsamples low-value ones <1
    (e.g. books 2.75 epochs, raw web 0.5): every document expands to
    ``floor(factor)`` full copies plus one more iff its deterministic md5
    bucket falls under the fractional remainder — so a 2.75-epoch source
    emits each doc 2 or 3 times, converging to exactly 2.75x in
    expectation with zero RNG state, reproducible across engines, runs,
    and partitionings (df.sample could guarantee none of these).

    Scale: one map-only pass — the copy count is a pure integer
    expression inside the scan's codegen stage and the expansion is an
    explode of a <=4-element sequence; no shuffle, no skew (copies of a
    doc stay in its input partition), output size = sum of factors. The
    copy_idx column is what downstream global-shuffle keys on so epochs
    interleave instead of repeating back-to-back."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    q = F.lit(2) + (F.substring("source", 4, 10).cast("int") % 4) * F.lit(3)
    h = F.md5(F.encode(F.concat(F.col("doc_id").cast("string"), F.lit("|epoch")), "UTF-8"))
    bucket = F.expr(
        "(instr('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(_h, 2, 1)) - 1)"
    )
    n_copies = (q / F.lit(4)).cast("int") + F.when(
        F.col("_bucket") < (q % 4) * F.lit(64), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        d.withColumn("_h", h)
        .withColumn("_bucket", bucket)
        .withColumn("_n", n_copies)
        .filter(F.col("_n") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("copy_idx"),
        )
    )


@register(
    "pipeline_train_val_split",
    oracle="""
WITH b AS (
    SELECT text,
           (instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS bucket
    FROM documents
),
sp AS (
    SELECT text,
           CASE WHEN bucket < 204 THEN 'train'
                WHEN bucket < 230 THEN 'val'
                ELSE 'test' END AS split
    FROM b
)
SELECT split,
       CAST(count(*) AS BIGINT)                              AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT)             AS n_unique_texts,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT)     AS n_tokens
FROM sp GROUP BY split ORDER BY split
""",
)
def pipeline_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CONTENT-KEYED train/val/test split — the assignment
    every training pipeline needs before anything else: each document
    hashes by md5(text) into 256 uniform buckets, buckets <204 train
    (~80%), <230 val (~10%), rest test. Keying the split on CONTENT
    rather than doc_id guarantees exact duplicates land in the same
    split — the no-leakage property (a test pins it) that id-keyed or
    RNG splits silently violate and that contaminates eval sets; it is
    also reproducible across runs, engines, and repartitionings, unlike
    df.randomSplit. Returns per-split document / unique-text / token
    accounting.

    Scale (100 TB): the bucket is a pure scan-stage expression (no RNG
    state, no shuffle to assign); the accounting is one partial-agg
    groupBy on a 3-value key. The same bucket arithmetic the stratified
    sampler uses (sample_stratified_hash) — split + sample compose on
    one hash pass."""
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.encode("text", "UTF-8"))
    bucket = F.expr(
        "(instr('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(_h, 2, 1)) - 1)"
    )
    split = (
        F.when(F.col("_bucket") < 204, "train")
        .when(F.col("_bucket") < 230, "val")
        .otherwise("test")
    )
    return (
        d.withColumn("_h", h)
        .withColumn("_bucket", bucket)
        .withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("_h").cast("bigint").alias("n_unique_texts"),
            F.sum(F.size(F.split("text", " ", -1))).cast("bigint").alias("n_tokens"),
        )
        .orderBy("split")
    )


@register(
    "pipeline_quality_tiered_sample",
    oracle="""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
freq AS (
    SELECT w,
           CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM words) AS p
    FROM words GROUP BY w
),
score AS (
    SELECT doc_id, round(avg(-ln(f.p)), 6) AS s
    FROM words x JOIN freq f ON x.w = f.w GROUP BY doc_id
),
tiered AS (
    SELECT d.lang, d.text,
           CAST(ntile(4) OVER (
               PARTITION BY d.lang ORDER BY s.s, d.doc_id
           ) AS INTEGER) AS tier
    FROM documents d JOIN score s ON d.doc_id = s.doc_id
),
gated AS (
    SELECT lang, tier,
           len(string_split(text, ' ')) AS n_words,
           (instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1)
             AS bucket,
           CASE tier WHEN 1 THEN 256 WHEN 2 THEN 128
                     WHEN 3 THEN 64 ELSE 26 END AS cap
    FROM tiered
)
SELECT lang, tier,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN bucket < cap THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN bucket < cap THEN n_words ELSE 0 END) AS BIGINT)
         AS n_tokens_kept
FROM gated GROUP BY lang, tier
""",
)
def pipeline_quality_tiered_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-TIERED corpus curation — the DCLM/CCNet recipe: score every
    document with the corpus-internal unigram LM proxy
    (text_unigram_logprob_score), NTILE it into per-language quality
    quartiles (ties broken by doc_id so the tiering is deterministic
    across engines and partitionings), then keep a DECREASING fraction
    per tier (100/50/25/~10%) through the content-keyed md5 bucket gate —
    zero RNG state, the same reproducible-sampling arithmetic the
    train/val split and stratified sampler use. Returns per-(lang, tier)
    doc/kept/token accounting — the curation report a data team reads
    before committing the mixture.

    Scale (100 TB): the score is the unigram diamond (vocabulary-sized
    broadcast, one doc_id rollup); the ntile is one window per language
    partition over doc-count rows (scores, not text, flow through it);
    the gate is a scan-stage expression. No shuffle carries document
    text except the final bounded accounting."""
    from pyspark.sql import Window

    from .text import _words
    from .util import gated_broadcast

    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(_words()).alias("w"))
    total = words.count()
    freq = words.groupBy("w").agg(
        (F.count(F.lit(1)).cast("double") / F.lit(total)).alias("p")
    )
    score = (
        words.join(gated_broadcast(freq), "w")
        .groupBy("doc_id")
        .agg(dround(F.avg(-F.log("p")), 6).alias("s"))
    )
    # the ntile window sees SLIM (doc_id, lang, s) rows only — document
    # text joins back AFTER the tier is assigned, so no text bytes flow
    # through the per-language window shuffle
    tiers = d.select("doc_id", "lang").join(score, "doc_id").select(
        "doc_id",
        F.ntile(4)
        .over(Window.partitionBy("lang").orderBy("s", "doc_id"))
        .alias("tier"),
    )
    h = F.md5(F.encode("text", "UTF-8"))
    bucket = F.expr(
        "(instr('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(_h, 2, 1)) - 1)"
    )
    cap = (
        F.when(F.col("tier") == 1, 256)
        .when(F.col("tier") == 2, 128)
        .when(F.col("tier") == 3, 64)
        .otherwise(26)
    )
    kept = (F.col("_bucket") < F.col("_cap")).cast("int")
    return (
        d.join(tiers, "doc_id")
        .withColumn("_h", h)
        .withColumn("_bucket", bucket)
        .withColumn("_cap", cap)
        .withColumn("_kept", kept)
        .groupBy("lang", "tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_kept").cast("bigint").alias("n_kept"),
            F.sum(
                F.col("_kept") * F.size(F.split("text", " ", -1))
            ).cast("bigint").alias("n_tokens_kept"),
        )
    )


@register(
    "pipeline_mixture_temperature",
    oracle="""
WITH counts AS (
    SELECT source, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY source
),
tot AS (
    SELECT list_reduce(list_sort(list(sqrt(CAST(c AS DOUBLE)))),
                       (a, b) -> a + b)      AS tot,
           CAST(sum(c) AS DOUBLE)            AS n
    FROM counts
),
thr AS (
    SELECT source, c,
           CAST(floor(256 * least(
             1.0,
             (sqrt(CAST(c AS DOUBLE)) / (SELECT tot FROM tot))
               * ((SELECT n FROM tot) * 0.5) / c
           )) AS INTEGER) AS thresh
    FROM counts
),
gated AS (
    SELECT d.source, t.c, t.thresh,
           (instr('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '|' || d.source), 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '|' || d.source), 2, 1)) - 1) AS bucket
    FROM documents d JOIN thr t USING (source)
)
SELECT source,
       CAST(max(c) AS BIGINT)                               AS n_docs,
       CAST(max(thresh) AS BIGINT)                          AS thresh,
       CAST(sum(CASE WHEN bucket < thresh THEN 1 ELSE 0 END) AS BIGINT)
                                                            AS n_kept
FROM gated GROUP BY source ORDER BY source
""",
)
def pipeline_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-scaled mixture reweighting — the multilingual/multi-
    source sampling rule (α-scaling, as in XLM-R / mC4: q_s ∝ c_s^α with
    α=0.5) that up-samples small sources and down-samples dominant ones
    when drawing a target-size corpus (here half the total): per-source
    keep-probabilities become 256-bucket md5 thresholds, so the draw is
    the same deterministic hash gate the stratified sampler uses — no RNG
    state, identical survivors at any parallelism.

    Cross-engine FP discipline: Σ√c over sources must be bit-identical on
    both engines, and plain aggregate sums are NOT (reorder); the total is
    a left fold over the SORTED array of √c values (collect_list →
    array_sort → aggregate vs list → list_sort → list_reduce) — an
    identical FP op sequence on both engines, with no single-partition
    window — then every derived threshold is floor(256·q) of identical
    doubles (sqrt is IEEE correctly-rounded).

    Scale: counts are one partial agg; the sorted fold and the threshold
    table are SOURCES-sized (the mixture spec, not the data) and
    broadcast; the gate is a scan-stage expression."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = counts.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.sqrt(F.col("c").cast("double")))),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("tot"),
        F.sum("c").cast("double").alias("n"),
    )
    thr = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "thresh",
            F.floor(
                256
                * F.least(
                    F.lit(1.0),
                    (F.sqrt(F.col("c").cast("double")) / F.col("tot"))
                    * (F.col("n") * 0.5)
                    / F.col("c"),
                )
            ).cast("int"),
        )
        .select("source", "c", "thresh")
    )
    h = F.md5(
        F.encode(F.concat_ws("|", F.col("doc_id").cast("string"), "source"), "UTF-8")
    )
    bucket = F.expr(
        "(instr('0123456789abcdef', substring(_h, 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(_h, 2, 1)) - 1)"
    )
    gated = (
        d.withColumn("_h", h)
        .withColumn("bucket", bucket)
        .join(F.broadcast(thr), "source")
    )
    return (
        gated.groupBy("source")
        .agg(
            F.max("c").cast("bigint").alias("n_docs"),
            F.max("thresh").cast("bigint").alias("thresh"),
            F.sum(F.when(F.col("bucket") < F.col("thresh"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("source")
    )
