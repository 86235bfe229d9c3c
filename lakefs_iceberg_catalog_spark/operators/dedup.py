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
  blocked-all-pairs pattern; at 100 TB you ONLY run it on LSH candidates.
- SimHash: per-row Arrow-batched pandas computation + sort on the 64-bit
  key; Hamming-neighbor lookup joins on rotated key prefixes (not included —
  bucket join shown by the LSH operator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .util import dround

_SHINGLE_N = 3
_SEEDS = list(range(8))       # 8 minhash permutations
_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]  # 4 bands × 2 rows
_MINHASH_THETA = 0.5
_SAME_SOURCE_THETA = 0.3


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
    are below any threshold by construction."""
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


@register(
    "dedup_near_minhash",
    oracle=f"""
WITH {_ORACLE_SHINGLES},
m AS (SELECT doc_id, sh,
   {",".join(f"list_min(list_transform(sh, x -> md5('{s}|' || x))) AS h{s}" for s in _SEEDS)}
      FROM s),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {bi} AS band, h{a} || h{b} AS key FROM m" for bi, (a, b) in enumerate(_BANDS))}
),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                                   AND a.doc_id < b.doc_id),
v AS (SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS j
      FROM cand c
      JOIN s sa ON sa.doc_id = c.doc_a
      JOIN s sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, round(j, 6) AS jaccard
FROM v WHERE j >= {_MINHASH_THETA}
""",
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: MinHash signatures over word-3-gram shingles →
    banded LSH (4 bands × 2 rows) → candidate pairs from band-key collisions
    → exact Jaccard verification ≥ θ.

    Deterministic permutations: minhash_s = min over shingles of
    md5("s|" + shingle) — lexicographic min of a uniform hash is a valid
    permutation-min, is engine-independent, and needs no fitted model
    (unlike MLlib's MinHashLSH whose random coefficients the oracle could
    not replay)."""
    # The shingle rows feed the signature aggregation AND both sides of the
    # verify join — persist once or Spark recomputes the tokenize+distinct
    # pipeline per branch. At cluster scale this is persist(MEMORY_AND_DISK)
    # of a shingles table.
    rows = _shingle_rows(spark, sf_dir).persist()
    # signatures: one codegen'd pass over the rows (md5 × seeds), partial
    # min-agg before the per-doc shuffle
    m = rows.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{seed}|"), F.col("shingle")))).alias(f"h{seed}")
            for seed in _SEEDS
        ]
    )
    # one pass: explode the band structs instead of a 4-way union (which
    # would re-derive the signatures per branch)
    bands = m.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"), F.concat(f"h{a}", f"h{b}").alias("key")
                    )
                    for bi, (a, b) in enumerate(_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")).persist()
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
    return (
        _pair_jaccard(cand, rows)
        .filter(F.col("j") >= _MINHASH_THETA)
        .select("doc_a", "doc_b", dround("j", 6).alias("jaccard"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_ORACLE_SHINGLES},
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source AS source,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
      FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, source, round(j, 6) AS jaccard
FROM p WHERE j >= {_SAME_SOURCE_THETA}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard within a blocking key (same `source`): the
    blocked-all-pairs pattern. The block join is an equi-join on source (one
    shuffle); pair count is Σ C(block,2), which is why at 100 TB the block
    must stay bounded (or be replaced by LSH candidates — previous op)."""
    rows = _shingle_rows(spark, sf_dir).persist()
    # One join does both candidate generation AND |A∩B|: docs sharing ≥1
    # shingle within the source block meet on (source, shingle), and the
    # per-pair row count IS the intersection size. Zero-overlap pairs have
    # J=0 < θ and are correctly absent; the all-pairs cross product never
    # materializes.
    ra = rows.select(F.col("doc_id").alias("doc_a"), "source", F.col("shingle").alias("sh_a"))
    rb = rows.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("source_r"), F.col("shingle").alias("sh_b")
    )
    inter = (
        ra.join(
            rb,
            (F.col("source") == F.col("source_r"))
            & (F.col("sh_a") == F.col("sh_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b", "source")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    cnt = rows.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "source",
            (F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))).alias("j"),
        )
        .filter(F.col("j") >= _SAME_SOURCE_THETA)
        .select("doc_a", "doc_b", "source", dround("j", 6).alias("jaccard"))
    )


@register("dedup_simhash")  # bit-level hash construction — no SQL oracle (rows-only)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: per-token md5-derived 64-bit hashes,
    bitwise majority vote over tokens. Near-dups = small Hamming distance.

    Implemented in mapInPandas (Arrow batches): the bit-matrix majority is a
    numpy popcount-style operation with no built-in Spark form. Deterministic
    (md5 → fixed bits), asserted in tests/test_ringc.py; pairing/bucketing at
    scale reuses the LSH band-join shown in dedup_near_minhash.
    """
    import hashlib

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def simhash_batches(batches):
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                toks = text.split(" ") if text else []
                if not toks:
                    out.append(0)
                    continue
                # (n_tokens, 64) bit matrix from the first 8 md5 bytes per
                # token, unpacked vectorized; majority vote per bit position.
                raw = b"".join(hashlib.md5(t.encode()).digest()[:8] for t in toks)
                bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8).reshape(-1, 8), axis=1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                sh = int.from_bytes(np.packbits(votes > 0).tobytes(), "big")
                out.append(sh & 0x7FFFFFFFFFFFFFFF)  # keep in signed-long range
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return d.mapInPandas(simhash_batches, "doc_id long, simhash long")
