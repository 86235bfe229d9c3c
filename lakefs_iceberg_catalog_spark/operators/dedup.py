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


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, source, sh: distinct word-3-gram shingle set per doc."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - _SHINGLE_N),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + k + 1) for k in range(_SHINGLE_N)]
            ),
        )
    )
    return (
        d.filter(F.size(words) >= _SHINGLE_N)
        .select("doc_id", "source", sh.alias("sh"))
    )


def _jaccard(sh_a, sh_b):
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    return inter / (F.size(sh_a) + F.size(sh_b) - F.size(F.array_intersect(sh_a, sh_b)))


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
    s = _shingled(spark, sf_dir)
    m = s.select(
        "doc_id",
        "sh",
        *[
            F.array_min(
                F.transform("sh", lambda x, s_=seed: F.md5(F.concat(F.lit(f"{s_}|"), x)))
            ).alias(f"h{seed}")
            for seed in _SEEDS
        ],
    )
    bands = None
    for bi, (a, b) in enumerate(_BANDS):
        part = m.select(
            "doc_id", F.lit(bi).alias("band"), F.concat(f"h{a}", f"h{b}").alias("key")
        )
        bands = part if bands is None else bands.unionByName(part)
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("j"))
    )
    return verified.filter(F.col("j") >= _MINHASH_THETA).select(
        "doc_a", "doc_b", dround("j", 6).alias("jaccard")
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
    s = _shingled(spark, sf_dir)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("source"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("source"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, "source").filter(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.select("doc_a", "doc_b", "source", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("j"))
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
