"""Ring C — text analysis over the `documents` table (BASELINE.json
north-star: language-ID, quality scoring, token counting, fingerprinting).

All operators are pure built-in expression pipelines (split / higher-order
array functions / windows) — no Python in the hot path.

Scale notes (100 TB):
- Everything here is embarrassingly parallel per document until the final
  small aggregate; no operator shuffles row data except the per-doc→per-lang
  rollups (low-cardinality keys, partial agg).
- The fingerprint operator does explode to one row per token; at 100 TB that
  is the standard winnowing trade-off — the output (distinct window-minima
  per doc) collapses right back in the same stage via partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from ..tables import table
from .util import gated_broadcast, dround
from .util import local_df

def _words():
    return F.split(F.col("text"), " ")


@register(
    "text_stats",
    oracle="""
WITH d AS (
    SELECT lang, n_chars,
           len(string_split(text, ' ')) AS n_words
    FROM documents
)
SELECT lang,
       count(*)                                   AS n_docs,
       CAST(sum(n_chars) AS BIGINT)               AS total_chars,
       round(avg(n_words), 4)                     AS avg_words,
       max(n_words)                               AS max_words,
       round(avg(CAST(n_chars AS DOUBLE) / n_words), 4) AS avg_word_len
FROM d
GROUP BY lang
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality/shape stats: doc counts, char volume, word
    counts, average word length — the building blocks of quality filters."""
    d = table(spark, sf_dir, "documents").select(
        "lang", "n_chars", F.size(_words()).alias("n_words")
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        dround(F.avg("n_words"), 4).alias("avg_words"),
        F.max("n_words").alias("max_words"),
        dround(F.avg(F.col("n_chars").cast("double") / F.col("n_words")), 4).alias("avg_word_len"),
    )


@register(
    "text_lang_id",
    oracle="""
WITH scored AS (
    SELECT doc_id, lang,
           len(list_filter(string_split(text,' '), x -> x IN ('the','data','row')))   AS s_en,
           len(list_filter(string_split(text,' '), x -> x IN ('scan','query','hash')))AS s_es,
           len(list_filter(string_split(text,' '), x -> x IN ('join','group','sort')))AS s_de
    FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
            WHEN s_es >= s_de THEN 'es'
            ELSE 'de' END AS pred_lang,
       s_en, s_es, s_de
FROM scored
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword-score language-ID heuristic: count marker tokens per
    candidate language, argmax with a deterministic tie order.

    (The marker lists are tuned to the synthetic vocabulary; the *shape* —
    token-set scoring, no model, argmax with fixed tie-break — is the real
    operator, identical to fastText-free langid at ingest scale.)
    """
    d = table(spark, sf_dir, "documents")
    def score(words):  # tokens matching a marker set, counted with dups
        return F.size(F.filter(_words(), lambda x: x.isin(*words)))
    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score(["the", "data", "row"]).alias("s_en"),
        score(["scan", "query", "hash"]).alias("s_es"),
        score(["join", "group", "sort"]).alias("s_de"),
    )
    return scored.select(
        "doc_id",
        "labeled_lang",
        F.when((F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_de")), "en")
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
        .alias("pred_lang"),
        "s_en",
        "s_es",
        "s_de",
    )


@register(
    "text_token_count",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' '))                       AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
       CAST(ceil(n_chars / 4.0) AS BIGINT)                AS est_tokens_len4
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, BPE-ish regex segments
    (letter runs / digit runs / single punctuation), and the chars/4
    rule-of-thumb — the standard trio for corpus budgeting."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_words()).alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).alias("bpe_ish_tokens"),
        F.ceil(F.col("n_chars") / 4.0).alias("est_tokens_len4"),
    )


@register(
    "text_fingerprint",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
pos AS (SELECT doc_id, w, unnest(range(1, len(w)+1)) AS p FROM d),
tok AS (SELECT doc_id, p, md5(w[p]) AS h FROM pos),
win AS (SELECT doc_id, p,
               min(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS wmin
        FROM tok)
SELECT doc_id,
       count(DISTINCT wmin) AS fp_size,
       min(wmin)            AS fp_min
FROM win
WHERE p >= 5
GROUP BY doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprint: rolling window (w=5) over token
    hashes, keep each window's minimum — the classic local fingerprinting
    scheme (Schleimer et al., SIGMOD'03). Output: fingerprint cardinality +
    lexicographic min hash per doc.

    md5 is the cross-engine-deterministic token hash (a rolling Rabin hash
    would be cheaper but has no DuckDB twin for the oracle)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(_words()).alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), F.md5(F.encode("word", "UTF-8")).alias("h"))
    w = W.partitionBy("doc_id").orderBy("p").rowsBetween(-4, W.currentRow)
    win = tok.withColumn("wmin", F.min("h").over(w)).filter(F.col("p") >= 5)
    return win.groupBy("doc_id").agg(
        F.countDistinct("wmin").alias("fp_size"),
        F.min("wmin").alias("fp_min"),
    )


@register(
    "text_quality_filter",
    oracle="""
WITH scored AS (
    SELECT doc_id, lang, n_chars,
           len(string_split(text, ' ')) AS n_words,
           CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS avg_wlen,
           len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and')))
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
    FROM documents
)
SELECT doc_id, lang, n_words,
       round(avg_wlen, 4)   AS avg_wlen,
       round(stop_ratio, 4) AS stop_ratio
FROM scored
WHERE n_words >= 20
  AND avg_wlen BETWEEN 3 AND 12
  AND n_chars >= 100
""",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter — the canonical pretraining gate: length floor,
    plausible average word length, char floor (stopword ratio computed and
    reported; thresholds are corpus-dependent). Pure expression pipeline:
    the filter runs inside the scan's codegen stage, nothing shuffles."""
    d = table(spark, sf_dir, "documents")
    w = _words()
    n_words = F.size(w)
    avg_wlen = F.col("n_chars").cast("double") / n_words
    stop_ratio = F.size(F.filter(w, lambda x: x.isin("the", "a", "of", "and"))) / n_words.cast(
        "double"
    )
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            n_words.alias("n_words"),
            avg_wlen.alias("avg_wlen_raw"),
            stop_ratio.alias("stop_ratio_raw"),
        )
        .filter(
            (F.col("n_words") >= 20)
            & F.col("avg_wlen_raw").between(3, 12)
            & (F.col("n_chars") >= 100)
        )
        .select(
            "doc_id",
            "lang",
            "n_words",
            dround("avg_wlen_raw", 4).alias("avg_wlen"),
            dround("stop_ratio_raw", 4).alias("stop_ratio"),
        )
    )


_EMAIL_RE = '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+'
_PHONE_RE = '\\b[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]\\b'


@register(
    "text_pii_scrub",
    oracle="""
WITH contact AS (
    SELECT doc_id,
           'reach user' || CAST(doc_id AS VARCHAR) || ' at user' || CAST(doc_id AS VARCHAR)
           || '@example.com or 555-0' || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0') AS raw
    FROM documents
)
SELECT doc_id,
       regexp_replace(
           regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
           '\\b[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]\\b', '<PHONE>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(raw, '\\b[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]\\b')) AS INTEGER) AS n_phones
FROM contact
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the pretraining scrub pass: emails and phone-shaped
    tokens replaced with typed placeholders, per-doc redaction counts kept
    for audit. The testdata corpus carries no real PII, so the operator
    synthesizes a deterministic contact string per document (both engines
    build the identical string) and scrubs THAT — the regex semantics, not
    the fixture, are what the oracle locks down (Java regex and RE2 agree
    on this character-class subset; patterns avoid constructs the engines
    treat differently). Pure expression pipeline: scrub runs inside the
    scan's codegen stage at any scale."""
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("reach user"), F.col("doc_id").cast("string"),
        F.lit(" at user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-0"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 3, "0"),
    )
    return d.withColumn("_raw", raw).select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("_raw"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all("_raw", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("_raw", F.lit(_PHONE_RE), 0)).alias("n_phones"),
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
WITH w AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
    FROM documents
),
tf AS (SELECT source, word, count(*) AS tf FROM w GROUP BY 1, 2),
df AS (SELECT word, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY 1),
n AS (SELECT count(*) AS n_total FROM documents),
scored AS (
    SELECT tf.source, tf.word, tf.tf, df.n_docs,
           round(tf.tf * ln((n.n_total + 1.0) / (df.n_docs + 1.0)), 6) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY tfidf DESC, word) AS rnk
    FROM scored
)
SELECT source, word, CAST(tf AS BIGINT) AS tf,
       CAST(n_docs AS BIGINT) AS n_docs, tfidf, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
ORDER BY source, rnk
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TF-IDF vocabulary analysis: the 5 most DISTINCTIVE terms
    per source stream — corpus term frequency weighted by smoothed inverse
    document frequency. This is the signal a mixture builder uses to spot a
    stream's domain skew (and a contamination checker uses in reverse).

    Scale (100 TB): one explode + two aggregations that share the word
    shuffle key, the grand doc count broadcast as a 1-row frame, and a
    per-source top-5 window over the (sources × vocabulary) aggregate —
    orders of magnitude smaller than the corpus. Ranking orders by the
    ROUNDED score with the term as tiebreak, so the cross-engine top-5 set
    is deterministic even when ln() differs in the last ulp."""
    d = table(spark, sf_dir, "documents")
    w = d.select("doc_id", "source", F.explode(_words()).alias("word"))
    tf = w.groupBy("source", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = w.groupBy("word").agg(F.countDistinct("doc_id").alias("n_docs"))
    n = d.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            dround(
                F.col("tf")
                * F.log((F.col("n_total") + 1.0) / (F.col("n_docs") + 1.0)),
                6,
            ),
        )
    )
    win = W.partitionBy("source").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= 5)
        .select(
            "source",
            "word",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "tfidf",
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("source", "rnk")
    )


@register(
    "text_repetition_signals",
    oracle="""
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
words AS (SELECT doc_id, unnest(ws) AS w FROM d),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
agg1 AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_words,
           max(c)                 AS top_w,
           count(*)               AS n_distinct
    FROM wc GROUP BY doc_id
),
bgr AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i+1])) AS b
    FROM d WHERE len(ws) >= 2
),
bc AS (SELECT doc_id, b, count(*) AS c FROM bgr GROUP BY doc_id, b),
agg2 AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_bg
    FROM bc GROUP BY doc_id
)
SELECT a.doc_id,
       n_words,
       round(CAST(top_w AS DOUBLE) / n_words, 6)          AS top_word_frac,
       round(1 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac,
       round(CAST(top_bg AS DOUBLE) / n_bigrams, 6)       AS top_bigram_frac
FROM agg1 a JOIN agg2 b ON a.doc_id = b.doc_id
""",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals — the MassiveText/Gopher quality
    heuristics (Rae et al. 2021 §A1.1): fraction of words taken by the most
    frequent word, duplicate-word fraction, and top-bigram fraction.
    Training pipelines gate boilerplate/spam on exactly these knobs.

    Shape: one explode to word rows, count per (doc, word), re-aggregate per
    doc; bigrams via a lead window over the exploded rows (codegen, no
    interpreted array lambdas). Every shuffle key contains doc_id, partial
    aggregation collapses per-partition duplicates before each exchange,
    and the final per-doc join broadcasts — embarrassingly parallel at
    100 TB."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(_words()).alias("pos", "w")
    )
    wc = d.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    agg1 = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.max("c").alias("top_w"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    bg = (
        d.withColumn("w1", F.lead("w", 1).over(w))
        .filter(F.col("w1").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w1").alias("b"))
    )
    bc = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    agg2 = bc.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bg")
    )
    return agg1.join(agg2, "doc_id").select(
        "doc_id",
        "n_words",
        dround(F.col("top_w").cast("double") / F.col("n_words"), 6).alias("top_word_frac"),
        dround(F.lit(1) - F.col("n_distinct").cast("double") / F.col("n_words"), 6).alias("dup_word_frac"),
        dround(F.col("top_bg").cast("double") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
    )


@register(
    "text_unigram_logprob_score",
    oracle="""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
freq AS (
    SELECT w,
           CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM words) AS p
    FROM words GROUP BY w
)
SELECT doc_id,
       CAST(count(*) AS BIGINT)     AS n_words,
       round(avg(-ln(f.p)), 6)      AS mean_neg_logprob
FROM words x JOIN freq f ON x.w = f.w
GROUP BY doc_id
""",
)
def text_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal unigram LM scoring — the CCNet-style quality proxy
    (Wenzek et al. 2020): per-doc mean negative log-probability of its words
    under the corpus's own unigram distribution. Low = stereotypical text,
    high = rare-word soup; pipelines keep the middle band.

    Shape: one explode to word rows feeding BOTH the corpus frequency table
    and the per-doc score (diamond — the word rows are tiny relative to
    text, recomputing beats persisting here); the frequency table
    (vocabulary-sized, ≪ corpus) joins back onto the word rows — broadcast
    while its size estimate stays under gated_broadcast's limit, so the
    only per-row shuffle is the final doc_id rollup; a web-scale vocabulary
    (unique tokens grow past 10⁸ with typos/URLs) exceeds the gate and the
    join falls back to a hash shuffle on the word, which is the correct
    plan at that size."""
    words = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_words()).alias("w")
    )
    total = words.count()
    freq = words.groupBy("w").agg(
        (F.count(F.lit(1)).cast("double") / F.lit(total)).alias("p")
    )
    return (
        words.join(gated_broadcast(freq), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            dround(F.avg(-F.log("p")), 6).alias("mean_neg_logprob"),
        )
    )


_HH_FRACTION = 200  # heavy hitter = frequency > corpus_words / 200


@register(
    "agg_heavy_hitters",
    oracle=f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
t AS (SELECT count(*) AS n FROM w)
SELECT word, count(*) AS freq,
       round(CAST(count(*) AS DOUBLE) / any_value(t.n), 6) AS share
FROM w, t
GROUP BY word
HAVING count(*) > any_value(t.n) / {_HH_FRACTION}
""",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters — words whose corpus frequency exceeds n/{_HH_FRACTION}
    (the frequent-items query behind stopword induction and boilerplate
    detection). Exact form: one word-count shuffle with map-side partials +
    a 1-row total broadcast for the threshold. The sketch twin at 100 TB is
    Misra-Gries/space-saving with the SAME output contract (any word over
    the 1/k threshold is guaranteed caught — the sketch can only add
    sub-threshold false candidates, which one exact re-count pass over the
    candidate set removes)."""
    words = table(spark, sf_dir, "documents").select(
        F.explode(_words()).alias("word")
    )
    total = words.count()
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > F.lit(total) / _HH_FRACTION)
        .select(
            "word",
            "freq",
            dround(F.col("freq").cast("double") / F.lit(total), 6).alias("share"),
        )
    )


_BPE_VOCAB_CAP = 200  # word types entering the fit (freq-ranked, bounded)
_BPE_ROUNDS = 2


_BPE_BASE_CTES = f"""
wf AS (
    SELECT word, count(*) AS freq
    FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
          FROM documents)
    WHERE len(word) >= 2
    GROUP BY word
),
vocab AS (
    SELECT word, freq,
           row_number() OVER (ORDER BY freq DESC, word) AS rk
    FROM wf QUALIFY rk <= {_BPE_VOCAB_CAP}
),
seq0 AS (
    SELECT word, freq,
           ' ' || array_to_string(list_transform(range(1, len(word) + 1),
               i -> word[i]), ' ') || ' ' AS seq
    FROM vocab
)"""


def _bpe_pair_cte(rnd: int) -> str:
    """Count adjacent symbol pairs of seq{rnd-1} (weighted by word freq) and
    pick the round's merge: max freq, ties to the lexicographically smaller
    pair — then rewrite every occurrence into the fused symbol."""
    prev = f"seq{rnd - 1}"
    return f"""
toks{rnd} AS (
    SELECT word, freq, string_split(trim(seq), ' ') AS ts FROM {prev}
),
pairs{rnd} AS (
    SELECT ts[i] || ' ' || ts[i + 1] AS pair, sum(freq) AS pfreq
    FROM toks{rnd}, unnest(range(1, len(ts))) AS t(i)
    GROUP BY 1
),
top{rnd} AS (
    SELECT pair, CAST(pfreq AS BIGINT) AS pfreq,
           row_number() OVER (ORDER BY pfreq DESC, pair) AS rr
    FROM pairs{rnd} QUALIFY rr = 1
),
seq{rnd} AS (
    SELECT s.word, s.freq,
           replace(s.seq, ' ' || t.pair || ' ',
                   ' ' || replace(t.pair, ' ', '') || ' ') AS seq
    FROM {prev} s CROSS JOIN top{rnd} t
)"""


@register(
    "text_bpe_merge_rounds",
    oracle="WITH "
    + _BPE_BASE_CTES
    + ","
    + ",".join(_bpe_pair_cte(r) for r in range(1, _BPE_ROUNDS + 1))
    + """
SELECT * FROM (
    SELECT 1 AS round, pair, pfreq FROM top1
    UNION ALL
    SELECT 2 AS round, pair, pfreq FROM top2
) ORDER BY round
""",
)
def text_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, the first {_BPE_ROUNDS} merge rounds — the
    exact algorithm HF/SentencePiece trainers run: count word frequencies
    once, represent each word as a space-joined symbol sequence, then per
    round (a) count adjacent symbol pairs weighted by word frequency,
    (b) fuse the most frequent pair (ties to the lexicographically smaller —
    a pinned, engine-replayable tiebreak), (c) rewrite the sequences.
    Returns the merge table: (round, winning pair, weighted frequency).

    Scale (100 TB): real BPE trainers run on the WORD-FREQUENCY table, not
    the corpus — the corpus-sized work is the one word-count shuffle; the
    fit loops over a freq-ranked bounded vocabulary ({_BPE_VOCAB_CAP} types
    here, ~10⁶ in production — still tiny), each round one explode+groupBy
    over sequences plus a 1-row argmax collected to the driver (the merge
    table IS driver-side state in every real trainer). Rounds are
    data-dependent sequential by nature; what matters is that no round
    touches the corpus again."""
    d = table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # top-N by (freq, word): TakeOrderedAndProject — per-partition top-N +
    # one merge, never a single-partition rank window over the vocab table
    vocab = wf.orderBy(F.col("freq").desc(), "word").limit(_BPE_VOCAB_CAP)
    seq = vocab.select(
        "word",
        "freq",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
                " ",
            ),
            F.lit(" "),
        ).alias("seq"),
    )
    from .util import scoped_persist

    out_rows = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        seq = scoped_persist(seq)  # each round reads it twice (count + rewrite)
        toks = seq.select(
            "freq", F.split(F.trim(F.col("seq")), " ").alias("ts")
        )
        pairs = (
            toks.select(
                "freq",
                F.explode(
                    F.expr("transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i + 1]))")
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("pfreq"))
        )
        top = pairs.orderBy(F.col("pfreq").desc(), "pair").limit(1).collect()[0]
        out_rows.append((rnd, top["pair"], int(top["pfreq"])))
        fused = top["pair"].replace(" ", "")
        seq = seq.select(
            "word",
            "freq",
            # symbols are strictly [a-z]: no regex metachars to escape,
            # and replace/regexp_replace share left-to-right non-overlap
            # semantics with DuckDB's replace()
            F.regexp_replace(
                "seq", " " + top["pair"] + " ", " " + fused + " "
            ).alias("seq"),
        )
    return local_df(spark, out_rows, "round int, pair string, pfreq bigint")


@register(
    "text_bigram_logprob_score",
    oracle="""
WITH w AS (
  SELECT doc_id, i AS pos, ws[i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       unnest(range(1, len(ws) + 1)) t(i)
),
b AS (
  SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, w
  FROM w
  QUALIFY prev IS NOT NULL
),
c12 AS (SELECT prev, w, count(*) AS n12 FROM b GROUP BY prev, w),
c1  AS (SELECT prev, count(*) AS n1 FROM b GROUP BY prev),
v   AS (SELECT count(DISTINCT w) AS vocab FROM w)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln((c12.n12 + 0.5) / (c1.n1 + 0.5 * v.vocab))), 6)
         AS mean_neg_logprob
FROM b JOIN c12 USING (prev, w) JOIN c1 USING (prev), v
GROUP BY b.doc_id
""",
)
def text_bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal BIGRAM LM scoring with add-k smoothing (k=0.5) — the
    context-aware step up from text_unigram_logprob_score (CCNet/KenLM-style
    quality proxy, Wenzek et al. 2020): per-doc mean negative log-prob of
    each word GIVEN its predecessor, p(w|prev) = (c(prev,w)+k)/(c(prev)+kV).
    Word-salad with common words scores badly here even though the unigram
    model loves it — exactly the failure mode that motivates the bigram.

    Shape: one posexplode to word rows; bigrams from a per-doc lag window
    (doc-partitioned — no cross-doc shuffle); the c(prev,w) and c(prev)
    count tables are vocabulary²-bounded-but-corpus-sparse aggregates that
    join back onto the bigram rows on their own keys (broadcast while small,
    shuffle-hash beyond — no hint forced); V is a 1-row broadcast. The only
    corpus-sized shuffles are the two count aggregates and the final doc
    rollup, all with map-side partials."""
    w = table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(_words()).alias("pos", "w")
    )
    k = 0.5
    b = (
        w.withColumn(
            "prev",
            F.lag("w").over(W.partitionBy("doc_id").orderBy("pos")),
        )
        .filter(F.col("prev").isNotNull())
        .select("doc_id", "prev", "w")
    )
    c12 = b.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("n12"))
    c1 = b.groupBy("prev").agg(F.count(F.lit(1)).alias("n1"))
    vocab = w.agg(F.countDistinct("w").alias("vocab"))
    return (
        b.join(c12, ["prev", "w"])
        .join(c1, ["prev"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            dround(
                F.avg(
                    -F.log(
                        (F.col("n12") + F.lit(k))
                        / (F.col("n1") + F.lit(k) * F.col("vocab"))
                    )
                ),
                6,
            ).alias("mean_neg_logprob"),
        )
    )


_ZIPF_TOP = 500  # fit over the top-N ranks (the power-law regime)


@register(
    "text_zipf_fit",
    oracle=f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
f AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w GROUP BY word),
r AS (SELECT word, freq,
             row_number() OVER (ORDER BY freq DESC, word) AS rnk
      FROM f),
p AS (SELECT ln(CAST(rnk AS DOUBLE)) AS lx, ln(CAST(freq AS DOUBLE)) AS ly
      FROM r WHERE rnk <= {_ZIPF_TOP})
SELECT CAST(count(*) AS BIGINT) AS n_ranks,
       round((count(*) * sum(lx * ly) - sum(lx) * sum(ly))
             / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 6) AS zipf_slope,
       round((sum(ly) - ((count(*) * sum(lx * ly) - sum(lx) * sum(ly))
             / (count(*) * sum(lx * lx) - sum(lx) * sum(lx))) * sum(lx))
             / count(*), 6) AS intercept
FROM p
""",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus word-frequency distribution — the
    corpus-health diagnostic (natural language sits near slope −1; heavy
    boilerplate/template contamination flattens it, spam/random text
    steepens it): closed-form OLS of ln(freq) on ln(rank) over the top
    {top} ranks. One number a pipeline tracks per crawl snapshot next to
    window_cusum_drift's per-metric alarms.

    Scale: ONE word-count shuffle with map-side partials; ranking the
    top-{top} is a frequency sort of the vocabulary (≪ corpus); the OLS is
    a single partial-aggregable pass over {top} rows. The global
    row_number window runs over the vocabulary AFTER a freq-desc ordering
    — bounded input, and ties break on the word so ranks are
    engine-deterministic.""".format(top=_ZIPF_TOP)
    words = table(spark, sf_dir, "documents").select(
        F.explode(_words()).alias("word")
    )
    f = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    # top-N first via sort+limit (TakeOrderedAndProject — distributed
    # per-partition top-k + one merge), THEN the rank window over the
    # already-bounded N rows: the one unpartitioned window in this plan
    # runs over {top} rows by construction, the same discipline as
    # window_rolling_corr's post-aggregation global frame.
    top = f.orderBy(F.col("freq").desc(), F.col("word")).limit(_ZIPF_TOP)
    r = top.select(
        "freq",
        F.row_number()
        .over(W.orderBy(F.col("freq").desc(), F.col("word")))
        .alias("rnk"),
    )
    p = r.select(
        F.log(F.col("rnk").cast("double")).alias("lx"),
        F.log(F.col("freq").cast("double")).alias("ly"),
    )
    n = F.count(F.lit(1))
    slope = (n * F.sum(F.col("lx") * F.col("ly")) - F.sum("lx") * F.sum("ly")) / (
        n * F.sum(F.col("lx") * F.col("lx")) - F.sum("lx") * F.sum("lx")
    )
    return p.agg(
        n.cast("bigint").alias("n_ranks"),
        dround(slope, 6).alias("zipf_slope"),
        dround((F.sum("ly") - slope * F.sum("lx")) / n, 6).alias("intercept"),
    )
