"""Ring C — multimodal column plumbing (BASELINE.json north-star).

Images/audio/video are carried as opaque `binary` columns with a typed
metadata struct; decode / feature-extract runs as Arrow-batched
`mapInPandas`. The real media codecs are NOT in this container, so the
decode step is a deterministic fake wired exactly like the real one
(same schema, same batch shape, same partitioning) — swap `_fake_decode`
for a PIL/ffmpeg call and nothing else changes. See
`multimodal_decode_real` for the guarded real-codec entry point.

Scale notes (100 TB):
- Binary payloads ride the columnar scan; the decode stage is per-partition
  streaming (mapInPandas iterator — never materializes a partition), which
  is the standard shape for TB-scale media featurization.
- Frame sampling emits offsets, not frames: the expensive explode only
  happens after the sampling decision, on a bounded list.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_DECODE_SCHEMA = (
    "doc_id long, media_format string, n_bytes long, width int, height int, "
    "n_frames int, frame_offsets array<long>"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Deterministic stand-in for a media decoder: dimensions/frames derived
    from the byte length only (so the DuckDB oracle can reproduce them).
    A real decoder replaces this function body alone."""
    n = len(payload)
    width = n % 640 + 1
    height = (n * 7) % 480 + 1
    n_frames = n % 10 + 1
    offsets = [i * (n // n_frames) for i in range(n_frames)]
    return width, height, n_frames, offsets


def _decode_batches(batches):
    for pdf in batches:
        cols = {"doc_id": pdf["doc_id"], "media_format": pdf["media_format"]}
        decoded = [_fake_decode(b) for b in pdf["payload"]]
        cols["n_bytes"] = [len(b) for b in pdf["payload"]]
        cols["width"] = [d[0] for d in decoded]
        cols["height"] = [d[1] for d in decoded]
        cols["n_frames"] = [d[2] for d in decoded]
        cols["frame_offsets"] = [d[3] for d in decoded]
        yield pd.DataFrame(cols)


@register(
    "multimodal_decode",
    oracle="""
WITH m AS (
    SELECT doc_id,
           'fake/txt' AS media_format,
           octet_length(encode(text)) AS n_bytes
    FROM documents
)
SELECT doc_id, media_format, n_bytes,
       CAST(n_bytes % 640 + 1 AS INT)       AS width,
       CAST((n_bytes * 7) % 480 + 1 AS INT) AS height,
       CAST(n_bytes % 10 + 1 AS INT)        AS n_frames
FROM m
""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: pack text bytes as the opaque payload
    (documents stand in for media blobs), attach typed metadata, decode via
    Arrow-batched mapInPandas, return scalar features.

    The oracle replays the deterministic fake on byte length — it validates
    that the payload bytes survive the binary column round-trip and that the
    UDF batch plumbing computes on the real payload."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("fake/txt").alias("media_format"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    decoded = d.mapInPandas(_decode_batches, _DECODE_SCHEMA)
    # frame_offsets is exercised by multimodal_frame_sample; scalars here
    return decoded.select("doc_id", "media_format", "n_bytes", "width", "height", "n_frames")


@register(
    "multimodal_frame_sample",
    oracle="""
WITH m AS (
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(n_bytes % 10 + 1 AS INT) AS n_frames
    FROM documents
    WHERE doc_id < 200
)
SELECT doc_id,
       CAST(unnest(range(0, n_frames)) AS INT)            AS frame_idx,
       unnest(list_transform(range(0, n_frames),
              i -> i * (n_bytes // n_frames)))            AS byte_offset
FROM m
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: decode yields a bounded offsets list per blob; explode
    only that list into (doc_id, frame_idx, byte_offset) rows — the sampled
    frames a downstream vision featurizer would fetch."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.lit("fake/txt").alias("media_format"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    decoded = d.mapInPandas(_decode_batches, _DECODE_SCHEMA)
    return decoded.select(
        "doc_id", F.posexplode("frame_offsets").alias("frame_idx", "byte_offset")
    )


def decode_image_real(payload: bytes):  # pragma: no cover - codec not in container
    """Real-codec decode, gated on library availability (the container has no
    media libs). The Spark-side wiring (schema, batch shape, partitioning)
    is identical to `multimodal_decode` — only this function changes."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "multimodal_decode uses the deterministic fake instead"
        ) from e
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return img.width, img.height, 1, [0]


_RESIZE_TARGET = 224


def _resize_batches(batches):
    """Fit each decoded image into a 224x224 box preserving aspect ratio —
    integer arithmetic only, so the oracle replays it exactly. A real
    implementation calls PIL.Image.resize on the decoded pixels; the dims
    math is identical."""
    for pdf in batches:
        w, h = pdf["width"], pdf["height"]
        m = w.combine(h, max)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": w,
                "height": h,
                "out_w": (w * _RESIZE_TARGET // m).clip(lower=1).astype("int32"),
                "out_h": (h * _RESIZE_TARGET // m).clip(lower=1).astype("int32"),
            }
        )


@register(
    "multimodal_resize",
    oracle=f"""
WITH m AS (
    SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
),
dims AS (
    SELECT doc_id,
           CAST(n_bytes % 640 + 1 AS INT)       AS width,
           CAST((n_bytes * 7) % 480 + 1 AS INT) AS height
    FROM m
)
SELECT doc_id, width, height,
       CAST(greatest(width  * {_RESIZE_TARGET} // greatest(width, height), 1) AS INT) AS out_w,
       CAST(greatest(height * {_RESIZE_TARGET} // greatest(width, height), 1) AS INT) AS out_h
FROM dims
""",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: decode → aspect-preserving fit into the model's input
    box ({_RESIZE_TARGET}px), Arrow-batched mapInPandas over the decoded
    dims. The dims arithmetic is integer-exact, so the oracle replays the
    whole decode→resize chain; a real resizer changes only the pixel work,
    not the plumbing, schema, or partitioning (per-partition streaming —
    at 100 TB no partition of frames is ever materialized)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("fake/txt").alias("media_format"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    decoded = d.mapInPandas(_decode_batches, _DECODE_SCHEMA)
    # only the dims the resizer reads cross the second Python boundary
    # (guide §4.1)
    return decoded.select("doc_id", "width", "height").mapInPandas(
        _resize_batches, "doc_id long, width int, height int, out_w int, out_h int"
    )


def _feature_batches(batches):
    """Deterministic stand-in features (byte-length moments) with the real
    extractor's exact shape: one array<double> per blob, Arrow-batched. A
    real model replaces this function body (BLAS/torch on the decoded
    pixels); schema and batching stay."""
    for pdf in batches:
        n = pdf["n_bytes"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "features": [
                    [float(v), float(v % 7), float(v % 13), float((v * 31) % 97)]
                    for v in n
                ],
            }
        )


@register(
    "multimodal_feature_extract",
    oracle="""
WITH m AS (
    SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
)
SELECT doc_id,
       CAST(unnest(range(0, 4)) AS INT) AS feature_idx,
       unnest([CAST(n_bytes AS DOUBLE), CAST(n_bytes % 7 AS DOUBLE),
               CAST(n_bytes % 13 AS DOUBLE),
               CAST((n_bytes * 31) % 97 AS DOUBLE)]) AS feature
FROM m
""",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media columns: decode → per-blob
    feature vector (array<double>) via Arrow-batched mapInPandas — the
    embedding-generation stage of a multimodal training pipeline. Features
    here are deterministic byte-length moments so the oracle can replay
    them; the Spark-side contract (binary column in, fixed-width double
    array out, per-partition streaming) is exactly what a real vision/audio
    encoder plugs into.

    The REGISTERED result projects the vector to exploded
    (doc_id, feature_idx, feature) rows: the driver's order-insensitive
    canonicalizer hashes scalar cells only (an array<double> cell broke it
    in round 3 — CORRECTNESS_r03), and the exploded form is also the shape
    a feature store ingests. The mapInPandas stage still produces the real
    array<double> contract underneath."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("fake/txt").alias("media_format"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    decoded = d.mapInPandas(_decode_batches, _DECODE_SCHEMA)
    # only doc_id/n_bytes cross the second Python boundary (guide §4.1)
    vecs = decoded.select("doc_id", "n_bytes").mapInPandas(
        _feature_batches, "doc_id long, features array<double>"
    )
    return vecs.select("doc_id", F.posexplode("features").alias("feature_idx", "feature"))


_AUDIO_SCHEMA = (
    "doc_id long, src_rate int, n_samples long, out_samples long, checksum long"
)
_AUDIO_TARGET_RATE = 16_000
_AUDIO_RATES = [8_000, 16_000, 44_100]


def _fake_audio_meta(n: int) -> tuple[int, int]:
    """(source sample rate, decimation stride) for an n-byte fake PCM blob —
    derived from the byte length only, so the DuckDB oracle reproduces it."""
    src_rate = _AUDIO_RATES[n % 3]
    stride = max(1, src_rate // _AUDIO_TARGET_RATE)
    return src_rate, stride


def _audio_resample_batches(batches):
    for pdf in batches:
        rows = {"doc_id": pdf["doc_id"], "src_rate": [], "n_samples": [],
                "out_samples": [], "checksum": []}
        for payload in pdf["payload"]:
            n = len(payload)
            src_rate, stride = _fake_audio_meta(n)
            sampled = payload[::stride]
            rows["src_rate"].append(src_rate)
            rows["n_samples"].append(n)
            rows["out_samples"].append(len(sampled))
            rows["checksum"].append(int(sum(sampled)))
        yield pd.DataFrame(rows)


@register(
    "multimodal_audio_resample",
    oracle=f"""
WITH m AS (
    SELECT doc_id, text, length(text) AS n
    FROM documents WHERE doc_id < 300
),
p AS (
    SELECT doc_id, text, n,
           ([8000, 16000, 44100])[n % 3 + 1] AS src_rate
    FROM m
),
k AS (
    SELECT doc_id, text, n, src_rate,
           greatest(1, src_rate // {_AUDIO_TARGET_RATE}) AS stride
    FROM p
)
SELECT doc_id,
       CAST(src_rate AS INT)                           AS src_rate,
       CAST(n AS BIGINT)                               AS n_samples,
       CAST((n + stride - 1) // stride AS BIGINT)      AS out_samples,
       CAST(COALESCE(list_sum(list_transform(range(1, n + 1, stride),
                     i -> ascii(substr(text, i, 1)))), 0) AS BIGINT) AS checksum
FROM k
""",
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resampling plumbing: opaque PCM payloads (text bytes stand in
    for samples — the fixture corpus is pure ASCII, so DuckDB can replay
    the byte math on characters) are decimated to a 16 kHz target rate via
    an integer stride inside an Arrow-batched mapInPandas iterator. The
    checksum over the RESAMPLED samples proves the UDF computed on the
    actual payload bytes, not just metadata — swap the stride loop for a
    librosa/soxr call and nothing else changes (same schema, same batch
    shape, same partitioning). Scale: identical contract to
    multimodal_decode — per-partition streaming, payloads never leave the
    executor, output is fixed-width scalars."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
    )
    return d.mapInPandas(_audio_resample_batches, _AUDIO_SCHEMA)


@register(
    "multimodal_clip_filter",
    oracle="""
WITH img AS (
    SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
),
imgf AS (
    SELECT doc_id, n_bytes,
           [CAST(n_bytes AS DOUBLE), CAST(n_bytes % 7 AS DOUBLE),
            CAST(n_bytes % 13 AS DOUBLE), CAST((n_bytes * 31) % 97 AS DOUBLE)] AS f
    FROM img
),
txt AS (
    SELECT vec_id AS doc_id,
           list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS t
    FROM embeddings
),
scored AS (
    SELECT i.doc_id, i.n_bytes,
           list_aggregate(list_transform(range(1, 5), k -> i.f[k] * t.t[k]), 'sum')
           / (sqrt(list_aggregate(list_transform(i.f, x -> x * x), 'sum'))
            * sqrt(list_aggregate(list_transform(t.t, x -> x * x), 'sum'))) AS align
    FROM imgf i JOIN txt t USING (doc_id)
)
SELECT doc_id, n_bytes, round(align, 6) AS align
FROM scored WHERE align >= 0.5
""",
)
def multimodal_clip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-style alignment filtering — the multimodal data-curation gate
    (LAION's recipe): embed the image side (binary payload → feature vector
    via the real Arrow-batched mapInPandas chain), embed the text side (the
    embeddings table's vectors), join the modalities per document, keep
    pairs whose cross-modal cosine clears the alignment threshold. The
    deterministic fake image encoder lets the oracle replay every float;
    a real CLIP tower replaces one function body, the pipeline shape —
    binary in, fixed-width vectors, modality equi-join, threshold gate —
    is exactly the production one.

    Scale: each encoder is map-only over its modality; the only shuffle is
    the doc-keyed 1:1 equi-join; the gate is a scan-stage expression. At
    100 TB you shard both modality tables by doc_id (bucketing removes
    even the join exchange) and the filter's selectivity prunes the
    training set before any expensive downstream tokenization."""
    from .util import scoped_persist

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("fake/txt").alias("media_format"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    # scoped persist: ``decoded`` feeds BOTH the feature encoder and the
    # n_bytes re-join — unshared diamond (guide §5), the decode Python
    # stage would run twice per action otherwise
    decoded = scoped_persist(d.mapInPandas(_decode_batches, _DECODE_SCHEMA))
    # project to the two columns the encoder reads before the Python
    # boundary (guide §4.1: mapInPandas ships every column it is given)
    imgf = (
        decoded.select("doc_id", "n_bytes")
        .mapInPandas(_feature_batches, "doc_id long, features array<double>")
        .join(decoded.select("doc_id", "n_bytes"), "doc_id")
    )
    txt = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.expr("transform(slice(embedding, 1, 4), x -> CAST(x AS DOUBLE))").alias("t"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("features"), F.col("t"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    )
    scored = imgf.join(txt, "doc_id").select(
        "doc_id",
        "n_bytes",
        (dot / (nrm(F.col("features")) * nrm(F.col("t")))).alias("align"),
    )
    from .util import dround

    return scored.filter(F.col("align") >= 0.5).select(
        "doc_id", "n_bytes", dround("align", 6).alias("align")
    )


_PHASH_SLICES = 63   # one bit per slice; bit 0 stays clear (signed long)
_PHASH_HAM_T = 3
_PHASH_BANDS = 4     # 4 x 16-bit chunks: pigeonhole-complete for hamming <= 3

_PHASH_ORACLE_CTES = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  -- same-length localized corruption: the re-encode/bitrot scenario
  -- perceptual hashing exists to catch (length preserved, so slice
  -- boundaries hold and only the touched slice's bit can flip)
  SELECT doc_id + 1000000 AS doc_id,
         substring(text, 1, length(text) - 1) || 'X' AS text
  FROM documents WHERE doc_id < 50 AND length(text) > 1),
ph AS (
  SELECT doc_id,
         CAST(list_aggregate(list_transform(range(1, {_PHASH_SLICES + 1}),
             i -> CASE WHEN (instr('0123456789abcdef',
                        substr(md5(substring(text,
                                   CAST((i-1) * length(text) // {_PHASH_SLICES} + 1 AS BIGINT),
                                   CAST(i * length(text) // {_PHASH_SLICES}
                                        - (i-1) * length(text) // {_PHASH_SLICES} AS BIGINT))),
                               1, 1)) - 1) % 2 = 1
                  THEN CAST(1 AS BIGINT) << CAST({_PHASH_SLICES} - i AS INTEGER)
                  ELSE 0 END), 'sum') AS BIGINT) AS phash
  FROM corpus)
"""


def _phash_batches(batches):
    import hashlib

    for pdf in batches:
        out = []
        for text in pdf["payload"]:
            n = len(text)
            h = 0
            for i in range(1, _PHASH_SLICES + 1):
                s, e = (i - 1) * n // _PHASH_SLICES, i * n // _PHASH_SLICES
                hx = hashlib.md5(text[s:e].encode("utf-8")).hexdigest()
                if int(hx[0], 16) & 1:
                    h |= 1 << (_PHASH_SLICES - i)
            out.append(h)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": out})


@register(
    "multimodal_phash_dedup",
    oracle=f"""
WITH {_PHASH_ORACLE_CTES},
bands AS (SELECT doc_id, phash, band,
                 (phash >> CAST(band * 16 AS INTEGER)) & 65535 AS key
          FROM ph CROSS JOIN (SELECT unnest(range(0, {_PHASH_BANDS})) AS band) b),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.phash AS ph_a,
                         b.doc_id AS doc_b, b.phash AS ph_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                                   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ph_a, ph_b)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= {_PHASH_HAM_T}
""",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over BINARY media payloads —
    the image-dedup shape (blockhash/pHash): the decode stage normalizes
    each blob and emits a 64-bit locality-sensitive fingerprint (here a
    blockhash stand-in: one parity bit per 1/{_PHASH_SLICES} content
    slice, so same-length payloads sharing most content land within a few
    bits — swap the slice-parity for DCT-of-pixels and nothing downstream
    changes), computed in the SAME Arrow-batched mapInPandas stage a real
    decoder runs in. Pairing then leaves Python entirely: the 4×16-bit
    pigeonhole band join from the SimHash path (any two hashes within
    Hamming {_PHASH_HAM_T} agree on a whole chunk) finds every close pair
    with an output-sized equi-join, verified by one codegen'd
    xor+bit_count.

    At 100 TB of images this is the canonical split: per-blob featurize in
    the decode pass (embarrassingly parallel, payload never leaves its
    partition), dedup on the 8-byte fingerprints — the shuffle carries
    hashes, not media."""
    docs = table(spark, sf_dir, "documents")
    # Same-length localized corruption (the re-encode/bitrot case pHash
    # exists to catch): a copy of the first 50 docs with only the final
    # character replaced — slice boundaries hold, so only the touched
    # slice's bit can differ and the pair lands at Hamming <= 1.
    mutated = docs.filter((F.col("doc_id") < 50) & (F.length("text") > 1)).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.expr("substring(text, 1, length(text) - 1)"), F.lit("X")
        ).alias("text"),
    )
    d = docs.select("doc_id", "text").unionAll(mutated).select(
        "doc_id", F.col("text").alias("payload")
    )
    # scoped persist: ``bands`` feeds BOTH sides of the band self-join, and
    # Catalyst cannot share the pruned subtrees — without it the 63-md5
    # Python phash stage (and the corpus scan under it) runs TWICE per
    # action (the dedup_simhash_pairs diamond, guide §5)
    from .util import scoped_persist

    ph = scoped_persist(
        d.mapInPandas(_phash_batches, "doc_id long, phash long")
    )
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(_PHASH_BANDS - 1))).alias("band"),
    ).withColumn("key", F.expr("shiftright(phash, cast(band * 16 as int)) & 65535"))
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("ph_b"),
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
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("phash").alias("ph_a"),
            "doc_b",
            "ph_b",
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return cand.withColumn("hamming", ham.cast("int")).filter(
        F.col("hamming") <= _PHASH_HAM_T
    ).select("doc_a", "doc_b", "hamming")


_SCENE_CUT_T = 12  # |frame signature delta| above this starts a new scene


def _scene_batches(batches):
    """Decode pass + per-frame SIGNATURE: the byte value at each sampled
    frame's offset (a real implementation hashes the decoded frame's
    pixels; the Spark-side shape — one signature per frame riding the
    decode batch — is identical). Arrow-batched, never materializes a
    partition."""
    for pdf in batches:
        rows = {"doc_id": [], "frame_idx": [], "sig": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _, _, _, offsets = _fake_decode(payload)
            for i, off in enumerate(offsets):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(i)
                rows["sig"].append(int(payload[off]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                "sig": pd.Series(rows["sig"], dtype="int32"),
            }
        )


@register(
    "multimodal_scene_detect",
    oracle="""
WITH m AS (
    SELECT doc_id, text,
           octet_length(encode(text)) AS n_bytes,
           CAST(n_bytes % 10 + 1 AS INT) AS n_frames
    FROM documents WHERE doc_id < 200
),
f AS (
    SELECT doc_id, text,
           CAST(unnest(range(0, n_frames)) AS INT) AS frame_idx,
           unnest(list_transform(range(0, n_frames),
                  i -> i * (n_bytes // n_frames))) AS off
    FROM m
),
s AS (
    SELECT doc_id, frame_idx,
           ord(substr(text, CAST(off AS INT) + 1, 1)) AS sig
    FROM f
),
c AS (
    SELECT doc_id, frame_idx,
           CASE WHEN frame_idx = 0 THEN 0
                WHEN abs(sig - lag(sig) OVER w) > 12 THEN 1
                ELSE 0 END AS cut
    FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
),
sc AS (
    SELECT doc_id, frame_idx,
           sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx)
             AS scene_idx
    FROM c
)
SELECT doc_id, CAST(scene_idx AS INT) AS scene_idx,
       CAST(min(frame_idx) AS INT) AS start_frame,
       CAST(count(*) AS BIGINT) AS n_frames
FROM sc GROUP BY doc_id, scene_idx
""",
)
def multimodal_scene_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCENE-CUT DETECTION over sampled video frames — the shot-boundary
    pass a video curation pipeline runs before captioning/dedup: the
    Arrow-batched decode pass emits one deterministic SIGNATURE per
    sampled frame (byte at the frame offset — a real decoder hashes the
    frame's pixels; the corpus is ASCII so the oracle replays the byte
    as a code point), a per-video lag window marks a CUT wherever the
    signature jumps more than the threshold, a running sum turns cuts
    into scene ids, and scenes aggregate to (start_frame, n_frames)
    spans.

    Scale: the decode pass streams Arrow batches (payload bytes never
    shuffle — only doc-id/frame/signature rows leave it); the cut/scene
    windows partition per video, and the final rollup is one partial-agg
    groupBy — per-video parallelism end to end, same envelope as the
    other multimodal stages."""
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.lit("fake/txt").alias("media_format"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    sigs = d.mapInPandas(
        _scene_batches, "doc_id long, frame_idx int, sig int"
    )
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    cut = F.when(F.col("frame_idx") == 0, 0).otherwise(
        (
            F.abs(F.col("sig") - F.lag("sig").over(w)) > _SCENE_CUT_T
        ).cast("int")
    )
    return (
        sigs.withColumn("cut", cut)
        .withColumn("scene_idx", F.sum("cut").over(w).cast("int"))
        .groupBy("doc_id", "scene_idx")
        .agg(
            F.min("frame_idx").cast("int").alias("start_frame"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        )
    )
