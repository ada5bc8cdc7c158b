"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata structs, processed by Arrow-batched pandas UDFs over
``mapInPandas`` (beyond-reference surface; driver north star).

The real codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode step is STUBBED: ``real_decode`` raises NotImplementedError,
and ``fake_decode`` produces a deterministic byte-derived "image" so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested end-to-end. Swapping in a real codec touches
exactly one function.

Scale notes: payloads never leave the executor (no collect); each
mapInPandas batch holds ~maxRecordsPerBatch rows of binary — for real
media set spark.sql.execution.arrow.maxRecordsPerBatch low (e.g. 64)
so a batch of 4K-frame images fits executor memory; feature extraction
emits fixed-width rows so downstream joins/aggs are columnar again.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables

MEDIA_SCHEMA = (
    "media_id bigint, media_type string, payload binary, "
    "meta struct<width:int, height:int, format:string>"
)


def make_media_table(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic media table from documents: the payload
    is the md5 digest bytes of the text (16 opaque bytes standing in for
    an encoded image)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.unhex(F.md5(F.col("text"))).alias("payload"),
        F.struct(
            F.lit(4).alias("width"), F.lit(4).alias("height"), F.lit("fake8").alias("format")
        ).alias("meta"),
    )


def real_decode(payload: bytes, fmt: str) -> np.ndarray:
    """The codec seam. Wire PIL/libvips/ffmpeg here on a cluster image."""
    raise NotImplementedError(
        "image/audio codecs are not available in this container; "
        "use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes, fmt: str) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes as a uint8 raster."""
    return np.frombuffer(payload, dtype=np.uint8)


def decode_media(media: DataFrame, decode=fake_decode) -> DataFrame:
    """binary payload -> pixel rows: (media_id, pixels, width, height).

    The UDF signature and batch shape are exactly what a real decoder
    needs; only `decode` changes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                decode(p, m["format"]).astype("int32").tolist()
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "pixels": pixels,
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                }
            )

    return media.mapInPandas(
        run, schema="media_id bigint, pixels array<int>, width int, height int"
    )


def extract_features(decoded: DataFrame) -> DataFrame:
    """Per-media pixel statistics (the 'embedding' stand-in): pure
    column expressions over the decoded arrays — JVM-side."""
    px = F.col("pixels")
    as_double = F.transform(px, lambda x: x.cast("double"))
    return decoded.select(
        "media_id",
        F.size(px).alias("n_px"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x) / F.size(px), 6
        ).alias("mean_px"),
        F.array_min(px).alias("min_px"),
        F.array_max(px).alias("max_px"),
    )


def resize(decoded: DataFrame, factor: int) -> DataFrame:
    """Stub resize: keep every `factor`-th pixel (a real implementation
    swaps in cv2/PIL inside decode_media's pass instead)."""
    return decoded.select(
        "media_id",
        F.filter(
            F.transform(F.col("pixels"), lambda x, i: F.when(i % factor == 0, x)),
            lambda x: x.isNotNull(),
        ).alias("pixels"),
        (F.col("width") / factor).cast("int").alias("width"),
        "height",
    )


def frame_sample(media: DataFrame, frame_bytes: int = 4, every: int = 2) -> DataFrame:
    """Video-style frame sampling: treat the payload as concatenated
    fixed-size frames, emit every `every`-th frame (1->N explode inside
    one Arrow pass)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_fi, out_frame = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                frames = [
                    p[i : i + frame_bytes] for i in range(0, len(p), frame_bytes)
                ]
                for fi in range(0, len(frames), every):
                    out_id.append(mid)
                    out_fi.append(fi)
                    out_frame.append(frames[fi])
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_fi, "frame": out_frame}
            )

    return media.mapInPandas(run, schema="media_id bigint, frame_idx int, frame binary")


@query(
    "multimodal_pixel_stats",
    oracle="""
    WITH h AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT media_id,
             [('0x' || substr(hx, i * 2 - 1, 2))::INT FOR i IN generate_series(1, 16)] AS bytes
      FROM h
    )
    SELECT media_id,
           len(bytes) AS n_px,
           ROUND(CAST(list_sum(bytes) AS DOUBLE) / len(bytes), 6) AS mean_px,
           list_min(bytes) AS min_px,
           list_max(bytes) AS max_px
    FROM b
    """,
)
def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: synthesize binary media -> Arrow decode
    pass -> columnar feature extraction. The oracle recomputes the same
    byte statistics from the md5 hex directly."""
    t = load_tables(spark, sf_dir)
    return extract_features(decode_media(make_media_table(t["documents"])))


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents)
    SELECT media_id, fi AS frame_idx,
           upper(substr(hx, fi * 8 + 1, 8)) AS frame_hex
    FROM m, (SELECT CAST(unnest([0, 2]) AS INT) AS fi)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling plumbing end-to-end: 16-byte payload = four
    4-byte 'frames', keep every 2nd (indices 0 and 2). The oracle slices
    the same bytes with substring. The frame is emitted as hex (the
    driver's pandas canonicalizer can't sort raw binary); the in-engine
    frame_sample() still yields true binary for downstream processing."""
    t = load_tables(spark, sf_dir)
    sampled = frame_sample(make_media_table(t["documents"]), frame_bytes=4, every=2)
    return sampled.select("media_id", "frame_idx", F.hex("frame").alias("frame_hex"))


@query(
    "multimodal_sig_dedup",
    # replay: the same 16-bit mean-threshold signature from the md5 hex
    # bytes, grouped; only signatures shared by >= 2 media ids are dup
    # groups (the pHash-bucket contract)
    oracle="""
    WITH h AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT media_id,
             [('0x' || substr(hx, i * 2 - 1, 2))::INT FOR i IN generate_series(1, 16)] AS bytes
      FROM h
    ),
    sig AS (
      SELECT media_id,
             CAST(list_sum(list_transform(
               list_zip(bytes, generate_series(1, 16)),
               p -> CASE WHEN p[1] * 16 > list_sum(bytes) THEN (1 << (p[2] - 1)) ELSE 0 END
             )) AS INT) AS signature
      FROM b
    )
    SELECT signature, COUNT(*) AS n_media,
           MIN(media_id) AS rep_media_id
    FROM sig GROUP BY 1 HAVING COUNT(*) >= 2
    """,
)
def multimodal_sig_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style media dedup over the binary payloads: the
    decoded raster folds to a 16-bit mean-threshold signature (bit i set
    iff pixel i is above the image mean — the aHash construction, here
    on the deterministic fake raster), and media sharing a signature
    form duplicate groups with a canonical representative. The decode
    is the one Arrow pass (same seam as multimodal_pixel_stats); the
    signature fold, grouping and representative choice are pure JVM.
    At 100 TB only (media_id, 2-byte signature) rows shuffle — payloads
    never leave their executors, the defining property of media dedup
    at scale."""
    t = load_tables(spark, sf_dir)
    decoded = decode_media(make_media_table(t["documents"]))
    px = F.col("pixels")
    # bit i set iff pixels[i] * n > sum(pixels) — integer-exact mean
    # comparison (no float mean for engines to round differently)
    total = F.aggregate(px, F.lit(0), lambda a, x: a + x)
    sig = F.aggregate(
        F.zip_with(
            px,
            F.sequence(F.lit(1), F.size(px)),
            # 2^(i-1) via double pow, exact for i <= 16, cast back to int
            lambda p, i: F.when(
                p * F.size(px) > total,
                F.pow(F.lit(2.0), (i - 1).cast("double")).cast("int"),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    return (
        decoded.select("media_id", sig.alias("signature"))
        .groupBy("signature")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.min("media_id").alias("rep_media_id"),
        )
        .filter(F.col("n_media") >= 2)
    )


@query(
    "multimodal_magic_dispatch",
    # format sniffing by leading byte — the binary-prefix dispatch
    # every media ingest runs before choosing a decoder. The synthetic
    # payload is md5(text) bytes, so the oracle reads the same leading
    # byte straight from the hex.
    oracle="""
    WITH h AS (
      SELECT doc_id AS media_id,
             ('0x' || substr(md5(text), 1, 2))::INT AS b0,
             16 AS n_bytes
      FROM documents
    ),
    c AS (
      SELECT CASE WHEN b0 < 64 THEN 'fmt_a'
                  WHEN b0 < 128 THEN 'fmt_b'
                  WHEN b0 < 192 THEN 'fmt_c'
                  ELSE 'fmt_d' END AS sniffed, n_bytes
      FROM h
    )
    SELECT sniffed, COUNT(*) AS n_payloads,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
    FROM c GROUP BY sniffed
    """,
)
def multimodal_magic_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte format dispatch over binary payloads: the leading
    byte of each payload routes it to a (synthetic) format class, with
    per-class payload counts and byte totals — the sniff-then-dispatch
    step a real media pipeline runs before handing payloads to the
    right decoder (the decoder itself stays behind the documented
    codec seam).

    The leading byte is read with JVM substring+hex+conv on the binary
    column — payloads never leave executors, no Python touches bytes;
    the fold is |formats| cells."""
    t = load_tables(spark, sf_dir)
    media = make_media_table(t["documents"])
    b0 = F.conv(
        F.hex(F.expr("substring(payload, 1, 1)")), 16, 10
    ).cast("int")
    sniffed = (
        F.when(b0 < 64, "fmt_a")
        .when(b0 < 128, "fmt_b")
        .when(b0 < 192, "fmt_c")
        .otherwise("fmt_d")
    )
    return (
        media.select(
            sniffed.alias("sniffed"),
            F.length("payload").alias("n_bytes"),
        )
        .groupBy("sniffed")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Payload byte-entropy screen (hex-nibble resolution) — the cheap
# corruption/degeneracy detector for opaque media columns: encoded
# media reads near-uniform (entropy ~ 4 bits/nibble), stuck or padded
# payloads collapse toward 0. Pure string/arithmetic expressions on
# the hex dump — NO Python in the plan, and the whole screen is
# SQL-replayable (the fake-decode UDF path stays for real pixel ops).
# ---------------------------------------------------------------------------
_HEX_DIGITS = "0123456789ABCDEF"


def _nibble_entropy_sql(h: str, length: str) -> str:
    terms = []
    for d in _HEX_DIGITS:
        c = f"({length} - length(replace({h}, '{d}', '')))"
        p = f"(CAST({c} AS DOUBLE) / {length})"
        terms.append(f"CASE WHEN {c} > 0 THEN -{p} * log2({p}) ELSE 0 END")
    return " + ".join(terms)


def _nibble_entropy_col(h, length):
    total = F.lit(0.0)
    for d in _HEX_DIGITS:
        c = length - F.length(F.regexp_replace(h, d, ""))
        p = c.cast("double") / length
        total = total + F.when(c > 0, -p * F.log2(p)).otherwise(F.lit(0.0))
    return total


@query(
    "multimodal_payload_entropy",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id, 'image' AS media_type,
             upper(md5(text)) AS h
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000, 'audio',
             upper(repeat('00FF', 8))
      FROM documents WHERE doc_id % 10 = 0
    ),
    per AS (
      SELECT media_type,
             ROUND({_nibble_entropy_sql("h", "length(h)")}, 6) AS ent
      FROM media
    )
    SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n_payloads,
           ROUND(CAST(SUM(CAST(ent AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS entropy_mean,
           MIN(ent) AS entropy_min, MAX(ent) AS entropy_max
    FROM per GROUP BY 1 ORDER BY 1
    """,
)
def multimodal_payload_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hex-nibble Shannon entropy per payload, rolled up by media
    type: the synthesized corpus carries md5-digest 'image' payloads
    (near-uniform, entropy pushing 4 bits) and a planted degenerate
    'audio' stripe (repeating 00FF pattern -> exactly 1 bit) — the
    screen separates them by an order of magnitude. Per-payload
    entropy is a fixed 16-term expression over exact character
    counts (rounded at 6 dp before the decimal rollup fold).

    Plan: payloads never leave executors; the hex dump + 16
    replaces + log terms are whole-stage-codegen expressions; output
    is |media_type| rows."""
    docs = load_tables(spark, sf_dir)["documents"]
    image = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.upper(F.md5(F.col("text"))).alias("h"),
    )
    audio = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("media_id"),
        F.lit("audio").alias("media_type"),
        F.upper(F.lit("00FF" * 8)).alias("h"),
    )
    media = image.unionAll(audio)
    ent = F.round(
        _nibble_entropy_col(F.col("h"), F.length(F.col("h"))), 6
    )
    per = media.select("media_type", ent.alias("ent"))
    return (
        per.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
            F.round(
                F.sum(F.col("ent").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("entropy_mean"),
            F.min("ent").alias("entropy_min"),
            F.max("ent").alias("entropy_max"),
        )
        .orderBy("media_type")
    )
