"""Multimodal-column operators: opaque binary payloads + typed metadata,
decoded via Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column next to typed metadata columns, keep it opaque to the
relational plan (filter/join/prune on metadata WITHOUT touching bytes),
and cross into Python only for the decode step — one Arrow batch at a
time, never one row at a time.

Real image/audio codecs (PIL, torchvision, ffmpeg) are NOT installed in
this environment, so the codec call itself is a clearly-marked stub
(``decode_image``/``decode_audio`` below raise NotImplementedError). The
Spark-side plumbing — binary schema, mapInPandas signature, Arrow batch
shape, multi-row frame expansion — is real and oracle-checked by driving
a DETERMINISTIC fake decode (header arithmetic over the payload bytes)
that DuckDB can reproduce from the source text.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from spark_ml_helper_spark.registry import query
from spark_ml_helper_spark.sources.parquet import table

# ---------------------------------------------------------------------------
# Codec stubs — the real decode path, gated off because the libs aren't in
# this container. Swap the body for PIL/soundfile/ffmpeg in production; the
# mapInPandas plumbing above them does not change.
# Environment probes (PIL/soundfile/cv2/librosa/imageio/av all absent):
# rounds 2, 3, and 4 (2026-08-14) — stubs remain the correct call.


def decode_image(payload: bytes):
    """STUB: decode an encoded image payload to (height, width, channels,
    pixel array). Requires PIL/opencv — not installed here."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_image_meta() for the deterministic test decode"
    )


def decode_audio(payload: bytes):
    """STUB: decode an audio payload to (sample_rate, samples). Requires
    soundfile/ffmpeg — not installed here."""
    raise NotImplementedError(
        "audio codecs are not available in this environment; "
        "the frame-sampling plumbing is exercised by mm_frame_sample"
    )


def fake_image_meta(payload: bytes) -> dict:
    """Deterministic fake decode: byte-arithmetic 'header parse' standing in
    for a real codec. Pure function of the payload bytes → reproducible in
    SQL for the oracle."""
    n = len(payload)
    s = sum(payload) % 2147483648
    return {
        "n_bytes": n,
        "byte_sum": s,
        "width": (s % 64) + 1,
        "height": (n % 64) + 1,
    }


_FORMATS = ["png", "jpeg", "webp"]


@query(
    "mm_image_features",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS fmt,
                   octet_length(encode(text)) AS n_bytes,
                   CAST(list_sum(list_transform(split(text, ''), c -> ascii(c))) AS BIGINT) % 2147483648 AS byte_sum
            FROM documents
        )
        SELECT doc_id, fmt, n_bytes, byte_sum,
               CAST((byte_sum % 64) + 1 AS INTEGER) AS width,
               CAST((n_bytes % 64) + 1 AS INTEGER) AS height,
               CAST(((byte_sum % 64) + 1) * ((n_bytes % 64) + 1) AS BIGINT) AS n_pixels
        FROM b
    """,
    family="multimodal",
)
def mm_image_features(spark, sf_dir):
    """Image feature extraction over a binary payload column via
    mapInPandas: build (payload binary, fmt string) — the multimodal
    storage shape — then decode each Arrow batch in Python. The decode here
    is the deterministic fake (fake_image_meta); a real codec drops into
    the same iterator without touching the plan. Partition-parallel,
    shuffle-free; payload bytes cross to Python once, Arrow-batched."""
    d = table(spark, sf_dir, "documents")
    src = d.select(
        "doc_id",
        F.element_at(F.array(*[F.lit(f) for f in _FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("fmt"),
        F.col("text").cast("binary").alias("payload"),
    )

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_image_meta(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "fmt": pdf["fmt"].values,
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "byte_sum": [m["byte_sum"] for m in metas],
                    "width": pd.Series([m["width"] for m in metas], dtype="int32"),
                    "height": pd.Series([m["height"] for m in metas], dtype="int32"),
                    "n_pixels": [m["width"] * m["height"] for m in metas],
                }
            )

    return src.mapInPandas(
        decode_batch,
        schema=(
            "doc_id bigint, fmt string, n_bytes bigint, byte_sum bigint, "
            "width int, height int, n_pixels bigint"
        ),
    )


@query(
    "mm_audio_features",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS n_samples,
                   CAST(list_sum(list_transform(split(text, ''), c -> ascii(c))) AS BIGINT) AS amp_sum,
                   CAST(list_max(list_transform(split(text, ''), c -> ascii(c))) AS INTEGER) AS peak_amp
            FROM documents
        )
        SELECT doc_id, n_samples, peak_amp,
               CAST(floor(amp_sum / n_samples) AS INTEGER)       AS mean_amp,
               round(n_samples / 8000.0, 6)                      AS duration_s
        FROM b
    """,
    family="multimodal",
)
def mm_audio_features(spark, sf_dir):
    """Audio feature extraction over a binary payload via mapInPandas:
    the payload is treated as 8-bit PCM at a fixed 8 kHz rate (chosen so
    n/8000 = n·125/10⁶ sits EXACTLY on the 6-decimal grid — at 16 kHz odd
    sample counts tie at the 7th decimal and the engines' rounding modes
    diverge) and the
    'decode' computes sample count, peak/mean amplitude, and duration —
    a deterministic numpy stand-in for decode_audio() (soundfile/ffmpeg
    not installed; swap the body, keep the plumbing). Feature math runs
    vectorized on the Arrow batch (np.frombuffer over all payloads), the
    shape a real DSP feature extractor (RMS, spectral centroid) takes."""
    import numpy as np

    d = table(spark, sf_dir, "documents")
    src = d.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rate = 8000.0
        for pdf in batches:
            ns, peaks, means = [], [], []
            for p in pdf["payload"]:
                samples = np.frombuffer(bytes(p), dtype=np.uint8)
                ns.append(len(samples))
                peaks.append(int(samples.max()) if len(samples) else 0)
                means.append(int(samples.sum() // len(samples)) if len(samples) else 0)
            ns_arr = pd.Series(ns, dtype="int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_samples": ns_arr,
                    "peak_amp": pd.Series(peaks, dtype="int32"),
                    "mean_amp": pd.Series(means, dtype="int32"),
                    "duration_s": (ns_arr / rate).round(6),
                }
            )

    return src.mapInPandas(
        decode_batch,
        schema="doc_id bigint, n_samples bigint, peak_amp int, mean_amp int, duration_s double",
    )


@query(
    "mm_frame_sample",
    oracle="""
        SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
               lower(hex(encode(substr(text, CAST(i * 32 + 1 AS INTEGER), 16)))) AS frame_hex
        FROM documents, range(0, 100000) r(i)
        WHERE i * 32 + 16 <= n_chars
    """,
    family="multimodal",
)
def mm_frame_sample(spark, sf_dir):
    """Frame sampling from a binary 'video' payload via mapInPandas:
    every 32nd byte offset yields one 16-byte frame → N output rows per
    input row (the decode-then-explode shape of video pipelines). The
    frame extraction is real byte slicing in Python over Arrow batches;
    only the codec call is faked (frames are raw slices, hex-encoded).
    Per-partition expansion, no shuffle."""
    d = table(spark, sf_dir, "documents")
    src = d.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stride, frame_len = 32, 16
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                k = 0
                while k * stride + frame_len <= len(raw):
                    ids.append(doc_id)
                    frame_nos.append(k)
                    frames.append(raw[k * stride : k * stride + frame_len].hex())
                    k += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(frame_nos, dtype="int32"),
                    "frame_hex": pd.Series(frames, dtype="object"),
                }
            )

    return src.mapInPandas(sample_frames, schema="doc_id bigint, frame_no int, frame_hex string")


@query(
    "mm_payload_stats",
    oracle="""
        WITH b AS (
            SELECT CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                   ELSE 'webp' END AS fmt,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        )
        SELECT fmt,
               CAST(count(*) AS BIGINT) AS n_payloads,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               CAST(min(n_bytes) AS BIGINT) AS min_bytes,
               CAST(max(n_bytes) AS BIGINT) AS max_bytes,
               round(quantile_cont(n_bytes, 0.5), 6) AS p50_bytes
        FROM b GROUP BY fmt
    """,
    family="multimodal",
)
def mm_payload_stats(spark, sf_dir):
    """Metadata-only payload audit: per-format counts and byte-size
    distribution over the binary column — computed WITHOUT the payload
    ever crossing to Python (octet_length is a JVM-side function on
    the binary column). This is the posture that makes multimodal
    storage viable at 100 TB: plan-level pruning and stats on
    metadata, with the expensive decode (mm_image_features'
    mapInPandas) reserved for rows that survive filtering. One hash
    agg on the 3-key format space; exact integers plus an exact-input
    percentile interpolation."""
    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.element_at(
            F.array(*[F.lit(f) for f in _FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("fmt"),
        F.octet_length(F.col("text").cast("binary")).alias("n_bytes"),
    )
    return src.groupBy("fmt").agg(
        F.count("*").alias("n_payloads"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").cast("bigint").alias("min_bytes"),
        F.max("n_bytes").cast("bigint").alias("max_bytes"),
        F.round(F.percentile("n_bytes", 0.5), 6).alias("p50_bytes"),
    )
