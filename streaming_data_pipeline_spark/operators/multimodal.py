"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lake as `binary` columns with a
typed metadata struct; decode/feature-extraction runs as Arrow-batched
`mapInPandas` so each Python worker sees columnar batches, never rows.
The image/audio codec libraries are NOT in this container, so the
decode kernel is stubbed behind `DECODERS` — the Spark-side contract
(schema, batch iteration, partition sizing) is real and tested; a real
decoder (PIL/torchaudio/ffmpeg) drops into the same slot on a cluster.

Scale notes: binary blobs dominate row width, so operators here avoid
shuffling blobs — metadata extraction is a map-only pass, and any
grouping happens on the extracted (narrow) features.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _decode_stub(blob: bytes, media_type: str) -> dict:
    """Deterministic fake decoder. A real implementation (PIL, ffmpeg,
    torchaudio) replaces this function only — the Spark plumbing is
    unchanged. Raises for unknown media types like a real codec would."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    n = len(blob)
    if media_type == "image":
        return {"width": 64 + n % 512, "height": 64 + (n // 7) % 512, "duration_ms": None}
    return {"width": None, "height": None, "duration_ms": 1000 + (n % 60000)}


DECODERS = {"stub": _decode_stub}


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test/bench helper: synthesize an opaque binary column + media type
    from existing data (UTF-8 bytes of the text). In production this
    column arrives from the source (e.g. object-store pointers resolved
    by a scan-side fetch)."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return df.withColumn("blob", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", mt
    )


def binary_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata over binary payloads: byte length + content
    hash — no Python, no decode. The cheap first pass that dedups/
    filters blobs BEFORE any expensive decode."""
    return df.select(
        "doc_id",
        "media_type",
        F.octet_length(F.col("blob")).cast("long").alias("byte_len"),
        F.sha2(F.col("blob"), 256).alias("sha"),
    )


def extract_media_metadata(df: DataFrame, decoder: str = "stub") -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas. Failed
    decodes are captured per row (decode_ok/decode_error), not thrown —
    the DLQ philosophy (reference: src/transform.py:79-101, T4 — failed
    rows don't kill the batch)."""
    decode = DECODERS[decoder]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["blob"], pdf["media_type"]):
                rec = {
                    # pd.isna, not `is None`: Arrow surfaces a null int64
                    # as float NaN in pandas, and int(NaN) raises
                    "doc_id": None if pd.isna(doc_id) else int(doc_id),
                    "media_type": mt,
                    "byte_len": None,
                    "sha": None,
                    "width": None,
                    "height": None,
                    "duration_ms": None,
                    "decode_ok": True,
                    "decode_error": None,
                }
                # EVERYTHING per-row inside the tolerance boundary: a null
                # blob (deletes carry null content) made bytes(None) raise
                # OUTSIDE the old try, killing the whole task instead of
                # marking one row decode_ok=False
                try:
                    b = bytes(blob)
                    rec["byte_len"] = len(b)
                    rec["sha"] = hashlib.sha256(b).hexdigest()
                    rec.update(decode(b, mt))
                except Exception as e:  # row-level tolerance, not batch-fatal
                    rec["decode_ok"] = False
                    rec["decode_error"] = f"{type(e).__name__}: {e}"
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META.fields])

    return df.select("doc_id", "blob", "media_type").mapInPandas(kernel, MEDIA_META)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: expands each video into
    (doc_id, frame_ts_ms) tasks via sequence/explode — the decode of
    each frame is the stubbed kernel above. Demonstrates the fan-out
    shape without the codec."""
    # filter on the cheap column BEFORE the Python decode kernel: the
    # corpus is mostly images/audio, and decoding rows only to discard
    # them paid ~3x the necessary kernel cost
    meta = extract_media_metadata(df.filter(F.col("media_type") == "video"))
    vids = meta.filter(F.col("decode_ok"))
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
