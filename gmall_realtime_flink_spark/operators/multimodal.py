"""Multimodal column plumbing (beyond-reference).

Images/audio/video are opaque `binary` columns with typed metadata
structs; decode / feature-extraction runs as Arrow-batched
`mapInPandas` so bytes never round-trip through per-row Python
pickling. The actual media decoding is STUBBED (`decode_media` raises
— PIL/cv2/torchaudio are not in this container); `extract_features`
is the same plumbing with a deterministic byte-level "decode", so the
Spark-side schema, batching, and UDF signature are real and tested.

Scale notes: binary payloads ride the columnar scan (parquet BYTE_ARRAY
with dictionary off); `mapInPandas` streams Arrow record batches, so
peak memory per task is one batch (`spark.sql.execution.arrow.
maxRecordsPerBatch`), not the partition; feature extraction is a
narrow transform — no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes int, first_cp int, payload_md5 string"


def attach_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stage a binary payload column + typed metadata struct (the shape
    a real image/audio table would have; here the bytes are the utf-8
    text so every downstream value is oracle-checkable)."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("meta"),
    )


def decode_media(payload: bytes) -> object:
    """Real media decode (image/audio frame extraction). Requires
    PIL / cv2 / torchaudio — not available in this container."""
    raise NotImplementedError(
        "media decoding libraries are not installed; use "
        "extract_features() for the deterministic byte-level pipeline"
    )


def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "first_cp": pdf["payload"]
                .map(lambda b: ord(b.decode("utf-8")[0]) if len(b) else -1)
                .astype("int32"),
                "payload_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
        )


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    return with_payload.mapInPandas(_features, schema=FEATURE_SCHEMA)
