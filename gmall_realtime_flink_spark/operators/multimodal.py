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
    # The Python kernel computes ONLY what the JVM can't (here
    # `first_cp`, the stand-in for a real codec decode); n_bytes and
    # payload_md5 arrive pre-computed by JVM expressions and pass
    # through the Arrow batch untouched.
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["n_bytes"],
                # NULL payload (undecodable media) -> NULL feature;
                # empty payload -> -1, mirroring DuckDB's unicode('').
                # Nullable Int32 so Arrow carries the NA as a real null.
                "first_cp": pdf["payload"]
                .map(
                    lambda b: None
                    if b is None
                    else (ord(b.decode("utf-8")[0]) if len(b) else -1)
                )
                .astype("Int32"),
                "payload_md5": pdf["payload_md5"],
            }
        )


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Split by capability: byte length and content hash are pure JVM
    (`F.length` / `F.md5` on BinaryType — codegen'd, no Arrow
    transfer cost for their compute); only the decode-requiring
    feature (`first_cp`) runs in the Pandas kernel."""
    staged = with_payload.select(
        "doc_id",
        F.length("payload").cast("int").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        "payload",
    )
    return staged.mapInPandas(_features, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off int, frame_md5 string"
FRAME_W = 16  # frame window (chars of the fake byte stream)
FRAME_N = 4  # frames sampled per payload


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # evenly-spaced deterministic offsets — the video frame-sampling
    # access pattern (seek N keyframes) without a real codec
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                # NULL payload: keep the 1->FRAME_N fan-out shape.
                # Offsets degrade like an empty stream (span 0 ->
                # off 1 — DuckDB's greatest() IGNORES the NULL length,
                # giving the same), hashes are NULL (md5(NULL)).
                for i in range(FRAME_N):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(1)
                    out["frame_md5"].append(None)
                continue
            text = bytes(payload).decode("utf-8")
            span = max(len(text) - FRAME_W, 0)
            for i in range(FRAME_N):
                off = 1 + (i * span) // (FRAME_N - 1)
                frame = text[off - 1 : off - 1 + FRAME_W]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_off"].append(off)
                out["frame_md5"].append(
                    hashlib.md5(frame.encode("utf-8")).hexdigest()
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_off": pd.Series(out["frame_off"], dtype="int32"),
                "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
            }
        )


def sample_frames(with_payload: DataFrame) -> DataFrame:
    """Frame sampling over a media payload: one input row fans out to
    FRAME_N frame rows (seek-to-keyframe pattern). Real decoding would
    replace the char-window fake inside `_sample_frames` (the
    `decode_media` stub); the Spark plumbing — Arrow batching, 1→N row
    fan-out inside mapInPandas, typed frame schema — is the production
    shape either way."""
    return with_payload.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)
