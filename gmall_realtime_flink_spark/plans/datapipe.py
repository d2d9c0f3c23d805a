"""Large-scale training-data pipeline queries (beyond the reference):
dedup, similarity search, text analysis, multimodal — over the
`documents` and `embeddings` tables.

Cross-engine determinism: every hash is md5 (identical hex in Spark
and DuckDB); every float output is rounded; minhash "min" is taken
over md5 hex STRINGS (lexicographic order is identical in both
engines), so no engine-specific 64-bit hash is ever compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.catalog import load
from gmall_realtime_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Dedup: exact
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS dup_ct
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on content, keep lowest doc_id as "
    "representative. At 100 TB: single shuffle on a 128-bit hash — "
    "uniformly distributed, skew-free by construction.",
    headline=True,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("dup_ct")
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
    doc="Document fingerprint: md5 over whitespace-normalized lowercase "
    "text (content-defined identity for incremental dedup).",
    tags=("text",),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))


@register(
    "doc_token_count",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
           len(list_filter(regexp_split_to_array(text, '\\s+'), x -> length(x) > 0))
             AS n_ws_tokens
    FROM documents
    """,
    doc="Token counting: whitespace tokens + a BPE-ish lexical regex "
    "(letters / digits / single punctuation) — all JVM-side regex, "
    "no Python in the hot path.",
    tags=("text",),
)
def doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bpe_pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    ws_tokens = F.filter(F.split(F.col("text"), r"\s+"), lambda x: F.length(x) > 0)
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(bpe_pat), 0)).alias(
            "n_tokens"
        ),
        F.size(ws_tokens).alias("n_ws_tokens"),
    )
