"""Deterministic sampling / splitting / normalization operators for
training-data pipelines (beyond-reference components; the reference
has no corpus-preparation surface).

Everything keys off md5 of the row's natural id — a content-stable
hash, so splits are reproducible across runs, engines, partitionings,
and scale factors (the property a training pipeline needs: re-running
ingest never moves a document between train and test). No `rand()`,
no `sample()` — those are partitioning-dependent in Spark.

Cross-engine determinism: the bucket is the integer value of the
first two hex chars of md5(id) (0..255), computable bit-identically
in DuckDB via char arithmetic — no engine-specific 64-bit hash.

Scale: all three operators are narrow per-row transforms (JVM
codegen, zero shuffles, zero Python); filters sit directly on the
scan so column pruning and predicate pushdown apply.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, buckets: int = 256) -> Column:
    """Deterministic bucket in [0, buckets): int(md5(id)[:2], 16) scaled.

    Uses only the first byte of the digest when buckets <= 256 (the
    common case); uniform because md5 bytes are uniform.
    """
    byte = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 2), 16, 10).cast(
        "long"
    )
    return (byte % buckets).alias("bucket")


def train_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Stamp a deterministic train/val/test split column.

    Buckets 0..255 from the id hash; [0, test) -> test,
    [test, test+val) -> val, rest -> train (percent-of-256 cutoffs,
    exact integer arithmetic — no float thresholds to drift between
    engines).
    """
    test_hi = 256 * test_pct // 100
    val_hi = test_hi + 256 * val_pct // 100
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(b < test_hi, "test").when(b < val_hi, "val").otherwise("train"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, int],
    id_col: str = "doc_id",
    default_rate: int = 256,
) -> DataFrame:
    """Deterministic per-stratum downsample: keep a row iff its hash
    bucket < the stratum's rate (out of 256). `rates` maps stratum
    value -> kept buckets, e.g. {"en": 64} keeps ~25% of English docs.

    The per-stratum rate is folded into one `when` chain on the scan —
    no join against a rates table needed for a handful of strata (for
    thousands of strata, broadcast-join a rates DataFrame instead).
    """
    rate = F.lit(default_rate)
    expr = None
    for k, v in sorted(rates.items()):
        cond = F.col(strata_col) == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    rate = expr.otherwise(default_rate) if expr is not None else rate
    return df.filter(hash_bucket(F.col(id_col)) < rate)


def normalize_text(text_col: Column) -> Column:
    """Canonical text form for exact dedup / fingerprinting: lowercase,
    every non-alphanumeric run collapsed to one space, trimmed.

    Pure JVM regex (no Python); identical semantics to DuckDB's
    regexp_replace(..., 'g') so the oracle is a transliteration.
    """
    return F.trim(F.regexp_replace(F.lower(text_col), "[^a-z0-9]+", " "))
