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


def uniform_sample_k(
    df: DataFrame, id_col: str, k: int
) -> DataFrame:
    """Exactly-k uniform sample without replacement, content-stable:
    the k rows with the smallest md5(id) — the deterministic
    equivalent of reservoir sampling (bottom-k / KMV sampling). A
    reservoir is arrival-order-dependent and therefore not
    reproducible across engines, retries, or partitionings; ranking
    by a content hash gives the same statistical guarantee (md5 is a
    uniform random permutation of the ids) with a bit-stable result.

    Plan: orderBy(hash) + limit(k) compiles to TakeOrderedAndProject
    — each task keeps a k-row heap, the driver merges |tasks| heaps;
    no global sort, no full shuffle, O(k) memory anywhere. At 100 TB
    this is THE way to cut a uniform eval slice: one scan, k rows
    out. (Append new data later and the bottom-k of the union is
    still a uniform sample of the whole — KMV composability.)
    """
    h = F.md5(F.col(id_col).cast("string")).alias("__h")
    return (
        df.select("*", h)
        .orderBy("__h", id_col)
        .limit(k)
        .drop("__h")
    )


def systematic_sample_by_weight(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    buckets: int = 256,
) -> DataFrame:
    """Deterministic probability-proportional-to-size sampling: lay all
    rows on a cumulative weight axis (token counts, byte sizes) in
    content-stable md5 order and keep each row whose weight interval
    [cum_before, cum_before + w) crosses a stride boundary, stride =
    total/k — classic systematic PPS sampling, ~k rows out, heavy rows
    proportionally more likely, reproducible on any engine and
    partitioning.

    The prefix sum is distributed, never a global window:
    1. bucket = floor(first-md5-byte · buckets / 256) (monotone in the
       hash prefix, so bucket order equals global hash-order prefix
       and per-bucket cumsums + bucket offsets compose into the exact
       global prefix sum); `buckets` <= 256 tunes the parallel fan-out
       vs per-bucket window size;
    2. per-bucket totals aggregate map-side (<= `buckets` groups), and
       their running offsets are a window over those rows ONLY (a
       single-partition window over `buckets` rows is metadata-sized
       at any corpus scale — the data never passes through it);
    3. offsets broadcast-join back; the per-row window partitions by
       bucket — `buckets`-way parallel, each window sees
       |corpus|/buckets rows.

    Selection arithmetic is all-integer (`(cum*k) div total`), so no
    float stride boundary can disagree between engines. Weights must
    be integral and non-negative. The selected set is invariant to
    `buckets` (bucketing only decomposes the one global prefix sum).
    """
    from pyspark.sql import Window

    if not 1 <= buckets <= 256:
        raise ValueError(
            f"buckets must be in 1..256 (one md5 byte), got {buckets}"
        )
    h = F.md5(F.col(id_col).cast("string"))
    rows = df.select(
        id_col,
        F.col(weight_col).cast("long").alias("__w"),
        h.alias("__h"),
        (
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
            * buckets
            / 256
        )
        .cast("int")
        .alias("__b"),
    )
    per_bucket = rows.groupBy("__b").agg(F.sum("__w").alias("__bw"))
    off_win = (
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "__b",
        F.coalesce(F.sum("__bw").over(off_win), F.lit(0)).alias("__off"),
        F.sum("__bw").over(
            Window.orderBy("__b").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__total"),
    )
    row_win = (
        Window.partitionBy("__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = rows.join(F.broadcast(offsets), "__b").select(
        id_col,
        "__w",
        (
            F.col("__off")
            + F.coalesce(F.sum("__w").over(row_win), F.lit(0))
        ).alias("__cb"),
        "__total",
    )
    return cum.filter(
        F.expr(f"(__cb * {k}) div __total")
        < F.expr(f"((__cb + __w) * {k}) div __total")
    ).select(id_col, F.col("__w").alias("weight"), F.col("__cb").alias("cum_before"))


def quality_tiers(
    scored: DataFrame,
    score_col: str = "score",
    id_col: str = "doc_id",
    tiers: int = 4,
    buckets: int = 256,
) -> DataFrame:
    """Exact global quantile-tier assignment (curriculum / mixture
    construction: "train on the top quartile first", "cap tier-4 at
    N tokens") without a global sort or single-partition window.

    tier = ((global_rank − 1) · tiers) div N + 1 over the
    (score, id) order — the NTILE definition, computed exactly:
    1. quantize the score to `buckets` range cells
       (floor(score·buckets), clamped) — monotone in score, so
       (cell, score, id) order equals (score, id) order;
    2. per-cell counts aggregate map-side; their running offsets are
       a window over ≤`buckets` metadata rows ONLY (the corpus never
       passes through a single partition);
    3. offsets broadcast back; per-row rank is a window PARTITIONED
       by cell — `buckets`-way parallel — plus the cell offset.
    All tier arithmetic is integer (div), so no float boundary can
    disagree between engines; scores must lie in [0, 1].
    """
    from pyspark.sql import Window

    from gmall_realtime_flink_spark.operators.lineage import cut_lineage

    cell = F.least(
        F.lit(buckets - 1),
        F.floor(F.col(score_col) * buckets).cast("int"),
    )
    # r14: lazy lineage cut — `w` feeds both the per-cell count agg
    # and the rank join probe, so the whole upstream scoring pipeline
    # (e.g. doc_common_token_score's explode + window) executed twice
    # per action (guide §5); the cut frame is narrow (id, score, cell)
    w = cut_lineage(
        scored.select(id_col, score_col).withColumn("__cell", cell)
    )
    per_cell = w.groupBy("__cell").agg(F.count(F.lit(1)).alias("__bc"))
    off_win = Window.orderBy("__cell").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = per_cell.select(
        "__cell",
        F.coalesce(F.sum("__bc").over(off_win), F.lit(0)).alias("__off"),
    )
    # N derives from the same <=`buckets`-row metadata — a third
    # corpus-scale pass over the scored lineage just to count rows
    # would re-execute the whole upstream pipeline
    total = per_cell.agg(F.sum("__bc").cast("long").alias("__n"))
    rk_win = Window.partitionBy("__cell").orderBy(score_col, id_col)
    return (
        w.join(F.broadcast(offs), "__cell")
        .withColumn("__rk", F.row_number().over(rk_win) + F.col("__off"))
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            score_col,
            (F.expr(f"((__rk - 1) * {tiers}) DIV __n") + F.lit(1)).alias(
                "tier"
            ),
        )
    )
