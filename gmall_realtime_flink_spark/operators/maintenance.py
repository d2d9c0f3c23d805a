"""Storage-layout maintenance: compaction and sort-clustering.

At 100 TB the table layout is a first-class operator: streaming sinks
(`streaming/sinks.py`) produce one file per micro-batch per partition,
and a month of micro-batches turns every downstream scan into a
small-files metadata storm. The reference outsources this to HBase /
ClickHouse internals (their own compactions); a lake-format deployment
(parquet dirs here, Delta/Iceberg in production) schedules these two
rewrites instead:

- `compact_parquet`: N small files → ceil(bytes / target) right-sized
  files. Uses `coalesce` when shrinking (no shuffle — each output task
  concatenates input splits) and falls back to a round-robin
  `repartition` only when growing the file count.
- `clustered_write`: range-partition + sort on a clustering key before
  writing, so every parquet row-group carries a tight min/max band on
  that key and point/range scans prune files AND row groups via
  statistics alone (one key — a plain range cluster is optimal there).
- `zorder_write`: the multi-column layout — Morton-interleave the
  clustering columns (pure JVM bit expressions), range-sort on the
  z-value, so narrow predicates on ANY clustered column skip files
  (Delta/Iceberg `OPTIMIZE ZORDER BY` semantics on plain parquet).
"""

from __future__ import annotations

import glob
import math
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_bytes(path: str) -> int:
    """Recursive byte count — partitioned layouts keep their files in
    `key=value/` subdirectories, so a top-level-only glob would read 0
    and mis-size the compaction."""
    return sum(
        os.path.getsize(p)
        for p in glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
    )


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 << 20,
    partition_cols: tuple[str, ...] = (),
) -> int:
    """Rewrite `src_dir` into ceil(total/target) files at `dst_dir`;
    returns the file count. Deterministic: the count derives from the
    source byte size, not cluster state. For a hive-partitioned source
    pass `partition_cols` so the layout is PRESERVED on rewrite (the
    count then bounds files per partition); omitting it on a
    partitioned dir flattens the layout into plain files."""
    total = dir_bytes(src_dir)
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_dir)
    # estimate the scan's partition count from file metadata (driver-
    # side listing already done for dir_bytes) instead of touching
    # df.rdd — the RDD conversion materializes a deserialized plan
    # just to read one number. A compaction shrinks by construction
    # whenever the source has more files than the target count;
    # maxPartitionBytes only merges further.
    src_files = len(df.inputFiles())
    out = df.coalesce(n) if n <= src_files else df.repartition(n)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dst_dir)
    return n


def clustered_write(
    df: DataFrame,
    dst_dir: str,
    cluster_col: str,
    n_files: int = 8,
    rows_per_group: int = 5000,
) -> None:
    """Range-partition on `cluster_col` and sort within partitions
    before writing: each output file (and each row-group inside it)
    covers a disjoint key band, so min/max statistics prune scans.
    `rows_per_group` keeps row-groups small enough that intra-file
    pruning is observable in tests; production uses the 128 MB
    default."""
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .option("parquet.block.size", str(rows_per_group * 64))
        .parquet(dst_dir)
    )


def zorder_value(cols: Sequence[str | Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of N numeric columns, as pure JVM
    expressions (shiftleft/or folds — codegen-friendly, zero Python).

    Each column is rank-insensitive-quantized by the caller (pass
    already-scaled non-negative ints, e.g. `ntile` buckets or raw ids
    clipped to `bits`); bit i of column j lands at position
    i*N + j of the z-value. Rows close in EVERY dimension get close
    z-values, so a z-sorted layout gives multi-column min/max pruning
    where a single-column sort prunes only its lead column.
    """
    ncols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(ncols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(ncols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_write(
    df: DataFrame,
    dst_dir: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 16,
    rows_per_group: int = 5000,
) -> None:
    """Z-order-clustered parquet layout over multiple columns: compute
    the Morton value, range-partition and sort on it, drop it before
    writing. The Delta/Iceberg `OPTIMIZE ZORDER BY` layout expressed
    as plain Spark — each file covers a compact hyper-rectangle of the
    key space, so point/range predicates on ANY of the z-columns skip
    most files via footer min/max stats (pinned by
    test_zorder_prunes_on_both_columns)."""
    z = df.withColumn("__z", zorder_value(list(cols), bits))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("parquet.block.size", str(rows_per_group * 64))
        .parquet(dst_dir)
    )


def retention_purge(
    base_dir: str, keep: int, partition_prefix: str = "dt="
) -> list[str]:
    """Drop date partitions beyond the newest `keep` (retention policy
    for the date-partitioned fact layout `partition_pruning` tests):
    returns the purged partition names. Pure directory surgery — the
    hive layout makes retention an O(|partitions|) metadata operation,
    never a data rewrite; readers see partition-level atomicity (a
    partition is either listed or gone)."""
    import shutil

    parts = sorted(
        d
        for d in os.listdir(base_dir)
        if d.startswith(partition_prefix)
        and os.path.isdir(os.path.join(base_dir, d))
    )
    purged = parts[:-keep] if keep > 0 else parts
    for d in purged:
        shutil.rmtree(os.path.join(base_dir, d))
    return purged
