"""Storage-layout maintenance: compaction + clustering, verified at
the filesystem level (file counts, parquet row-group statistics)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.catalog import load
from gmall_realtime_flink_spark.operators.maintenance import (
    clustered_write,
    compact_parquet,
)


def test_compact_parquet_shrinks_file_count(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # simulate a streaming sink's small-files output: 64 shards
    load(spark, sf_dir, "events").repartition(64).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 64

    n = compact_parquet(spark, src, dst, target_bytes=1 << 30)
    files = glob.glob(os.path.join(dst, "*.parquet"))
    assert n == 1 and len(files) == 1
    assert (
        spark.read.parquet(dst).count()
        == load(spark, sf_dir, "events").count()
    )


def test_clustered_write_bounds_rowgroup_ranges(spark, sf_dir, tmp_path):
    """After clustering on user_id, a point-lookup band intersects few
    files: every file covers a disjoint user_id range (vs. every file
    covering the whole range in arrival order)."""
    dst = str(tmp_path / "clustered")
    events = load(spark, sf_dir, "events").select("user_id", "event_type")
    clustered_write(events, dst, "user_id", n_files=8)

    files = sorted(glob.glob(os.path.join(dst, "*.parquet")))
    assert len(files) >= 4  # range partitioner may merge tiny bands
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    # disjoint bands: each file's max stays below the next file's min
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b

    # and Spark's scan prunes: a one-user filter reads back correctly
    # through the pruned layout (correctness of the rewrite)
    one = spark.read.parquet(dst).filter(F.col("user_id") == 13)
    want = events.filter(F.col("user_id") == 13)
    assert one.count() == want.count()


def test_dim_schema_evolution_merge(spark, sf_dir, tmp_path):
    """A dim table written before a column was added still reads with
    the evolved schema: mergeSchema unifies old and new parquet
    footers, old rows surface NULL for the new column — the CDC dim
    upsert path survives upstream DDL without a rewrite."""
    dst = str(tmp_path / "dim_user")
    v1 = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "user_id BIGINT, name STRING"
    )
    v1.write.parquet(dst)
    v2 = spark.createDataFrame(
        [(3, "carol", "NATION_7")],
        "user_id BIGINT, name STRING, nation STRING",
    )
    v2.write.mode("append").parquet(dst)

    merged = spark.read.option("mergeSchema", "true").parquet(dst)
    assert set(merged.columns) == {"user_id", "name", "nation"}
    rows = {r["user_id"]: r["nation"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "NATION_7"}


def test_dynamic_partition_overwrite_backfill(spark, sf_dir, tmp_path):
    """Backfill idempotency: with dynamic partitionOverwriteMode, a
    re-run of one day's job overwrites ONLY that day's partition —
    other days' data survives (static mode would truncate the table)."""
    dst = str(tmp_path / "facts")
    events = load(spark, sf_dir, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    days = [r["dt"] for r in events.select("dt").distinct().limit(2).collect()]
    if len(days) < 2:
        import pytest

        pytest.skip("single-day testdata can't exercise cross-day survival")
    d1, d2 = sorted(days)
    events.filter(F.col("dt").isin(d1, d2)).write.partitionBy("dt").parquet(dst)
    before_d2 = spark.read.parquet(dst).filter(F.col("dt") == d2).count()

    with_conf = spark.conf
    old = with_conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    with_conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # backfill day 1 with half its rows (simulates a corrected re-run)
        redo = events.filter(
            (F.col("dt") == d1) & (F.col("event_id") % 2 == 0)
        )
        redo_ct = redo.count()
        redo.write.mode("overwrite").partitionBy("dt").parquet(dst)
    finally:
        with_conf.set("spark.sql.sources.partitionOverwriteMode", old)

    after = spark.read.parquet(dst)
    assert after.filter(F.col("dt") == d1).count() == redo_ct
    assert after.filter(F.col("dt") == d2).count() == before_d2


def test_retention_purge_drops_oldest_partitions(spark, sf_dir, tmp_path):
    from gmall_realtime_flink_spark.operators.maintenance import (
        retention_purge,
    )

    dst = str(tmp_path / "facts")
    events = load(spark, sf_dir, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    events.write.partitionBy("dt").parquet(dst)
    days = sorted(
        d for d in __import__("os").listdir(dst) if d.startswith("dt=")
    )
    if len(days) < 2:
        import pytest

        pytest.skip("single-day testdata")
    purged = retention_purge(dst, keep=1)
    assert purged == days[:-1]
    left = spark.read.parquet(dst).select("dt").distinct().collect()
    # partition discovery infers dt as DATE — compare stringified
    assert {str(r["dt"]) for r in left} == {days[-1].split("=", 1)[1]}


def test_write_training_shards_roundtrips_permutation(spark, sf_dir, tmp_path):
    """The sharded corpus read back per shard, in file row order, must
    reproduce the corpus_shuffle permutation exactly — shard
    assignment, within-shard order, and full coverage."""
    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.packing import (
        corpus_shuffle,
        write_training_shards,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)

    want = {
        (r["shard"], r["pos"]): r["doc_id"]
        for r in corpus_shuffle(docs, n_shards=4).collect()
    }
    import glob

    seen = {}
    for shard_dir in sorted(glob.glob(out + "/shard=*")):
        shard = int(shard_dir.rsplit("=", 1)[1])
        # file row order IS the read order within one shard
        rows = spark.read.parquet(shard_dir).select("pos", "doc_id").collect()
        for r in rows:
            seen[(shard, r["pos"])] = r["doc_id"]
        pos_list = [r["pos"] for r in rows]
        assert sorted(pos_list) == list(range(1, len(pos_list) + 1))
    assert seen == want


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-order layout: footer min/max stats must prune files for a
    narrow predicate on EITHER z-column — the multi-column win a
    single-column range cluster can't give (its non-lead column spans
    the full domain in every file)."""
    from gmall_realtime_flink_spark.operators.maintenance import (
        clustered_write,
        zorder_write,
    )

    df = (
        spark.range(256 * 256)
        .selectExpr(
            "cast(id % 256 as long) AS x",
            "cast(id div 256 as long) AS y",
        )
    )

    def overlapping_files(path, col_idx, lo, hi):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        hit = 0
        for f in files:
            md = pq.read_metadata(f)
            fmin = min(
                md.row_group(i).column(col_idx).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(col_idx).statistics.max
                for i in range(md.num_row_groups)
            )
            if fmax >= lo and fmin <= hi:
                hit += 1
        return hit, len(files)

    zdir = str(tmp_path / "zorder")
    zorder_write(df, zdir, ["x", "y"], n_files=16, bits=8)
    for col in (0, 1):  # x then y: both must prune
        hit, total = overlapping_files(zdir, col, 0, 15)
        assert total >= 8
        assert hit <= total // 2, (col, hit, total)

    # control: single-column cluster on x cannot prune on y
    cdir = str(tmp_path / "xcluster")
    clustered_write(df, cdir, "x", n_files=16)
    hit, total = overlapping_files(cdir, 1, 0, 15)
    assert hit == total  # every file spans the full y domain

    # layout is a permutation, not a filter
    assert spark.read.parquet(zdir).count() == 256 * 256


def test_bucketed_table_rebuilds_on_stale_fingerprint(spark, tmp_path):
    """catalog.bucketed_table must detect a CHANGED source file (size/
    mtime fingerprint) and rebuild instead of serving the stale
    layout; unchanged sources reuse files without rewriting."""
    import shutil
    import time

    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.catalog import bucketed_table

    sf = str(tmp_path)
    spark.range(100).select(
        F.col("id").alias("l_partkey"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.parquet(str(tmp_path / "stage"))
    part = next((tmp_path / "stage").glob("part-*.parquet"))
    shutil.copy(part, tmp_path / "lineitem.parquet")

    t = bucketed_table(spark, sf, "lineitem", ("l_partkey",), n_buckets=4)
    assert t.count() == 100

    # same fingerprint -> reuse (no rebuild): table still resolves
    t2 = bucketed_table(spark, sf, "lineitem", ("l_partkey",), n_buckets=4)
    assert t2.count() == 100

    # mutate the source -> fingerprint changes -> rebuild sees new data
    time.sleep(0.05)
    spark.range(50).select(
        F.col("id").alias("l_partkey"), (F.col("id") * 3).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage2"))
    part2 = next((tmp_path / "stage2").glob("part-*.parquet"))
    shutil.copy(part2, tmp_path / "lineitem.parquet")
    t3 = bucketed_table(spark, sf, "lineitem", ("l_partkey",), n_buckets=4)
    assert t3.count() == 50


def test_bucketed_table_specs_coexist(spark, tmp_path):
    """Two DIFFERENT bucketing specs of the same table must land in
    distinct tables (bucket_cols is part of the key — ADVICE r9:
    otherwise alternating callers thrash a full drop-and-rewrite per
    call because the shared fingerprint never matches both specs)."""
    import shutil

    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.catalog import bucketed_table

    sf = str(tmp_path)
    spark.range(60).select(
        F.col("id").alias("l_partkey"), (F.col("id") % 7).alias("l_suppkey")
    ).coalesce(1).write.parquet(str(tmp_path / "stage"))
    part = next((tmp_path / "stage").glob("part-*.parquet"))
    shutil.copy(part, tmp_path / "lineitem.parquet")

    by_part = bucketed_table(spark, sf, "lineitem", ("l_partkey",), 4)
    by_supp = bucketed_table(spark, sf, "lineitem", ("l_suppkey",), 4)
    assert by_part.count() == 60 and by_supp.count() == 60

    # alternate back: the first spec's table must still be current
    # (reuse, not a rebuild) — its files were never clobbered
    mtimes_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(
            os.path.join(
                spark.conf.get("spark.sql.warehouse.dir").removeprefix(
                    "file:"
                ),
                "lineitem_b4_*",
                "*.parquet",
            )
        )
    }
    assert mtimes_before, "expected bucketed files on disk"
    again = bucketed_table(spark, sf, "lineitem", ("l_partkey",), 4)
    assert again.count() == 60
    for f, m in mtimes_before.items():
        assert os.path.getmtime(f) == m, f"rebuild thrash on {f}"
