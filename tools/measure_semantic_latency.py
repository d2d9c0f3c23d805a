"""Per-batch admission latency for streaming_dedup_semantic
(VERDICT r11 item 5).

The other streaming dedup families carry measured per-batch latency
(JOIN_LATENCY_r09, the chained p95 tables); the semantic admission
entry had correctness but no latency datapoint, and its |batch|·K
steady-state claim was untested under a multi-batch replay. This tool
replays the skewed-emb sf1 corpus as N vec_id-range slice files
(maxFilesPerTrigger=1 -> N micro-batches), records per-trigger
durationMs via a StreamingQueryListener, and hash-gates the
accumulated verdicts against the entry's DuckDB oracle — the
slicing-invariance contract exercised at N slices, not 1.

Usage: python tools/measure_semantic_latency.py [sf_dir] [json_out] [slices]
(defaults: .local/skewemb_sf1, SEMANTIC_LATENCY.json, 8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.verify_head import vhash  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/skewemb_sf1"
    json_out = sys.argv[2] if len(sys.argv) > 2 else "SEMANTIC_LATENCY.json"
    slices = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryListener

    from gmall_realtime_flink_spark.plans import REGISTRY
    from gmall_realtime_flink_spark.session import get_spark
    from gmall_realtime_flink_spark.streaming import jobs

    spark = get_spark("measure_semantic_latency")
    spark.sparkContext.setLogLevel("ERROR")

    durations: list[dict] = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:
            pass

        def onQueryProgress(self, event) -> None:
            p = event.progress
            if p.durationMs:
                durations.append(
                    {"rows": p.numInputRows, **dict(p.durationMs)}
                )

        def onQueryIdle(self, event) -> None:
            pass

        def onQueryTerminated(self, event) -> None:
            pass

    listener = L()
    spark.streams.addListener(listener)

    # stage the corpus as `slices` vec_id-range files: the admission
    # filter (vec_id >= split) puts the whole new decile in the last
    # range slices, so per-batch admitted sizes vary — the realistic
    # mixed-traffic shape (batches of already-stored vectors cost the
    # scan only)
    base = tempfile.mkdtemp(prefix="semantic_latency_")
    src_dir = os.path.join(base, "src")
    (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .repartitionByRange(slices, F.col("vec_id"))
        .write.mode("overwrite")
        .parquet(src_dir)
    )
    # drop non-data files so maxFilesPerTrigger=1 sees exactly the slices
    for f in os.listdir(src_dir):
        if not f.endswith(".parquet"):
            os.remove(os.path.join(src_dir, f))

    try:
        t0 = time.time()
        got = jobs.streaming_dedup_semantic(
            spark, sf_dir, base=base
        ).toPandas()
        wall = round(time.time() - t0, 1)

        # listener delivery is async — drain
        prev = -1
        while len(durations) != prev:
            prev = len(durations)
            time.sleep(0.3)

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}')"
        )
        want = con.execute(
            REGISTRY["streaming_dedup_semantic"].oracle
        ).fetchdf()
        ok = len(got) == len(want) and vhash(got) == vhash(want)

        trig = sorted(
            d["triggerExecution"] for d in durations if d.get("rows", 0) > 0
        )
        pick = lambda q: trig[min(len(trig) - 1, int(q * len(trig)))]  # noqa: E731
        out = {
            "sf_dir": sf_dir,
            "slices": slices,
            "hash_ok": bool(ok),
            "rows": int(len(got)),
            "wall_sec": wall,
            "batches_with_rows": len(trig),
            "p50_ms": pick(0.50) if trig else None,
            "p95_ms": pick(0.95) if trig else None,
            "max_ms": trig[-1] if trig else None,
            "per_batch": durations,
        }
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({k: out[k] for k in (
            "slices", "hash_ok", "rows", "wall_sec",
            "batches_with_rows", "p50_ms", "p95_ms", "max_ms")}))
        return 0 if ok else 1
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
