"""verify_head's hash gate under the ENGINE session (RocksDB state).

The plain-session harness (tools/verify_head.py) deliberately mirrors
the driver's default SparkSession — which keeps streaming state in
the in-heap HDFSBackedStateStoreProvider. At sf10 a stream-stream
interval join buffers ~60M rows of state and OOMs that heap; the
engine session (session.get_spark) runs the same query with RocksDB
state off-heap, which is precisely the 100 TB posture SCALE.md
documents. This tool re-runs named entries under the engine session
with the identical DuckDB hash compare, so the sf10 artifact records
an honest split: plain-session-verified vs engine-session-verified
(with the reason).

Usage: python tools/verify_engine_session.py <n1,n2,...> [sf_dir] [json_out]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from tools.verify_head import TABLES, vhash  # noqa: E402


def main() -> int:
    from gmall_realtime_flink_spark.session import get_spark

    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    # harness-side posture: the hash gate collects FULL results to the
    # driver, so the collect ceiling must scale with the run, not with
    # the product default (a 243M-row result serialized past the 1g
    # default was recorded as MISMATCH in the round-7 zipf smoke — a
    # false negative on a hash-identical result)
    spark = get_spark(
        "verify_engine_session",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        # tolerate partial corpora (the zipf dirs carry only
        # documents/embeddings); entries referencing an absent table
        # simply can't be named in such a run
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
            )
    bad, results = [], {}
    for q in names:
        t0 = time.time()
        err = None
        try:
            got = qs[q](spark, sf_dir).toPandas()
            want = con.execute(osql[q]).fetchdf()
            ok = len(got) == len(want) and vhash(got) == vhash(want)
        except Exception as ex:  # noqa: BLE001
            # a harness/oracle failure (collect ceiling, DuckDB OOM) is
            # NOT a value mismatch — record the error so downstream
            # accounting can distinguish "wrong" from "couldn't check"
            ok, err = False, str(ex)[:300]
            print(f"{q} EXC {err[:200]}", file=sys.stderr)
        if not ok:
            bad.append(q)
        results[q] = {
            "ok": ok,
            "sec": round(time.time() - t0, 1),
            "session": "engine (RocksDB state store)",
        }
        if err is not None:
            results[q]["err"] = err
        print(
            f"{q} {'OK' if ok else ('EXC' if err else 'MISMATCH')} "
            f"{time.time() - t0:.1f}s",
            flush=True,
        )
        if json_out:
            import json

            with open(json_out, "w") as f:
                json.dump(
                    {"sf_dir": sf_dir, "bad": bad, "results": results}, f,
                    indent=1,
                )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
