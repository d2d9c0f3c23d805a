"""Verify the driver-visible registry head under a PLAIN SparkSession.

Emulates the per-round driver's CORRECTNESS gate: builds a session
WITHOUT the engine's config (no nanos conf, no RocksDB, default ANSI),
runs the first N registry entries at sf0.01, and hash-compares each
against its DuckDB oracle with the driver's stringified value hash.

Usage: python tools/verify_head.py [N | START:END] [sf_dir] [json_out]
(defaults: 50, sf0.01). START:END is a python-style slice over the
registry order — `50:` verifies everything PAST the driver's head, the
round-5 rotation proof. If json_out is given, a per-entry artifact is
written there. Exit code 0 iff every checked entry matches.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def vhash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    lines = sorted(
        ",".join(str(v) for v in r) for r in pdf.itertuples(index=False)
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    from pyspark.sql import SparkSession

    spec = sys.argv[1] if len(sys.argv) > 1 else "50"
    names = None
    if ":" in spec:
        s, e = spec.split(":", 1)
        start, end = int(s or 0), int(e) if e else None
    elif spec and not spec.isdigit():
        # comma-separated entry names: verify exactly these (used for
        # incremental sf1 evidence on entries added after a full pass)
        names, start, end = spec.split(","), 0, None
    else:
        start, end = 0, int(spec)
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # the harness collects full results driver-side for hashing —
        # a multi-million-row sf1 result OOMs the 1g default heap in
        # collectToPython (product_stats at sf1 is ~4.8M groups); the
        # engine session and the round driver both run a 16g driver
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )

    slice_label = (
        ",".join(names)
        if names is not None
        else f"{start}:{end if end is not None else ''}"
    )
    bad = []
    results = {}
    t_all = time.time()
    for q in (names if names is not None else list(qs)[start:end]):
        t0 = time.time()
        try:
            got = qs[q](spark, sf_dir).toPandas()
            want = con.execute(osql[q]).fetchdf()
            ok = len(got) == len(want) and vhash(got) == vhash(want)
        except Exception as ex:  # noqa: BLE001
            ok = False
            print(f"{q} EXC {str(ex)[:150]}", file=sys.stderr)
        if not ok:
            bad.append(q)
        results[q] = {"ok": ok, "sec": round(time.time() - t0, 1)}
        print(
            f"{q} {'OK' if ok else 'MISMATCH'} {time.time() - t0:.1f}s",
            flush=True,
        )
        if json_out:
            _dump(json_out, slice_label, sf_dir, bad, results, t_all)
    print(f"TOTAL {time.time() - t_all:.1f}s BAD: {bad}", flush=True)
    if json_out:
        _dump(json_out, slice_label, sf_dir, bad, results, t_all)
    return 1 if bad else 0


def _dump(json_out, slice_label, sf_dir, bad, results, t_all) -> None:
    """Rewrite the artifact after every entry — a multi-hour sf1 run
    stays observable and a crash loses one entry, not the run."""
    import json

    with open(json_out, "w") as f:
        json.dump(
            {
                "slice": slice_label,
                "sf_dir": sf_dir,
                "checked": len(results),
                "bad": bad,
                "total_sec": round(time.time() - t_all, 1),
                "results": results,
            },
            f,
            indent=1,
        )


if __name__ == "__main__":
    sys.exit(main())
