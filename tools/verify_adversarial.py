"""Run the FULL registry against the DuckDB oracle on a hostile corpus.

Companion to ``tools/gen_adversarial.py``: every entry must produce
the same rows as its oracle on data full of nulls, dangling FKs,
ties, unicode, and degenerate embeddings — or, for the ``--empty``
corpus, must still build/run and agree on zero-row input (the
rows-only anti-padding floor is waived there: an empty corpus makes
">0 rows" meaningless, and the check's purpose — catching no-op
plans — is carried by the normal-corpus runs).

Usage:
  python tools/verify_adversarial.py [sf_dir] [json_out] [--empty]
Exit 0 iff no entry mismatches or raises. Artifact rewritten
incrementally so a long run stays observable.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_realtime_flink_spark.oracle import compare_query  # noqa: E402
from gmall_realtime_flink_spark.plans import REGISTRY  # noqa: E402
from gmall_realtime_flink_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--empty"]
    empty = "--empty" in sys.argv[1:]
    sf_dir = os.path.abspath(args[0] if args else ".local/adv")
    # neutral default (ADVICE r11 rule): an argless run must never
    # clobber a committed per-round artifact
    json_out = args[1] if len(args) > 1 else "ADVERSARIAL.json"

    spark = get_spark(app_name="verify-adversarial", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    bad: list[str] = []
    t_all = time.time()
    names = sorted(REGISTRY)
    for i, name in enumerate(names):
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            res = compare_query(spark, spec, sf_dir)
            ok, detail = res.ok, res.detail
            if empty and not ok and spec.oracle is None:
                # rows-only anti-padding floor is corpus-dependent
                ok, detail = True, f"rows-only floor waived on empty corpus ({detail})"
        except Exception as exc:  # noqa: BLE001 — record, keep going
            ok = False
            detail = f"EXCEPTION: {exc!r}\n{traceback.format_exc()[-1500:]}"
        sec = round(time.time() - t0, 1)
        results[name] = {"ok": ok, "sec": sec}
        if not ok:
            results[name]["detail"] = detail[:2000]
            bad.append(name)
        print(f"[{i + 1}/{len(names)}] {name} "
              f"{'ok' if ok else 'BAD'} {sec}s", flush=True)
        with open(json_out, "w") as f:
            json.dump({
                "sf_dir": sf_dir,
                "corpus": "empty" if empty else "adversarial",
                "checked": len(results),
                "total": len(names),
                "bad": bad,
                "results": results,
                "total_sec": round(time.time() - t_all, 1),
            }, f, indent=1)
    print("TOTAL", round(time.time() - t_all, 1), "BAD:", len(bad), bad[:20])
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
