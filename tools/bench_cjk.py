"""Tokenizer throughput: flat alternation vs trie pattern at 50k words.

The module claim (functions/cjk.py): at ~100k dictionary words the
flat longest-first alternation is quadratic-ish to match (every
position scans the alternative list) while the prefix-factored trie
is one char-indexed branch per position. This benchmark executes both
patterns through the JVM regex engine (`regexp_extract_all` inside
whole-stage codegen) over a synthetic mixed corpus and prints one
JSON line with rows/s each — the number BASELINE.md quotes.

Usage: python tools/bench_cjk.py [n_words] [n_rows]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gmall_realtime_flink_spark.functions.cjk import (  # noqa: E402
    dict_pattern,
    synthetic_dictionary,
    trie_pattern,
)
from gmall_realtime_flink_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark(app_name="bench_cjk")
    words = synthetic_dictionary(n_words)
    rng = random.Random(5)
    sample = list(words[:: max(1, len(words) // 200)])
    texts = [
        "".join(
            rng.choice(sample + ["中", "测试 abc ", "x"])
            for _ in range(rng.randint(5, 30))
        )
        for _ in range(n_rows)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string").persist()
    df.count()
    out = {"n_words": n_words, "n_rows": n_rows,
           "avg_chars": round(sum(map(len, texts)) / len(texts), 1)}
    for name, pat in (("flat", dict_pattern(words)), ("trie", trie_pattern(words))):
        out[f"{name}_pattern_chars"] = len(pat)
        t0 = time.perf_counter()
        n_toks = (
            df.select(
                F.explode(
                    F.regexp_extract_all(F.lower("text"), F.lit(pat), 0)
                ).alias("t")
            ).count()
        )
        dt = time.perf_counter() - t0
        out[f"{name}_s"] = round(dt, 2)
        out[f"{name}_rows_per_s"] = round(n_rows / dt)
        out["n_tokens"] = n_toks
    out["speedup"] = round(out["flat_s"] / out["trie_s"], 2)
    df.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
