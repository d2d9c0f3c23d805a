"""Adversarial corpus generator — same schemas, hostile values.

Every correctness gate so far (driver sf0.01, local sf0.001, the
sf1/sf10/sf100 scale tiers) runs on driver-shaped data: no nulls
outside c_acctbal's sign, unique keys, clean ASCII text, unit-norm
embeddings, FKs that always resolve. Real 100 TB corpora are not that
polite, and the reference's own pipelines are full of defensive code
for exactly these rows (ETL validity filter BaseDBApp, null-key
handling in every keyBy). This tool produces a corpus that keeps the
DOCUMENTED data-model invariants (schema/dtypes identical, unique
primary keys, money 2dp, embedding dim 64, event ts non-null — a log
row without a timestamp never reaches the pipeline) while attacking
everything that is merely *habitually* true:

- NULLs in every nullable non-key column (measure values, group keys,
  dim attributes, one whole document text, one whole embedding array)
- dangling foreign keys in both directions (facts referencing missing
  dims, dim rows no fact references)
- tie-heavy values: duplicated (user_id, ts) event pairs, equal
  prices/dates, byte-identical embedding vectors — any top-k /
  row_number / CEP ordering without a total sort key goes
  nondeterministic here and the cross-engine hash catches it
- unicode (CJK, emoji, combining, RTL), empty/whitespace-only/
  punctuation-only/newline-embedded document text, a 5000-char
  one-token document
- zero-norm and 1e-30-norm embeddings (cosine divide-by-zero), 1e6
  magnitude outliers (float accumulation)
- event_type values outside the reference domain, props JSON with
  missing/extra keys, events exactly on 10 s window boundaries

`--empty` instead writes all ten tables with ZERO rows (schemas
exact): every registered plan must still build, run, and agree with
DuckDB on the empty input (global aggregates: one all-null row in
both engines; grouped: zero rows).

Usage:
  python tools/gen_adversarial.py [--out .local/adv] [--empty]
Deterministic (seed 7); ~sf0.003 base + ~60 attack rows.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.gen_testdata import generate  # noqa: E402

US = 1_000_000
DAY_US = 86_400_000_000


def _read(out: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(out, f"{name}.parquet"))


def _append(out: str, name: str, rows: dict) -> None:
    """Append attack rows to a generated table, dtype-exact.

    Values are python-literal; pa.table(..., schema=) coerces to the
    base table's schema so the corpus is indistinguishable from driver
    testdata at the type level (int32 stays int32, timestamp[us] stays
    timestamp[us]).
    """
    base = _read(out, name)
    schema = pa.schema([(f.name, f.type) for f in base.schema])
    extra = pa.table(rows, schema=schema)
    pq.write_table(
        pa.concat_tables([base.cast(schema), extra]),
        os.path.join(out, f"{name}.parquet"),
        row_group_size=65536,
    )
    print(f"{name}: +{extra.num_rows} attack rows -> {base.num_rows + extra.num_rows}")


def _ts(s: str) -> int:
    return int(np.datetime64(s).astype("datetime64[us]").astype(np.int64))


def gen_empty(out: str) -> None:
    """Zero-row tables with exact driver schemas."""
    os.makedirs(out, exist_ok=True)
    tmp = os.path.join(out, "_proto")
    generate(0.003, tmp, seed=7)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        t = _read(tmp, name)
        pq.write_table(t.slice(0, 0), os.path.join(out, f"{name}.parquet"))
    shutil.rmtree(tmp)
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump({"corpus": "empty", "seed": 7}, f)
    print(f"empty corpus -> {out}")


def gen_adversarial(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    generate(0.003, out, seed=7)

    _append(out, "region", {
        # dim row no fact references; unicode + quote/comma in the name
        "r_regionkey": [5, 6],
        "r_name": ["南极洲 🧊", 'AMERICA, "SOUTH"'],
    })
    _append(out, "nation", {
        # 25: referenced-by-nothing unicode dim; 26: dangles to region 9
        "n_nationkey": [25, 26],
        "n_name": ["中国", "A\tB\nC"],
        "n_regionkey": [5, 9],
    })
    n_cust = 450
    _append(out, "customer", {
        "c_custkey": [n_cust, n_cust + 1, n_cust + 2, n_cust + 3],
        "c_name": ["", "名字 ﷽ é́", None, "Customer#adv"],
        "c_nationkey": [27, 0, 1, None],     # 27 dangles
        "c_acctbal": [None, 0.0, -0.01, 9999.99],
        "c_mktsegment": [None, "BUILDING", "BUILDING", "ADVERSARIAL"],
    })
    _append(out, "supplier", {
        "s_suppkey": [30, 31],
        "s_name": ["", None],
        "s_nationkey": [27, None],           # dangling / null dim key
        "s_acctbal": [None, -1000.0],
    })
    _append(out, "part", {
        "p_partkey": [600, 601, 602],
        "p_name": [None, "ügly pärt 零件", "x, \"y\""],
        "p_brand": [None, "Brand#0", "Brand#0"],
        "p_type": ["ADVERSARIAL TYPE", None, "STANDARD BRASS"],
        "p_size": [None, 1, 50],
        "p_retailprice": [None, 900.0, 900.0],   # tie with base rows
    })
    n_ord = 4500
    d = _ts("1998-07-04")
    _append(out, "orders", {
        # 4500/4501: dangling custkey + null custkey; 4502/4503: exact
        # price+date ties; 4504: null price; 4505: null date; 4506/07:
        # customer 0's orders on the same instant (ties through joins)
        "o_orderkey": [n_ord + i for i in range(8)],
        "o_custkey": [99999, None, 1, 2, 3, 4, 0, 0],
        "o_orderstatus": ["O", "F", "O", "O", None, "X", "O", "O"],
        "o_totalprice": [1000.0, 1000.0, 77777.77, 77777.77, None,
                         0.01, 50.0, 50.0],
        "o_orderdate": [d, d, d, d, d, None, d, d],
        "o_orderpriority": ["1-URGENT", None, "5-LOW", "5-LOW",
                            "1-URGENT", "1-URGENT", "5-LOW", "5-LOW"],
    })
    _append(out, "lineitem", {
        # dangling order/part/supp keys, null measures, 0-quantity,
        # discount at both domain ends, equal-everything tie pair
        "l_orderkey": [99999, n_ord + 6, n_ord + 6, n_ord + 7, 0, 0],
        "l_partkey": [77777, 0, 0, None, 600, 601],
        "l_suppkey": [77777, 0, 0, 0, None, 30],
        "l_linenumber": [1, 1, 2, 1, 8, 9],
        "l_quantity": [None, 10.0, 10.0, 0.0, 50.0, 50.0],
        "l_extendedprice": [100.0, 5000.0, 5000.0, None, 0.01, 0.01],
        "l_discount": [0.0, 0.10, 0.10, 0.05, None, 0.0],
        "l_tax": [0.08, 0.0, 0.0, 0.08, 0.08, None],
        "l_returnflag": ["R", "N", "N", None, "A", "A"],
        "l_linestatus": ["O", "F", "F", "O", None, "O"],
        "l_shipdate": [_ts("1999-01-01"), _ts("1999-01-01"),
                       _ts("1999-01-01"), None, _ts("1995-01-02"),
                       _ts("2001-11-04")],
    })
    t0 = _ts("2024-01-15")                   # inside the 30-day span
    _append(out, "events", {
        # 3000-02: one user, three events on ONE microsecond (CEP /
        # session ordering tie); 3003-04: exactly on 10 s window
        # boundaries; 3005: null user (keyBy null); 3006: null value +
        # empty props; 3007: event_type outside the reference domain;
        # 3008: props with extra keys. ts stays NON-null by data model.
        # 3009-11: NON-FINITE measures (NaN/±Inf value) — quarantined
        # to NULL at the scan in BOTH engines (catalog.load /
        # oracle.duckdb_connect; DuckDB raises on CAST(NaN AS DECIMAL)
        # and stddev(NaN), so a raw NaN reaching a money/ratio
        # consumer is a cross-engine divergence, not just a bad row).
        "event_id": [3000 + i for i in range(12)],
        "ts": [t0, t0, t0,
               t0 + 10 * US, t0 + 20 * US,
               t0 + 1, t0 + 2, t0 + 3, t0 + 4,
               t0 + 5, t0 + 6, t0 + 7],
        "user_id": [7, 7, 7, 8, 8, None, 9, 9, 9, 10, 10, 10],
        "event_type": ["view", "click", "view", "view", "view",
                       "click", "view", "mystery_event", "purchase",
                       "view", "click", "purchase"],
        "value": [1.0, 1.0, None, 2.0, 2.0, 3.0, None, 4.0, 5.0,
                  float("nan"), float("inf"), float("-inf")],
        "props": ['{"k": 1}', '{"k": 1}', '{"k": 2}', '{}', '{"k": 3}',
                  None, '{"k": 4}', '{"k": 5}',
                  '{"k": 6, "extra": "ignored"}',
                  '{"k": 7}', '{"k": 8}', '{"k": 9}'],
    })
    long_doc = "spark " * 1000
    dup_base = "the fast key order sort table scan merge part window"
    _append(out, "documents", {
        "doc_id": [150 + i for i in range(10)],
        "text": ["", "   ", "a", "!!! ??? ...",
                 "спарк 火花 データ 🚀 mixed script",
                 "line one\nline two\ttabbed",
                 long_doc.strip(), None,
                 dup_base, dup_base],          # exact dup pair
        "lang": ["en", "en", "zh", None, "zh", "en", "en", "en",
                 "en", "en"],
        "source": ["srcadv", "srcadv", None, "src0", "src0", "src0",
                   "srcadv", "srcadv", "src0", "src0"],
        "n_chars": [0, 3, 1, 11, None, 24, len(long_doc.strip()),
                    None, len(dup_base), len(dup_base)],
    })
    rng = np.random.default_rng(7)
    v = rng.standard_normal(64)
    unit = (v / np.linalg.norm(v)).astype(np.float32)
    _append(out, "embeddings", {
        # 60/61: byte-identical pair (top-k tie); 62: zero norm
        # (cosine 0/0); 63: 1e-30 norm (underflow); 64: 1e6 magnitude;
        # 65: null array; 66: null label; 67: per-element NULL (a
        # non-null array with one NULL float — DuckDB list_sum skips
        # NULL elements while Spark aggregate propagates them, so
        # every embedding consumer must pin down which semantics wins);
        # 68-70: NON-FINITE elements (NaN / +Inf / -Inf — engines
        # disagree on NaN ordering/equality and DuckDB raises on
        # NaN→DECIMAL, so valid_embeddings excludes non-finite vectors
        # at the scan); 71: NaN AND Inf mixed in one vector
        "vec_id": [60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71],
        "embedding": [unit.tolist(), unit.tolist(),
                      [0.0] * 64, [1e-30] * 64, [1e6] * 64,
                      None, unit.tolist(),
                      [None] + unit.tolist()[1:],
                      [float("nan")] + unit.tolist()[1:],
                      [float("inf")] + unit.tolist()[1:],
                      unit.tolist()[:-1] + [float("-inf")],
                      [float("nan"), float("inf")] + unit.tolist()[2:]],
        "label": [0, 0, 1, 2, 3, 4, None, 5, 6, 7, 8, 9],
    })
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump({"corpus": "adversarial", "seed": 7, "base_sf": 0.003}, f)
    print(f"adversarial corpus -> {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".local/adv")
    ap.add_argument("--empty", action="store_true")
    a = ap.parse_args()
    if a.empty:
        gen_empty(a.out)
    else:
        gen_adversarial(a.out)


if __name__ == "__main__":
    main()
