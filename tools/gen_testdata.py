"""Generate driver-shaped synthetic testdata at arbitrary scale factor.

The per-round driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only);
scale-hardening needs one order of magnitude more. This generator
reproduces the driver tables' schemas and observed distributions
(measured from /root/testdata/sf0.1 — see BASELINE.md round-5 notes):
uniform dims, uniform orders/lineitem with 1-7 lines per order,
exponential event values over a 30-day sorted timeline, a 31-word
document vocabulary with ~5% near-dup mutated copies, and unit-norm
64-d embeddings. Values are NOT bit-identical to the driver's
(its seed/ordering is private) — they don't need to be: the sf1 gate
compares Spark vs DuckDB on the SAME generated files.

Usage: python tools/gen_testdata.py [--sf 1.0] [--out .local/sf1]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["large", "hot", "blue", "small", "red", "dark", "light", "cold"]
NOUNS = ["ring", "bolt", "case", "drum", "tube", "gear", "plate", "cap"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
LANGS = ["en", "de", "zh", "es", "fr"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

DAY_US = 86_400_000_000


def _write(out: str, name: str, table: pa.Table) -> None:
    # bounded row groups, like any real multi-writer table. One giant
    # row group would also make the whole file a single mapper block,
    # and AQE's skew-join splits a skewed reduce partition at mapper-
    # block boundaries — a 1-block file is unsplittable no matter how
    # hot the key (bit the round-8 skew measurements before this).
    pq.write_table(
        table, os.path.join(out, f"{name}.parquet"), row_group_size=65536
    )
    print(f"{name}: {table.num_rows} rows")


def _money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def _ts_us(lo_day: str, hi_day: str, n, rng):
    lo = np.datetime64(lo_day).astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64(hi_day).astype("datetime64[us]").astype(np.int64)
    days = (hi - lo) // DAY_US
    return lo + rng.integers(0, days + 1, n) * DAY_US


def generate(sf: float, out: str, seed: int = 42, skew: float = 0.0) -> None:
    """`skew` > 0 reproduces the reference's hot-key scenario (the
    flash-sale hot sku every ProductStats keyBy sees,
    RT/app/dws/ProductStatsApp.java:263, and the hot mid through
    BaseLogAPP.java:80): that fraction of lineitem rows collapse onto
    l_partkey=0, of events onto user_id=0, and of orders onto
    o_custkey=0 — one key carrying ~skew of the table while the rest
    stays uniform. Schemas and all other distributions are unchanged,
    so every registry query/oracle runs as-is on the skewed corpus."""
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    def _skewed(keys: np.ndarray) -> np.ndarray:
        if skew > 0:
            keys = keys.copy()
            keys[rng.random(len(keys)) < skew] = 0
        return keys
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(_money(rng, -1000, 10000, n_cust)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(_money(rng, -1000, 10000, n_supp)),
    }))
    keys = np.arange(n_part)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array([
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(900.0 + (keys % 1000) / 10.0, 2)),
    }))
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(_skewed(rng.integers(0, n_cust, n_ord)), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(_money(rng, 1000, 500_000, n_ord)),
        "o_orderdate": pa.array(
            _ts_us("1995-01-01", "2001-08-01", n_ord, rng), pa.timestamp("us")
        ),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))
    lines_per = rng.integers(1, 8, n_ord)
    lkey = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(lkey)
    lnum = np.concatenate([np.arange(1, c + 1) for c in lines_per])
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(_skewed(rng.integers(0, n_part, n_li)), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(_money(rng, 900, 105_000, n_li)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(["R", "N", "A"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            _ts_us("1995-01-02", "2001-11-04", n_li, rng), pa.timestamp("us")
        ),
    }))
    # events: sorted 30-day timeline, exponential inter-arrival, exp values
    lo = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span = 30 * DAY_US
    ts = np.sort(lo + rng.integers(0, span, n_ev))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(_skewed(rng.integers(0, n_users, n_ev)), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))
    # documents: uniform 10-100 words over the 31-word vocab; ~5% are
    # near-dup copies of an earlier doc (10% of words mutated) and
    # ~0.2% exact dups — feeds the minhash/LSH/cluster queries.
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < 0.05:
            words = texts[int(rng.integers(0, i))].split()
            idx = rng.integers(0, len(words), max(1, len(words) // 10))
            for j in idx:
                words[j] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), rng.integers(10, 101))]))
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump({"sf": sf, "seed": seed, "lineitem_rows": int(n_li),
                   "skew": skew}, f)


def generate_chunked(
    sf: float,
    out: str,
    seed: int = 42,
    slab_orders: int = 10_000_000,
    slab_events: int = 20_000_000,
) -> None:
    """sf>=100-capable generator: same schemas and distributions as
    `generate`, but the three big tables (orders, lineitem, events)
    stream to parquet in slabs through pq.ParquetWriter — at sf100 the
    whole-table numpy arrays would be ~50 GB resident (600M lineitem
    rows x 11 columns). Dims, documents, and embeddings are still
    single-shot (<= a few GB at sf100). Values are NOT draw-for-draw
    identical to `generate` at the same sf (slab-wise rng draws) —
    they don't need to be: every scale gate compares Spark vs DuckDB
    on the SAME generated files."""
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(_money(rng, -1000, 10000, n_cust)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(_money(rng, -1000, 10000, n_supp)),
    }))
    keys = np.arange(n_part)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array([
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(900.0 + (keys % 1000) / 10.0, 2)),
    }))
    del keys

    # orders + lineitem: slab over the order-key range; lineitem rows
    # for an order are generated inside the same slab so l_orderkey
    # stays consistent without any cross-slab state beyond the offset
    n_li_total = 0
    ow = lw = None
    try:
        for lo_k in range(0, n_ord, slab_orders):
            n = min(slab_orders, n_ord - lo_k)
            okeys = np.arange(lo_k, lo_k + n)
            t_orders = pa.table({
                "o_orderkey": pa.array(okeys, pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(["O", "P", "F"])[rng.integers(0, 3, n)]),
                "o_totalprice": pa.array(_money(rng, 1000, 500_000, n)),
                "o_orderdate": pa.array(
                    _ts_us("1995-01-01", "2001-08-01", n, rng),
                    pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n)]),
            })
            if ow is None:
                ow = pq.ParquetWriter(
                    os.path.join(out, "orders.parquet"), t_orders.schema)
            ow.write_table(t_orders, row_group_size=65536)
            del t_orders

            lines_per = rng.integers(1, 8, n)
            lkey = np.repeat(okeys, lines_per)
            n_li = len(lkey)
            n_li_total += n_li
            lnum = np.concatenate([np.arange(1, c + 1) for c in lines_per])
            t_li = pa.table({
                "l_orderkey": pa.array(lkey, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(lnum, pa.int32()),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_li).astype(np.float64)),
                "l_extendedprice": pa.array(_money(rng, 900, 105_000, n_li)),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
                "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
                "l_returnflag": pa.array(
                    np.array(["R", "N", "A"])[rng.integers(0, 3, n_li)]),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
                "l_shipdate": pa.array(
                    _ts_us("1995-01-02", "2001-11-04", n_li, rng),
                    pa.timestamp("us")),
            })
            if lw is None:
                lw = pq.ParquetWriter(
                    os.path.join(out, "lineitem.parquet"), t_li.schema)
            lw.write_table(t_li, row_group_size=65536)
            del t_li, lkey, lnum, lines_per
            print(f"orders/lineitem slab @{lo_k}: +{n}/+{n_li}", flush=True)
    finally:
        if ow is not None:
            ow.close()
        if lw is not None:
            lw.close()
    print(f"orders: {n_ord} rows\nlineitem: {n_li_total} rows")

    # events: the GLOBAL sorted 30-day timeline needs the full ts array
    # (n_ev * 8B — 800 MB at sf100, fine); everything else slabs
    lo = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ts_all = np.sort(lo + rng.integers(0, 30 * DAY_US, n_ev))
    ew = None
    try:
        for lo_i in range(0, n_ev, slab_events):
            n = min(slab_events, n_ev - lo_i)
            t_ev = pa.table({
                "event_id": pa.array(np.arange(lo_i, lo_i + n), pa.int64()),
                "ts": pa.array(ts_all[lo_i:lo_i + n], pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, 5, n)]),
                "value": pa.array(np.round(rng.exponential(50.0, n), 2)),
                "props": pa.array(
                    [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
            })
            if ew is None:
                ew = pq.ParquetWriter(
                    os.path.join(out, "events.parquet"), t_ev.schema)
            ew.write_table(t_ev, row_group_size=65536)
            del t_ev
            print(f"events slab @{lo_i}: +{n}", flush=True)
    finally:
        if ew is not None:
            ew.close()
    del ts_all
    print(f"events: {n_ev} rows")

    # documents: same dup structure as `generate` (back-references keep
    # all texts resident: ~2-3 GB at sf100's 5M docs — acceptable)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < 0.05:
            words = texts[int(rng.integers(0, i))].split()
            idx = rng.integers(0, len(words), max(1, len(words) // 10))
            for j in idx:
                words[j] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))
        else:
            texts.append(" ".join(
                vocab[rng.integers(0, len(vocab), rng.integers(10, 101))]))
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    del texts
    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump({"sf": sf, "seed": seed, "lineitem_rows": int(n_li_total),
                   "chunked": True}, f)


def generate_zipf_docs(
    n_doc: int,
    out: str,
    seed: int = 42,
    vocab_size: int = 50_000,
    s: float = 1.0,
) -> None:
    """A REALISTIC heavy-tailed documents corpus (Zipf-ranked
    vocabulary), as a counterpart to the driver corpus's degenerate
    31-word vocabulary.

    Why it exists: on the 31-word corpus every 2-gram shingle is hot
    (≈ 961 possible shingles over 50k docs), which makes LSH bucket
    collisions and PPJoin prefix frequencies look nothing like web
    text — the round-5 pruning measurements (positional filter win,
    length-prefilter loss) were corpus-specific. Real corpora follow
    Zipf's law (Zipf '49; ~rank^-1 frequencies), so this generator
    samples each word from a rank-probability table p(r) ∝ 1/r^s over
    a `vocab_size` vocabulary, log-normal doc lengths (10..300 words,
    median ~55), and reproduces the driver corpus's duplicate
    structure exactly: ~0.2% verbatim copies and ~4.8% near-dup
    mutated copies (10% of words resampled) of earlier docs — so
    dedup recall/pruning numbers are comparable across the two
    corpora with only the vocabulary distribution changing.
    """
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    p /= p.sum()
    # letter-only words (the tokenizers split on [^a-z]+): rank in
    # base-26 a..z, prefixed to avoid collisions across lengths
    digits = "abcdefghijklmnopqrstuvwxyz"

    def word(r: int) -> str:
        out = []
        while True:
            out.append(digits[r % 26])
            r //= 26
            if r == 0:
                break
        return "w" + "".join(reversed(out))

    vocab = np.array([word(r) for r in range(vocab_size)])

    def draw_words(n: int) -> np.ndarray:
        return vocab[rng.choice(vocab_size, n, p=p)]

    lengths = np.clip(
        np.exp(rng.normal(4.0, 0.6, n_doc)).astype(np.int64), 10, 300
    )
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < 0.05:
            words = texts[int(rng.integers(0, i))].split()
            idx = rng.integers(0, len(words), max(1, len(words) // 10))
            repl = draw_words(len(idx))
            for j, w in zip(idx, repl):
                words[j] = w
            texts.append(" ".join(words))
        else:
            texts.append(" ".join(draw_words(int(lengths[i]))))
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{s_}" for s_ in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    generate_zipf_embeddings(n_doc, out, seed)
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump(
            {
                "corpus": "zipf",
                "n_doc": n_doc,
                "vocab_size": vocab_size,
                "s": s,
                "seed": seed,
            },
            f,
        )


def generate_zipf_embeddings(
    n_doc: int, out: str, seed: int = 42, dim: int = 64
) -> None:
    """Embeddings companion for the zipf corpus (vec_id == doc_id so
    the cross-modal entries — dedup_semantic_verify — join 1:1), on an
    INDEPENDENT rng stream (seed+1) so it can be emitted into an
    already-generated zipf dir without perturbing the document draw."""
    rng = np.random.default_rng(seed + 1)
    emb = rng.normal(0.0, 1.0, (n_doc, dim)).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_doc), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_doc).astype(np.int32),
                          pa.int32()),
    }))


def generate_skewed_embeddings(
    n_emb: int,
    out: str,
    seed: int = 42,
    n_clusters: int = 50,
    s: float = 1.0,
    sigma: float = 0.1,
    dim: int = 64,
) -> None:
    """A SKEWED-cluster embeddings corpus (Zipf cluster sizes) — the
    embedding-space analogue of the zipf text corpus that validated
    the lexical hot-bucket caps (round 6).

    Why it exists: the driver corpus's embeddings are i.i.d. gaussian,
    so kmeans cells come out near-uniform BY CONSTRUCTION (sf1
    min/med/max cell = 934/1001/1068 at target 1024) and the
    SemDeDup/IVF skew posture is untested. Real 100 TB corpora are
    boilerplate-dominated: a few templates own a large fraction of the
    embedding space. This generator samples each vector's cluster from
    p(r) ∝ 1/r^s over `n_clusters` unit-norm gaussian centers (rank 1
    owns ~22% of the corpus at s=1, C=50) and adds N(0, sigma²) noise;
    at sigma=0.1 within-cluster cosine ≈ 0.6 >> the 0.4 SemDeDup
    threshold, so hot kmeans cells are ALSO dup-dense — the exact
    regime the in-cell quadratic block must survive.

    Embeddings-only corpus (plus MANIFEST): its consumers
    (dedup_semantic*, similarity_*) read only the embeddings table.
    """
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, n_clusters + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    p /= p.sum()
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cl = rng.choice(n_clusters, n_emb, p=p)
    emb = (centers[cl] + sigma * rng.standard_normal((n_emb, dim))).astype(
        np.float32
    )
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array((cl % 10).astype(np.int32), pa.int32()),
    }))
    sizes = np.bincount(cl, minlength=n_clusters)
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump(
            {
                "corpus": "skewed-emb",
                "n_emb": n_emb,
                "n_clusters": n_clusters,
                "s": s,
                "sigma": sigma,
                "seed": seed,
                "cluster_sizes_top5": sorted(sizes.tolist())[-5:][::-1],
            },
            f,
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--chunked", action="store_true",
        help="stream big tables to parquet in slabs (required ~sf100: "
        "whole-table arrays would be ~50 GB resident)",
    )
    ap.add_argument(
        "--skew", type=float, default=0.0,
        help="fraction of lineitem/events/orders rows collapsed onto "
        "one hot key (flash-sale sku / hot mid scenario)",
    )
    ap.add_argument(
        "--corpus",
        choices=["driver", "zipf", "skewed-emb"],
        default="driver",
        help="zipf = heavy-tailed documents-only corpus "
        "(n_doc = 50000*sf, like the driver corpus); skewed-emb = "
        "Zipf-cluster-sized embeddings-only corpus (n_emb = 20000*sf)",
    )
    a = ap.parse_args()
    local = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".local"
    )
    if a.corpus == "zipf":
        out = a.out or os.path.join(local, f"zipf_sf{a.sf:g}")
        generate_zipf_docs(int(50_000 * a.sf), out, a.seed)
    elif a.corpus == "skewed-emb":
        out = a.out or os.path.join(local, f"skewemb_sf{a.sf:g}")
        generate_skewed_embeddings(int(20_000 * a.sf), out, a.seed)
    else:
        suffix = f"_skew{a.skew:g}" if a.skew > 0 else ""
        out = a.out or os.path.join(local, f"sf{a.sf:g}{suffix}")
        if a.chunked:
            assert a.skew == 0, "--chunked does not implement --skew"
            generate_chunked(a.sf, out, a.seed)
        else:
            generate(a.sf, out, a.seed, skew=a.skew)
