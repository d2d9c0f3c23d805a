"""Property-based operator tests (hypothesis) — SURVEY §5's answer to
the reference's missing test suite: operator invariants on generated
inputs, not just the fixed testdata.

Frames are generated driver-side and run through the real operators on
small local DataFrames; properties are semantic invariants that must
hold for ANY input.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.operators.joins import interval_join
from gmall_realtime_flink_spark.operators.stateful import (
    jump_detect,
    session_entry,
    uv_dedup,
)

BASE = datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=100_000),  # offset seconds
    ),
    min_size=1,
    max_size=30,
)


def mk_events(spark, rows):
    data = [
        (i, u, BASE + timedelta(seconds=s)) for i, (u, s) in enumerate(rows)
    ]
    return spark.createDataFrame(data, ["event_id", "user_id", "ts"])


@settings(max_examples=15, deadline=None)
@given(rows=events_strategy)
def test_jump_and_entry_partition_events(spark, rows):
    """Every event is either a session entry, a jump, both, or neither —
    but jumps ∪ followed == all events, and per (user, gap) the jump
    set is exactly the events with no successor within the gap."""
    df = mk_events(spark, rows)
    gap_ms = 600_000
    jumps = {
        r["event_id"]
        for r in jump_detect(df, key="user_id", ts_col="ts", gap_ms=gap_ms).collect()
    }
    # oracle recomputation in python
    by_user: dict[int, list[tuple[datetime, int]]] = {}
    for i, (u, s) in enumerate(rows):
        by_user.setdefault(u, []).append((BASE + timedelta(seconds=s), i))
    want = set()
    for u, evs in by_user.items():
        evs.sort()
        for k, (ts, eid) in enumerate(evs):
            nxt = evs[k + 1][0] if k + 1 < len(evs) else None
            if nxt is None or (nxt - ts).total_seconds() * 1000 > gap_ms:
                want.add(eid)
    assert jumps == want


@settings(max_examples=15, deadline=None)
@given(rows=events_strategy)
def test_session_entry_first_event_always_entry(spark, rows):
    """Each user's chronologically first event is always an entry, and
    entry count per user == 1 + number of >gap gaps."""
    df = mk_events(spark, rows)
    gap_ms = 600_000
    entries = session_entry(df, key="user_id", ts_col="ts", gap_ms=gap_ms)
    got = {}
    for r in entries.collect():
        got.setdefault(r["user_id"], set()).add(r["event_id"])
    by_user: dict[int, list[tuple[datetime, int]]] = {}
    for i, (u, s) in enumerate(rows):
        by_user.setdefault(u, []).append((BASE + timedelta(seconds=s), i))
    for u, evs in by_user.items():
        evs.sort()
        gaps = sum(
            1
            for a, b in zip(evs, evs[1:])
            if (b[0] - a[0]).total_seconds() * 1000 > gap_ms
        )
        assert len(got.get(u, set())) == 1 + gaps
        assert evs[0][1] in got[u]  # first event is an entry


@settings(max_examples=10, deadline=None)
@given(rows=events_strategy)
def test_uv_dedup_one_row_per_user_day(spark, rows):
    df = mk_events(spark, rows)
    out = uv_dedup(df, key="user_id", ts_col="ts").collect()
    keys = [(r["user_id"], r["visit_date"]) for r in out]
    assert len(keys) == len(set(keys))  # exactly one row per (user, day)
    want = {
        (u, (BASE + timedelta(seconds=s)).strftime("%Y-%m-%d"))
        for u, s in rows
    }
    assert set(keys) == want


@settings(max_examples=10, deadline=None)
@given(
    lefts=st.lists(st.integers(0, 50), min_size=1, max_size=15),
    rights=st.lists(st.integers(0, 50), min_size=1, max_size=15),
)
def test_interval_join_band_inclusive(spark, lefts, rights):
    """Flink `between(lower, upper)` semantics: both ends inclusive,
    band relative to the left timestamp."""
    ldf = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(lefts)],
        ["l_id", "l_ts"],
    ).withColumn("k", F.lit(1))
    rdf = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(rights)],
        ["r_id", "r_ts"],
    ).withColumn("k", F.lit(1))
    got = {
        (r["l_id"], r["r_id"])
        for r in interval_join(
            ldf,
            rdf,
            on=ldf["k"] == rdf["k"],
            left_ts=ldf["l_ts"],
            right_ts=rdf["r_ts"],
            lower="-5 seconds",
            upper="10 seconds",
        ).collect()
    }
    want = {
        (i, j)
        for i, ls in enumerate(lefts)
        for j, rs in enumerate(rights)
        if ls - 5 <= rs <= ls + 10
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=40,
    ),
    algorithm=st.sampled_from(["star", "label"]),
)
def test_connected_components_equals_union_find(spark, edges, algorithm):
    """Both algorithms — large-star/small-star contraction (default)
    and Pregel min-label propagation — must produce exactly the
    components a reference union-find computes, on arbitrary graphs
    (chains, cliques, forests) — not just LSH-shaped ones."""
    from gmall_realtime_flink_spark.operators.dedup import connected_components

    pairs = [(min(a, b), max(a, b)) for a, b in edges]
    pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pdf, algorithm=algorithm).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


def test_star_contraction_logarithmic_rounds_on_chain(spark):
    """The 100 TB robustness claim: on an adversarial 1000-node path
    graph (diameter 999), large-star/small-star converges in O(log² n)
    rounds — min-label propagation would need ~999. Pin both the
    round count and the labels."""
    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.operators.dedup import star_contraction

    n = 1000
    edges = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    stars, rounds = star_contraction(edges, max_iter=25)
    assert rounds <= 15, f"chain took {rounds} rounds — not logarithmic"
    # converged star forest: every node directly joined to component min 0
    got = {
        (r["u"], r["v"]) for r in stars.collect()
    }
    assert got == {(i, 0) for i in range(1, n)}


def test_train_split_deterministic_and_partition_independent(spark, sf_dir):
    """A document's split must be a pure function of its id: identical
    across runs and across any repartitioning (the property that keeps
    train/test stable when the corpus is re-ingested)."""
    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.sampling import train_split

    d = load(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in train_split(d).select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in train_split(d.repartition(13)).select("doc_id", "split").collect()
    }
    assert a == b
    # fractions near 90/5/5 (md5 uniformity; loose tolerance at sf0.001)
    n = len(a)
    frac_train = sum(1 for v in a.values() if v == "train") / n
    assert 0.80 <= frac_train <= 0.97


def test_kmeans_improves_quantizer_objective(spark, sf_dir):
    """Lloyd training must improve the IVF coarse quantizer: the mean
    best-centroid cosine of the corpus rises monotonically from the
    raw seed centroids (on this corpus ~0.19 -> ~0.26 by 2 iters) —
    the guaranteed k-means property; recall@k is data-dependent and
    deliberately NOT asserted. Also pins determinism: training is
    repartition-invariant (no rand(), exact-decimal means)."""
    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.similarity import (
        AS_DOUBLE,
        _centroid_sim,
        kmeans_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr(AS_DOUBLE.format(c="embedding")).alias("emb")
    )

    def objective(cent) -> float:
        return (
            _centroid_sim(e.crossJoin(F.broadcast(cent)), "emb")
            .groupBy("vec_id")
            .agg(F.max("c_sim").alias("best"))
            .agg(F.avg("best"))
            .collect()[0][0]
        )

    objs = [
        objective(kmeans_centroids(emb, n_cells=8, iters=i)) for i in (0, 1, 2)
    ]
    assert objs[0] < objs[1] < objs[2], f"objective not improving: {objs}"

    flat = kmeans_centroids(emb, n_cells=8, iters=2).collect()
    shuffled = kmeans_centroids(
        emb.repartition(7, "vec_id"), n_cells=8, iters=2
    ).collect()
    as_map = lambda rows: {r.cid: r.cvec for r in rows}  # noqa: E731
    assert as_map(flat) == as_map(shuffled), "training not repartition-invariant"


def test_knn_graph_matches_bruteforce_within_bucket(spark, sf_dir):
    """knn_self_join's rank-1 neighbor equals the numpy brute-force
    argmax over the same sign-bucket cell (rounded-cosine ties broken
    by neighbor id, mirroring the operator's ordering)."""
    import numpy as np

    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.similarity import knn_self_join

    e = load(spark, sf_dir, "embeddings")
    got = {
        r["vec_a"]: r["vec_b"]
        for r in knn_self_join(e, k=1, bits=4).filter("rk = 1").collect()
    }

    pdf = e.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    ids = pdf.vec_id.to_numpy()
    bucket = sum(((V[:, i] >= 0).astype(int) << i) for i in range(4))
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    raw = Vn @ Vn.T
    # HALF_UP away from zero, matching Spark F.round (np.round is
    # half-even: 0.1234565 would round differently and flip rank ties)
    sims = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6

    for a in range(len(ids)):
        cell = np.where((bucket == bucket[a]) & (ids != ids[a]))[0]
        if len(cell) == 0:
            assert ids[a] not in got
            continue
        # max sim, ties to the smallest neighbor id
        best = cell[np.lexsort((ids[cell], -sims[a, cell]))][0]
        assert got[ids[a]] == ids[best], f"vec {ids[a]}"


def test_chunk_documents_covers_all_tokens(spark, sf_dir):
    """Every source token position appears in >= 1 chunk; consecutive
    chunks of one doc overlap by exactly `overlap` tokens while both
    are full; chunk_ids are dense from 0."""
    from gmall_realtime_flink_spark.operators.packing import chunk_documents

    from gmall_realtime_flink_spark.catalog import load

    docs = load(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=64, overlap=16).toPandas()
    n_toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.trim("text"), r"\s+"),
                    lambda x: x != F.lit(""),
                )
            ).alias("n"),
        ).collect()
    }
    stride = 64 - 16
    for doc_id, grp in chunks.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        assert list(grp["chunk_id"]) == list(range(len(grp)))
        # coverage: last chunk must reach the final token
        last_start = int(grp["chunk_id"].iloc[-1]) * stride
        assert last_start + int(grp["n_tokens"].iloc[-1]) == n_toks[doc_id]
        # no fully-contained tail chunk: the last chunk must extend
        # past the previous chunk's end
        if len(grp) > 1:
            prev_end = int(grp["chunk_id"].iloc[-2]) * stride + 64
            assert last_start + int(grp["n_tokens"].iloc[-1]) > prev_end


def test_corpus_shuffle_is_partition_independent_permutation(spark, sf_dir):
    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.packing import corpus_shuffle

    docs = load(spark, sf_dir, "documents")
    a = corpus_shuffle(docs).toPandas()
    b = corpus_shuffle(docs.repartition(7)).toPandas()
    # permutation: every doc exactly once, positions dense per shard
    assert sorted(a["doc_id"]) == sorted(
        r[0] for r in docs.select("doc_id").collect()
    )
    for _, grp in a.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # repartition-invariant (content-stable ordering, no rand())
    key = ["doc_id", "shard", "pos"]
    assert a[key].sort_values("doc_id").values.tolist() == (
        b[key].sort_values("doc_id").values.tolist()
    )


def test_pack_documents_respects_budget(spark, sf_dir):
    """No pack exceeds the token budget unless it holds a single
    over-budget document; pack_ids are dense within a bucket."""
    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.packing import pack_documents

    budget = 256
    packed = pack_documents(
        load(spark, sf_dir, "documents"), budget_tokens=budget
    ).toPandas()
    for (_, pack_id), grp in packed.groupby(["bucket", "pack_id"]):
        total = int(grp["n_tokens"].sum())
        # cumulative cut: a pack may be pushed over the budget only by
        # the boundary-crossing doc — remove the largest member and
        # the rest always fit
        if len(grp) > 1:
            assert total - int(grp["n_tokens"].max()) < budget
    for _, grp in packed.groupby("bucket"):
        # ids start at 0 and may skip only when a single doc spans
        # multiple budgets (cumulative-cut semantics, see docstring)
        ids = sorted(grp["pack_id"].unique())
        assert ids[0] == 0
        by_pack_max = grp.groupby("pack_id")["n_tokens"].sum()
        for prev, nxt in zip(ids, ids[1:]):
            if nxt - prev > 1:
                assert int(by_pack_max[prev]) > (nxt - prev - 1) * budget


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.lists(
                st.text(alphabet="abcxyz", min_size=1, max_size=5),
                min_size=0,
                max_size=200,
            ),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_chunk_documents_matches_python_model(spark, docs):
    """chunk_documents against a transparent pure-Python model on
    ARBITRARY token lists (corpus data can't exercise the off-by-one
    seams: n == chunk, n == chunk+1, n <= overlap, empty text)."""
    from gmall_realtime_flink_spark.operators.packing import chunk_documents

    chunk, overlap, stride = 64, 16, 48
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, chunk_tokens=chunk, overlap=overlap
        ).collect()
    }
    exp = {}
    for i, toks in docs:
        n = len(toks)
        if n == 0:
            continue
        starts = list(range(0, max(n - overlap - 1, 0) + 1, stride))
        for s in starts:
            piece = toks[s : s + chunk]
            exp[(i, s // stride)] = (" ".join(piece), len(piece))
    assert got == exp


@settings(max_examples=15, deadline=None)
@given(
    toks=st.lists(
        st.integers(min_value=0, max_value=600), min_size=1, max_size=40
    )
)
def test_pack_documents_matches_python_model(spark, toks):
    """pack_documents against the cumulative-cut model on arbitrary
    token counts (including zero-token and over-budget docs)."""
    import hashlib

    from gmall_realtime_flink_spark.operators.packing import pack_documents

    budget, buckets = 256, 4
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["bucket"], r["n_tokens"], r["pack_id"])
        for r in pack_documents(
            df, budget_tokens=budget, n_buckets=buckets
        ).collect()
    }

    def md5(s):
        return hashlib.md5(str(s).encode()).hexdigest()

    exp = {}
    per_bucket = {}
    for i, n in enumerate(toks):
        b = int(md5(i)[:2], 16) % buckets
        per_bucket.setdefault(b, []).append((md5(i), i, n))
    for b, items in per_bucket.items():
        cum = 0
        for _, i, n in sorted(items):
            cum += n
            exp[i] = (b, n, (cum - n) // budget)
    assert got == exp


def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    """Each wider probe set is a superset of the narrower one, so
    recall@k must be non-decreasing in nprobe — the property that makes
    the recall curve a usable tuning dial."""
    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.similarity import (
        ivf_recall_curve,
    )

    e = load(spark, sf_dir, "embeddings")
    rows = sorted(
        (r["nprobe"], r["recall_at_k"])
        for r in ivf_recall_curve(e, nprobes=(1, 2, 4)).collect()
    )
    assert [n for n, _ in rows] == [1, 2, 4]
    recalls = [r for _, r in rows]
    assert recalls == sorted(recalls), recalls


@given(
    items=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=1,
        max_size=300,
    ),
    parts=st.sampled_from([1, 3, 7]),
)
@settings(max_examples=15, deadline=None)
def test_heavy_hitters_exact_matches_counter(spark, items, parts):
    """Two-pass Misra-Gries heavy hitters must equal the exact
    frequency filter (count/n > phi) for ANY stream and ANY
    partitioning — the sketch pass may differ per layout, the
    confirmed result may not."""
    from collections import Counter
    from fractions import Fraction

    from gmall_realtime_flink_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    phi = Fraction(1, 4)
    df = spark.createDataFrame(
        [(x,) for x in items], "token string"
    ).repartition(parts)
    got = {
        (r["token"], r["cnt"])
        for r in heavy_hitters_exact(df, "token", phi).collect()
    }
    n = len(items)
    want = {
        (tok, c)
        for tok, c in Counter(items).items()
        if c * phi.denominator > n * phi.numerator
    }
    assert got == want


def test_misra_gries_candidates_cover_heavy_items(spark):
    """The per-partition MG union must contain every item with global
    frequency > 1/(capacity+1) — on an adversarial stream where the
    heavy item is diluted by many distinct light items."""
    from gmall_realtime_flink_spark.operators.sketches import (
        misra_gries_candidates,
    )

    # 30% heavy item + 70% all-distinct noise, shuffled deterministically
    rows = ["hot"] * 300 + [f"noise{i}" for i in range(700)]
    rows = [rows[i] for i in sorted(range(len(rows)), key=lambda i: (i * 131) % 1000)]
    df = spark.createDataFrame([(x,) for x in rows], "token string").repartition(5)
    summary = misra_gries_candidates(df, "token", 4).collect()
    cands = {r["token"] for r in summary if r["token"] is not None}
    assert "hot" in cands
    # sentinel rows must reconstruct the exact stream size
    assert sum(r["__pn"] for r in summary if r["token"] is None) == 1000


@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=120
    ),
    k=st.sampled_from([1, 5, 17]),
    parts=st.sampled_from([1, 4]),
)
@settings(max_examples=15, deadline=None)
def test_systematic_sample_matches_python_model(spark, weights, k, parts):
    """Distributed-prefix-sum PPS sampling must equal the sequential
    model (cumsum in (md5(id), id) order, keep rows whose weight
    interval crosses a stride boundary) for ANY weights, k, and
    partitioning."""
    import hashlib

    from gmall_realtime_flink_spark.operators.sampling import (
        systematic_sample_by_weight,
    )

    total = sum(weights)
    if total == 0:
        return
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "id long, w long"
    ).repartition(parts)
    got = {
        (r["id"], r["weight"], r["cum_before"])
        for r in systematic_sample_by_weight(df, "id", "w", k=k).collect()
    }

    order = sorted(
        range(len(weights)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    want, cb = set(), 0
    for i in order:
        w = weights[i]
        if (cb * k) // total < ((cb + w) * k) // total:
            want.add((i, w, cb))
        cb += w
    assert got == want
    assert len(want) <= k


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"]),
            min_size=3,
            max_size=12,
        ),
        min_size=2,
        max_size=12,
    ),
    thresh=st.sampled_from([0.2, 0.5]),
)
@settings(max_examples=12, deadline=None)
def test_prefix_filter_is_complete(spark, docs, thresh):
    """Prefix-filter candidates + exact verify must equal brute-force
    all-pairs Jaccard >= t for ANY corpus — the All-Pairs/PPJoin
    completeness lemma, checked with a Python brute force."""
    from gmall_realtime_flink_spark.operators.dedup import (
        jaccard_verify,
        prefix_filter_candidates,
    )

    frame = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    cand = prefix_filter_candidates(frame, threshold=thresh)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_verify(cand, frame, threshold=thresh).collect()
    }

    def sset(toks):
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    want = set()
    for i, a in enumerate(docs):
        for j in range(i + 1, len(docs)):
            b = docs[j]
            sa, sb = sset(a), sset(b)
            if not sa or not sb:
                continue
            jac = round(len(sa & sb) / len(sa | sb), 6)
            if jac >= thresh:
                want.add((i, j))
    assert got == want


def test_hard_negatives_match_bruteforce_within_bucket(spark, sf_dir):
    """hard_negative_pairs' rank-1 negative equals the numpy
    brute-force argmax over DIFFERENT-label vectors in the same
    sign-bucket cell, and every returned pair crosses labels."""
    import numpy as np

    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.similarity import (
        hard_negative_pairs,
    )

    e = load(spark, sf_dir, "embeddings")
    rows = hard_negative_pairs(e, k=1, bits=4).filter("rk = 1").collect()
    assert all(r["anchor_label"] != r["neg_label"] for r in rows)
    got = {r["anchor_id"]: r["neg_id"] for r in rows}

    pdf = e.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.array(pdf.embedding.tolist(), dtype=np.float64)
    ids = pdf.vec_id.to_numpy()
    labels = pdf.label.to_numpy()
    bucket = sum(((V[:, i] >= 0).astype(int) << i) for i in range(4))
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    raw = Vn @ Vn.T
    # HALF_UP away from zero, matching Spark F.round (np.round is
    # half-even and would flip rank ties on .xxxxx5 boundaries)
    sims = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6

    id_to_idx = {v: i for i, v in enumerate(ids)}
    for a in range(len(ids)):
        cell = np.where(
            (bucket == bucket[a]) & (labels != labels[a])
        )[0]
        if len(cell) == 0:
            assert ids[a] not in got
            continue
        best = cell[np.lexsort((ids[cell], -sims[a, cell]))][0]
        # numpy normalizes then matmuls — a third float path whose
        # last-ulp can disagree with Spark's fold on a .5e-6 rounding
        # boundary and flip a rank tie; assert the engine's pick is
        # within one rounding quantum of numpy's argmax rather than
        # id-identical on knife-edge sims
        got_sim = sims[a, id_to_idx[got[ids[a]]]]
        assert got_sim >= sims[a, best] - 1.5e-6, f"anchor {ids[a]}"


docs_strategy = st.lists(
    st.lists(
        st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
        min_size=1,
        max_size=10,
    ),
    min_size=2,
    max_size=14,
)


@given(docs=docs_strategy, bits=st.sampled_from([16, 48]))
@settings(max_examples=10, deadline=None)
def test_simhash_banded_pairs_equal_bruteforce(spark, docs, bits):
    """Pigeonhole completeness at BOTH widths: the banded self-join +
    exact hamming verify must equal brute-force all-pairs hamming <= 3
    for ANY corpus (hamming <= bands-1 guarantees a shared band). The
    Python model recomputes fingerprints from md5 independently."""
    import hashlib

    from gmall_realtime_flink_spark.operators.textstats import (
        simhash,
        simhash_near_pairs,
    )

    frame = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(
            simhash(frame, bits=bits), bits=bits, bands=4
        ).collect()
    }

    def fp(toks):
        sums = [0] * bits
        for t in toks:
            m = hashlib.md5(t.encode()).hexdigest()
            for b in range(bits):
                bit = (int(m[b // 4], 16) >> (b % 4)) & 1
                sums[b] += 1 if bit else -1
        return sum((1 << b) for b in range(bits) if sums[b] > 0)

    fps = {i: fp(toks) for i, toks in enumerate(docs)}
    want = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            h = bin(fps[i] ^ fps[j]).count("1")
            if h <= 3:
                want.add((i, j, h))
    assert got == want


def test_simhash_guards():
    """bits/bands parameter validation: out-of-range widths and bands
    that don't tile the fingerprint must fail loudly (a silent partial
    banding would break the pigeonhole completeness guarantee)."""
    import pytest as _pytest

    from gmall_realtime_flink_spark.operators.textstats import (
        simhash,
        simhash_near_pairs,
    )

    with _pytest.raises(ValueError, match="bits"):
        simhash(None, bits=61)
    with _pytest.raises(ValueError, match="bands must cover"):
        simhash_near_pairs(None, bits=50, bands=4)
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs(None, max_hamming=4, bands=4)


def test_simhash_max_bucket_cap_drops_only_hot_buckets(spark):
    """The production cap (max_bucket) must be loss-free when every
    band bucket fits under it, and must drop exactly the hot-bucket
    pairs when it bites: 6 byte-identical docs share every band
    (bucket size 6 > cap 5 -> all their pairs vanish), while a
    distinct near-dup pair in small buckets survives any cap >= 2."""
    from gmall_realtime_flink_spark.operators.textstats import (
        simhash,
        simhash_near_pairs,
    )

    rows = [(i, "alpha beta gamma delta") for i in range(6)]
    rows += [(10, "omega psi chi phi"), (11, "omega psi chi rho")]
    frame = spark.createDataFrame(rows, "doc_id long, text string")
    fps = simhash(frame, bits=48)

    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_pairs(fps, bits=48).collect()
    }
    loose = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_pairs(fps, bits=48, max_bucket=100).collect()
    }
    tight = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_pairs(fps, bits=48, max_bucket=5).collect()
    }
    assert loose == uncapped  # cap above every bucket: loss-free
    clone_pairs = {(a, b) for a in range(6) for b in range(6) if a < b}
    assert clone_pairs <= uncapped
    assert tight.isdisjoint(clone_pairs)  # hot bucket dropped whole
    if (10, 11) in uncapped:  # near-dup pair lives in size-2 buckets
        assert (10, 11) in tight


# --- exact substring dedup: operator vs brute-force reference ---------

_substr_corpus = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]),  # tiny alphabet ->
        min_size=0, max_size=14,                    # collisions likely
    ),
    min_size=1, max_size=6,
)


def _brute_spans(docs: list[list[str]], k: int) -> set[tuple]:
    """Reference semantics, O(n^2): mark every position covered by a
    k-gram occurring >= 2 times corpus-wide, merge contiguous
    coverage into maximal per-doc spans (1-based inclusive)."""
    from collections import Counter

    grams = Counter()
    for toks in docs:
        for i in range(len(toks) - k + 1):
            grams[tuple(toks[i:i + k])] += 1
    out = set()
    for doc_id, toks in enumerate(docs):
        covered = sorted({
            p
            for i in range(len(toks) - k + 1)
            if grams[tuple(toks[i:i + k])] >= 2
            for p in range(i + 1, i + k + 1)  # 1-based coverage
        })
        if not covered:
            continue
        start = prev = covered[0]
        for p in covered[1:]:
            if p == prev + 1:
                prev = p
                continue
            out.add((doc_id, start, prev, prev - start + 1))
            start = prev = p
        out.add((doc_id, start, prev, prev - start + 1))
    return out


@settings(max_examples=15, deadline=None)
@given(docs=_substr_corpus)
def test_repeated_substring_spans_matches_bruteforce(spark, docs):
    """repeated_substring_spans == the quadratic reference definition
    on random tiny-alphabet corpora (the collision-heavy regime where
    island merging, within-doc repeats, and cross-doc repeats all
    interact)."""
    from gmall_realtime_flink_spark.operators.dedup import (
        repeated_substring_spans,
    )

    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in repeated_substring_spans(df, k=k).collect()
    }
    assert got == _brute_spans(docs, k)


@settings(max_examples=10, deadline=None)
@given(docs=_substr_corpus)
def test_substring_incremental_is_target_filtered_full(spark, docs):
    """The incremental form's contract, property-checked: spans for
    target docs == the FULL-corpus spans restricted to those docs
    (duplicate counts always see everything; only emission filters).
    Target = even doc_ids, mimicking the src0 new-batch predicate."""
    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.operators.dedup import (
        repeated_substring_spans,
    )

    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    full = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_substring_spans(df, k=k).collect()
        if r.doc_id % 2 == 0
    }
    incr = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_substring_spans(
            df, k=k, target=F.col("doc_id") % 2 == 0
        ).collect()
    }
    assert incr == full


# ---------------------------------------------------------------------------
# BPE merge training (operators/textstats.bpe_train_merges)
# ---------------------------------------------------------------------------


def _ref_bpe(word_freqs: dict, n: int) -> list:
    """Single-node reference BPE (Sennrich et al. 2016 learn_bpe):
    argmax pair with (count DESC, pair ASC) tie-break, greedy
    non-overlapping left-to-right re-segmentation."""
    seg = {w: tuple(w) for w in word_freqs}
    res = []
    for step in range(1, n + 1):
        counts: dict = {}
        for w, f in word_freqs.items():
            s = seg[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        res.append((step, a, b, a + b, c))

        def merge_word(s):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return tuple(out)

        seg = {w: merge_word(s) for w, s in seg.items()}
    return res


@settings(max_examples=10, deadline=None)
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=8),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_bpe_train_merges_matches_reference(spark, words, n):
    """The distributed trainer reproduces the single-node reference
    BPE exactly on ANY corpus — argmax tie-breaks, the floor(run/2)
    same-symbol overlap rule, and early stop when the vocabulary runs
    out of adjacent pairs. The tiny 4-letter alphabet forces heavy
    ties and same-symbol runs (the two places a distributed
    re-implementation would diverge)."""
    from gmall_realtime_flink_spark.operators.textstats import (
        bpe_train_merges,
    )

    wf: dict = {}
    for w, f in words:
        wf[w] = wf.get(w, 0) + f
    df = spark.createDataFrame(list(wf.items()), "w string, f long")
    got = sorted(
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train_merges(df, n_merges=n).collect()
    )
    assert got == _ref_bpe(wf, n)


@settings(max_examples=25, deadline=None)
@given(
    bpp=st.sampled_from([1, 2, 3, 4]),
    npix=st.integers(min_value=1, max_value=60),
    data=st.randoms(use_true_random=False),
)
def test_png_unfilter_vectorized_equals_scalar(bpp, npix, data):
    """The numpy/specialised unfilter paths must reconstruct byte-
    identically to the RFC 2083 reference loop for every filter type
    on arbitrary rows (uint8 wraparound, lane cumsum, abs-free Paeth
    predictor are each easy to get subtly wrong)."""
    from gmall_realtime_flink_spark.operators.multimodal import (
        _png_unfilter_row,
        _png_unfilter_row_scalar,
    )

    n = bpp * npix
    filt = bytes(data.randrange(256) for _ in range(n))
    prev = bytes(data.randrange(256) for _ in range(n))
    for ftype in range(5):
        assert _png_unfilter_row(ftype, filt, prev, bpp) == \
            _png_unfilter_row_scalar(ftype, filt, prev, bpp)
