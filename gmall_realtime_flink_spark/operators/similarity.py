"""Similarity search over an embedding column (beyond-reference).

Two tiers:

- `cosine_topk` — brute-force exact top-k: the correctness baseline.
  The query vector rides along as a broadcast single-row cross join
  (no `.collect()`, no driver round-trip); dot/norm are JVM-side
  `aggregate`/`zip_with` folds over the double-cast array. One
  TakeOrderedAndProject finishes it — no global sort shuffle.
- `cosine_topk_bucketed` — the ANN scale path: a deterministic
  sign-bit signature over the leading dimensions buckets the space
  (an IVF-style coarse quantizer with hyperoctant cells instead of
  k-means centroids); only the query's bucket is scanned. At 100 TB
  the bucket column is a partition key: candidate scan touches one
  partition (partition pruning), and recall is tuned by probing
  neighboring buckets (multi-probe), exactly like IVF `nprobe`.

Determinism across engines: all arithmetic in float64 after an
explicit cast from the stored float32 (exact), similarity rounded to
6dp, ties broken on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.operators.lineage import cut_lineage

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), "
    "(acc, v) -> acc + v)"
)
AS_DOUBLE = "transform({c}, x -> cast(x as double))"


def valid_embeddings(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Rows whose vector is usable: a non-NULL array whose elements are
    all non-NULL and FINITE. The engines disagree on NULL-element
    arithmetic (DuckDB list_sum SKIPS NULL elements and
    list_cosine_similarity raises; Spark's aggregate/zip_with folds
    propagate NULL) and on non-finite arithmetic (NaN ordering,
    NaN/Inf in aggregates — DuckDB's stddev/DECIMAL casts RAISE on
    NaN), so the data model excludes such vectors from every vector
    operator at the scan — pinned by the adversarial corpus rows
    vec_id=67 (NULL element) and 68-70 (NaN/±Inf elements). The
    predicate is NULL for a whole-NULL array, so those rows drop too
    (zero-NORM vectors stay: their elements are valid, and both
    engines agree on NULL-on-divide-by-zero cosine)."""
    return df.filter(
        F.expr(
            f"NOT exists({col}, x -> x IS NULL OR isnan(x) "
            "OR abs(cast(x AS DOUBLE)) = double('Infinity'))"
        )
    )


def _with_query(
    embeddings: DataFrame, query_id: int, where=None
) -> DataFrame:
    embeddings = valid_embeddings(embeddings)
    q = embeddings.filter(F.col("vec_id") == query_id).select(
        F.expr(AS_DOUBLE.format(c="embedding")).alias("q_emb")
    )
    cand = embeddings.filter(F.col("vec_id") != query_id)
    if where is not None:
        # metadata PRE-filter: pushed to the candidate scan BEFORE any
        # distance compute (post-filtering a top-k under-fills k)
        cand = cand.filter(where)
    return cand.withColumn(
        "emb", F.expr(AS_DOUBLE.format(c="embedding"))
    ).crossJoin(F.broadcast(q))


def _cosine(df: DataFrame) -> DataFrame:
    dot = F.expr(DOT.format(a="emb", b="q_emb"))
    na = F.sqrt(F.expr(DOT.format(a="emb", b="emb")))
    nb = F.sqrt(F.expr(DOT.format(a="q_emb", b="q_emb")))
    # try_divide: cosine of a zero-norm vector is undefined -> NULL
    # (DuckDB's x/0 is NULL natively; a plain `/` is an ANSI
    # ArithmeticException). NULL cos_sim never enters a top-k (sorts
    # last) and never passes a >= threshold filter — both engines
    # agree. Null embeddings propagate NULL through the same path.
    return df.withColumn(
        "cos_sim", F.round(F.try_divide(dot, na * nb), 6) + F.lit(0.0)
    )


def _ranked_topk(
    scored: DataFrame, k: int, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    top = scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(k)
    # rank WITHOUT a window function: the <= k rows surviving the
    # TakeOrderedAndProject fold into one sort_array'd struct array
    # (single-group partial agg), then posexplode re-emits them with
    # rk = position + 1. Bounded at k rows regardless of corpus size,
    # and no WindowExec in the plan — a constant partition key gets
    # constant-folded to an empty partition spec, which logs the
    # "No Partition Defined" warning even though the input is tiny.
    # The ascending sort key mirrors ORDER BY cos_sim DESC exactly,
    # including the edge order both engines give a DESC sort: NaN
    # first (→ -inf), NULL last (→ +inf); a bare negation would flip
    # both (-NaN is still NaN and sorts LAST ascending).
    neg_sim = (
        F.when(F.col("cos_sim").isNull(), F.lit(float("inf")))
        .when(F.isnan("cos_sim"), F.lit(float("-inf")))
        .otherwise(-F.col("cos_sim"))
    )
    s = F.struct(
        neg_sim.alias("neg_sim"),
        F.col("vec_id").alias("vec_id"),
        F.col("cos_sim").alias("cos_sim"),
        *[F.col(c).alias(c) for c in extra_cols],
    )
    arr = top.agg(F.sort_array(F.collect_list(s)).alias("a"))
    return arr.select(F.posexplode("a").alias("pos", "s")).select(
        F.col("s.vec_id").alias("vec_id"),
        *[F.col(f"s.{c}").alias(c) for c in extra_cols],
        F.col("s.cos_sim").alias("cos_sim"),
        (F.col("pos") + 1).alias("rk"),
    )


def cosine_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    where=None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact brute-force cosine top-k against the query vector; `where`
    is the metadata pre-filter (filtered vector search), `extra_cols`
    carries metadata columns into the ranked output."""
    return _ranked_topk(
        _cosine(_with_query(embeddings, query_id, where=where)),
        k,
        extra_cols,
    )


def auto_bits(
    n_vectors: int, target_cell: int = 1024, lo: int = 4, hi: int = 16
) -> int:
    """Cell count that SCALES with the corpus: bits =
    clamp(ceil(log2(n / target_cell)), lo, hi), i.e. ~n/target_cell
    cells so the per-cell pair block stays ~target_cell² regardless of
    corpus size. A FIXED bits went quadratic at sf10 (200k vectors /
    16 cells = 12.5k-row cells → 156M pairs per cell — the round-6
    exclusion); auto bits=8 keeps cells ~780 rows there. The formula
    is mirrored verbatim in the DuckDB oracles
    (greatest(lo, least(hi, ceil(log2(n/1024.0))::INT))) so the
    entries stay hash-gated at every SF. hi=16 also respects the
    minimum embedding dim. The input count is the only driver-side
    action — a metadata-only parquet count, no data scan."""
    import math

    if n_vectors <= target_cell:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_vectors / target_cell))))


def corpus_count_for_auto_bits(embeddings: DataFrame) -> int:
    """The `auto_bits` input count, with the no-extra-scan claim
    guarded: on a RAW parquet-backed frame, `count()` compiles to
    footer row-group counts (metadata-only — the basis for "one cheap
    extra job per query"). If a caller hands a FILTERED/JOINED frame,
    the same call silently becomes a full scan; that may still be the
    right bits value (cells should track the post-filter corpus), but
    the cost claim no longer holds — so we warn rather than raise,
    naming the offending plan node. Pinned by
    tests/test_plans.py::test_auto_bits_count_warns_on_filtered_frame.
    """
    if _plan_has_filter_or_join(embeddings):
        import warnings

        warnings.warn(
            "auto_bits count over a filtered/joined frame is a full "
            "scan, not a metadata-only parquet count — pass the raw "
            "embeddings table (or precompute bits) to keep plan build "
            "cheap",
            stacklevel=3,
        )
    return embeddings.count()


def _plan_has_filter_or_join(df: DataFrame) -> bool:
    """True iff the optimized logical plan contains a Filter/Join node.

    Public-API only (ADVICE r8/r9: the old form read the private
    `_jdf.queryExecution()`): captures `df.explain("extended")` output
    and matches node names at LINE STARTS of the Optimized Logical
    Plan section — a relation column named `join_date` or
    `filtered_at` appears mid-line (`Relation [join_date#1,...]`) and
    can no longer trigger a permanent false warning. Node-name
    spelling is pinned by a canary test
    (tests/test_plans.py::test_plan_sniff_canary) that fails loudly if
    a Spark upgrade renames Filter/Join in explain output."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    txt = buf.getvalue()
    m = re.search(
        r"== Optimized Logical Plan ==\n(.*?)(\n== |\Z)", txt, re.S
    )
    section = m.group(1) if m else txt
    # tree-drawing prefix (spaces, +- :- :) then the node name
    return bool(
        re.search(r"^[\s+:\-]*(Filter\b|[A-Za-z]*Join\b)", section, re.M)
    )


def sign_bucket(col_name: str, bits: int = 4) -> F.Column:
    """IVF-style coarse cell: bit i set iff embedding[i] >= 0
    (1-based element_at, mirroring the DuckDB oracle)."""
    terms = " + ".join(
        f"(CASE WHEN element_at({col_name}, {i + 1}) >= cast(0.0 as double) "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return F.expr(terms)


def cosine_topk_bucketed(
    embeddings: DataFrame, query_id: int = 0, k: int = 10, bits: int = 4
) -> DataFrame:
    """ANN top-k scanning only the query's sign-bucket (cell)."""
    df = _with_query(embeddings, query_id)
    df = df.withColumn("bucket", sign_bucket("emb", bits)).withColumn(
        "q_bucket", sign_bucket("q_emb", bits)
    )
    pruned = df.filter(F.col("bucket") == F.col("q_bucket")).drop(
        "bucket", "q_bucket"
    )
    return _ranked_topk(_cosine(pruned), k)


def _round_half_up6(c):
    """6dp HALF_UP (round half AWAY from zero) — Spark F.round's
    rounding mode, emulated so the numpy twin's threshold filter can't
    flip pair-SET membership against the expr path on a 6dp boundary
    (np.round is half-to-even; ADVICE r9). sign*floor(|c|*1e6+0.5)/1e6;
    NaN propagates (floor(NaN)=NaN), -0.0 folds to +0.0 via `+ 0.0`."""
    import numpy as np

    return np.sign(c) * np.floor(np.abs(c) * 1e6 + 0.5) / 1e6 + 0.0


def embedding_near_dup_pairs_numpy(
    embeddings: DataFrame, threshold: float = 0.4, bits: int | None = None
) -> DataFrame:
    """The Arrow-batched production kernel for `embedding_near_dup_pairs`:
    identical bucketing (sign-bit cells, auto-scaled), but the per-cell
    pairwise cosine is ONE numpy matmul per cell via applyInPandas
    instead of a JVM scalar fold per pair — the sf10 moments run showed
    the fold 7.5× slower than DuckDB's vectorized kernel on this exact
    shape (173 s vs 23 s), and at 100 TB the ANN family runs on batch
    BLAS, not per-element expressions. Measured 2.7 s vs 173-306 s at
    sf10 and 18.4 s vs 1814.7 s at sf100 (99×, exact same 6.07M pairs
    and bit-identical 6dp sum(cos_sim) as the oracle-verified expr
    run — SCALE.md round-9): the fold pays |pairs|x|dim| scalar ops
    through codegen, the kernel pays one (n x dim)@(dim x n) BLAS
    call per ~1024-row cell.

    Determinism: float64 matmul per cell, rounded to 6dp — the same
    arithmetic class as the fold, but a different summation ORDER, so
    a cosine landing within ~1e-15 of a 6dp boundary may round apart
    from the oracle-gated path. Hence this is the PRODUCTION twin
    (benched + parity-pinned by pytest within 2e-6), while the expr
    form stays the oracle surface — exactly the md5/xxhash64 split
    the MinHash stack uses."""
    import pandas as pd

    from pyspark.sql import types as T

    if bits is None:
        bits = auto_bits(corpus_count_for_auto_bits(embeddings))
    e = valid_embeddings(embeddings).select(
        "vec_id",
        F.expr(AS_DOUBLE.format(c="embedding")).alias("emb"),
    ).withColumn("bucket", sign_bucket("emb", bits))

    out_schema = T.StructType([
        T.StructField("vec_a", T.LongType()),
        T.StructField("vec_b", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "cos_sim": []}
            ).astype({"vec_a": "int64", "vec_b": "int64",
                      "cos_sim": "float64"})
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["emb"].to_numpy())           # (n, dim) float64
        nrm = np.linalg.norm(m, axis=1)
        sims = m @ m.T                                 # one BLAS call
        denom = np.outer(nrm, nrm)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0, sims / denom, np.nan)
        iu, ju = np.triu_indices(n, k=1)
        # vec_a < vec_b by VALUE (the expr path's join condition),
        # not by row position
        a, b = ids[iu], ids[ju]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        c = _round_half_up6(cos[iu, ju])
        keep = ~np.isnan(c) & (c >= threshold)
        return pd.DataFrame(
            {"vec_a": lo[keep], "vec_b": hi[keep], "cos_sim": c[keep]}
        )

    return e.groupBy("bucket").applyInPandas(cell_pairs, out_schema)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.4, bits: int | None = None
) -> DataFrame:
    """Embedding-cosine near-dup detection: candidate pairs share a
    sign-bit cell (the same coarse quantizer as the ANN path), cosine
    computed only within cells — |pairs-per-cell| work, never the full
    quadratic all-pairs. The cell join shuffles on the bucket id, so at
    100 TB it's one bucketed shuffle + per-cell comparison.

    `threshold` is corpus-dependent: ~0.95 for real near-duplicate
    embeddings; the synthetic testdata's in-cell max is ~0.51.
    Multi-probe (neighboring cells) trades recall for cost exactly as
    in the ANN path.
    """
    if bits is None:
        bits = auto_bits(corpus_count_for_auto_bits(embeddings))
    embeddings = valid_embeddings(embeddings)
    e = (
        embeddings.select(
            "vec_id",
            F.expr(AS_DOUBLE.format(c="embedding")).alias("emb"),
        )
        .withColumn("bucket", sign_bucket("emb", bits))
        # per-vector norm folded ONCE before the self-join (the
        # knn_self_join lesson): inside the pair relation each norm
        # fold would re-run per PAIR — 3× the lambda steps
        .withColumn("nrm", F.sqrt(F.expr(DOT.format(a="emb", b="emb"))))
    )
    # r14: lazy lineage cut — the self-join consumes `e` twice, so the
    # scan + validity filter + norm fold executed once per side (the
    # build side re-ran the pipeline under its own broadcast; same
    # disease and cure as lsh_candidates)
    e = cut_lineage(e)
    e = e.repartition("bucket")
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        "bucket",
    ).alias("a")
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        "bucket",
    ).alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("vec_a") < F.col("vec_b")),
    )
    dot = F.expr(DOT.format(a="emb_a", b="emb_b"))
    na = F.col("nrm_a")
    nb = F.col("nrm_b")
    scored = pairs.select(
        "vec_a",
        "vec_b",
        # try_divide: zero-norm vectors -> NULL cos_sim -> filtered out
        # below, matching DuckDB's NULL-on-/0 (see _cosine)
        (F.round(F.try_divide(dot, na * nb), 6) + F.lit(0.0)).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def _centroid_sim(df: DataFrame, vec: str) -> DataFrame:
    """Cosine to the centroid, rounded to 6dp. If the frame carries
    precomputed `{vec}_nrm` / `cvec_nrm` columns they are used instead
    of re-folding the norm PER PAIR — norms are per-vector quantities,
    and inside an N×K cross each inline fold would run K (resp. N)
    times redundantly (the knn_self_join lesson; measured 3× on the
    sf10 kmeans assignment). Hoisting does not change the arithmetic:
    same fold, same operands, same round order."""
    cols = set(df.columns)
    dot = F.expr(DOT.format(a=vec, b="cvec"))
    na = (
        F.col(f"{vec}_nrm")
        if f"{vec}_nrm" in cols
        else F.sqrt(F.expr(DOT.format(a=vec, b=vec)))
    )
    nc = (
        F.col("cvec_nrm")
        if "cvec_nrm" in cols
        else F.sqrt(F.expr(DOT.format(a="cvec", b="cvec")))
    )
    return df.withColumn(
        "c_sim", F.round(F.try_divide(dot, na * nc), 6) + F.lit(0.0)
    )


def kmeans_centroids(
    embeddings: DataFrame, n_cells: int = 8, iters: int = 2
) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding corpus, as pure
    DataFrame ops (the iterative-driver pattern of
    `dedup.connected_components`, but with a fixed iteration count so
    the whole training is ONE lazy plan — no driver-side convergence
    loop needed for a coarse quantizer).

    Determinism (bit-identical in Spark and the DuckDB oracle):
    - seeds = the first `n_cells` vectors (no rand());
    - assignment = argmax of cosine rounded to 6dp, ties to the lowest
      centroid id (partial-aggregatable max_by — never an N×K window);
    - new centroid coordinate = exact DECIMAL(38,12) sum of members
      (order-independent, the `dec_sum` trick) cast to double, divided
      by the member count — identical IEEE division in both engines;
    - a cell that loses all members keeps its previous centroid.

    Scale: each iteration is one broadcast cross (N×K similarity,
    map-side max_by partial agg) + one posexplode mean whose exchange
    carries |cells|×|dims| per map partition — both linear in N.
    """
    e = valid_embeddings(embeddings).select(
        "vec_id", F.expr(AS_DOUBLE.format(c="embedding")).alias("emb")
    ).withColumn(  # per-vector norm hoisted out of the N×K cross
        "emb_nrm", F.sqrt(F.expr(DOT.format(a="emb", b="emb")))
    )
    # REBALANCE before the compute-bound cross: the N×K fold costs
    # ~K×dim work PER INPUT ROW, but a narrow stage inherits SCAN
    # parallelism — and parquet can't split a row group, so a
    # single-row-group table runs the whole corpus on ONE task
    # (observed at sf10: 12 of 13 byte-range splits were empty).
    # Values are unaffected: every downstream agg is order-independent
    # (max_by on a totally-ordered struct, exact decimal means).
    # r13: lazy-checkpointed — every Lloyd iteration references `e`,
    # and without the cut each iteration branch re-ran the scan +
    # norm + repartition (MLlib's iterative trainers cache their
    # input for the same reason; at production scale this is the
    # standard train-input persist, spillable to disk).
    e = e.repartition(
        int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ).transform(cut_lineage)
    cent = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cvec")
    )
    return _lloyd_iterate(e, cent, iters)


def _lloyd_iterate(e: DataFrame, cent: DataFrame, iters: int) -> DataFrame:
    """The deterministic Lloyd loop shared by `kmeans_centroids`
    (vec_id < K seeds) and `semantic_dedup_resplit`'s second-level
    training (rank seeds over an arbitrary scoped subset). `e` is
    (vec_id, emb[, emb_nrm]); `cent` is the seed frame (cid, cvec).
    Arithmetic identical to the historical inline loop: 6dp-rounded
    cosine assignment with ties to the lowest cid, exact
    DECIMAL(38,12) member means, empty cells keep their centroid.

    r13: each iteration ends in a LAZY localCheckpoint of the K-row
    centroid frame — without it, iteration i's plan embeds iteration
    i-1 TWICE (once under `assigned`, once under the coalesce join),
    so the input cross re-executed 2^iters times per action (guide
    §5 — lineage). Lazy keeps the work inside the first timed action;
    K rows × dim doubles is trivially small."""
    for _ in range(iters):
        cent_n = cent.withColumn(  # K rows — cheap
            "cvec_nrm", F.sqrt(F.expr(DOT.format(a="cvec", b="cvec")))
        )
        assigned = (
            _centroid_sim(e.crossJoin(F.broadcast(cent_n)), "emb")
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "cid",
                    F.struct(F.col("c_sim"), (-F.col("cid")).alias("nc")),
                ).alias("cell"),
                F.first("emb").alias("emb"),
            )
        )
        means = (
            assigned.select("cell", F.posexplode("emb").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(38,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("mvec")
            )
        )
        cent = (
            cent.join(means, cent["cid"] == means["cell"], "left")
            .select("cid", F.coalesce("mvec", "cvec").alias("cvec"))
            .transform(cut_lineage)
        )
    return cent


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    train_iters: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: assign every vector to its
    nearest coarse centroid, probe only the `nprobe` cells nearest the
    query.

    Centroids are k-means-trained by `kmeans_centroids` — fixed Lloyd
    iteration count, deterministic seeds, exact-decimal means, so the
    index is reproducible and the DuckDB oracle recomputes the SAME
    iterations (`train_iters=0` degrades to raw seed centroids, the
    recall baseline the property test compares against).

    Scale design (100 TB): the build pass is a broadcast cross of N
    vectors × K centroids folded by `max_by` — a partial-aggregatable
    single agg, no window shuffle over N×K rows. `cell` then becomes
    the table's partition key: the probe scans `nprobe` partitions
    (partition pruning), recall tuned by nprobe exactly as in FAISS
    IVF. Candidate scoring reuses the brute-force kernel on the pruned
    set.
    """
    embeddings = valid_embeddings(embeddings)
    # `centroids` threads a PRE-TRAINED index in (ADVICE r11: the skew
    # tool measured a standalone build's cell distribution while the
    # probe retrained its own — same seeds/iters, but now the measured
    # index IS the probed one, and the redundant training pass is gone)
    cent = (
        centroids
        if centroids is not None
        else kmeans_centroids(embeddings, n_cells=n_cells, iters=train_iters)
    )

    def centroid_sim(df: DataFrame, vec: str) -> DataFrame:
        return _centroid_sim(df, vec)

    e = embeddings.filter(F.col("vec_id") != query_id).withColumn(
        "emb", F.expr(AS_DOUBLE.format(c="embedding"))
    )
    # build: nearest centroid per vector — max_by over a (sim, -cid)
    # struct = ORDER BY sim DESC, cid ASC, but partial-aggregatable
    assigned = (
        centroid_sim(e.crossJoin(F.broadcast(cent)), "emb")
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cid", F.struct(F.col("c_sim"), (-F.col("cid")).alias("nc"))
            ).alias("cell"),
            F.first("emb").alias("emb"),
        )
    )
    q = embeddings.filter(F.col("vec_id") == query_id).select(
        F.expr(AS_DOUBLE.format(c="embedding")).alias("q_emb")
    )
    qcells = (
        centroid_sim(q.crossJoin(F.broadcast(cent)), "q_emb")
        .orderBy(F.col("c_sim").desc(), "cid")
        .limit(nprobe)
        .select("cid")
    )
    cand = assigned.join(
        F.broadcast(qcells), assigned["cell"] == qcells["cid"], "left_semi"
    ).crossJoin(F.broadcast(q))
    return _ranked_topk(_cosine(cand), k)


def ivf_recall_curve(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_cells: int = 8,
    nprobes: tuple[int, ...] = (1, 2, 4),
    train_iters: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The IVF nprobe story with numbers: recall@k of the trained-IVF
    probe vs the exact brute-force top-k, one row per nprobe —
    (nprobe, k, hits, recall_at_k). Recall is monotone non-decreasing
    in nprobe (each probe set is a superset of the previous), which
    the property test pins.

    The index (trained centroids + cell assignment) is built ONCE and
    localCheckpoint'd, then each nprobe branch is a broadcast
    semi-join + k-row top-k — the cheap part. At 100 TB this runs on
    a sampled query set to pick nprobe before trusting the index
    (same audit FAISS users run offline).
    """
    embeddings = valid_embeddings(embeddings)
    exact = cosine_topk(embeddings, query_id=query_id, k=k).select("vec_id")
    cent = (
        centroids
        if centroids is not None
        else kmeans_centroids(embeddings, n_cells=n_cells, iters=train_iters)
    )
    e = embeddings.filter(F.col("vec_id") != query_id).withColumn(
        "emb", F.expr(AS_DOUBLE.format(c="embedding"))
    )
    assigned = (
        _centroid_sim(e.crossJoin(F.broadcast(cent)), "emb")
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cid", F.struct(F.col("c_sim"), (-F.col("cid")).alias("nc"))
            ).alias("cell"),
            F.first("emb").alias("emb"),
        )
        .transform(cut_lineage)
    )
    q = embeddings.filter(F.col("vec_id") == query_id).select(
        F.expr(AS_DOUBLE.format(c="embedding")).alias("q_emb")
    )
    qsims = _centroid_sim(
        q.crossJoin(F.broadcast(cent)), "q_emb"
    ).transform(cut_lineage)
    out = None
    for nprobe in nprobes:
        qcells = (
            qsims.orderBy(F.col("c_sim").desc(), "cid")
            .limit(nprobe)
            .select("cid")
        )
        cand = assigned.join(
            F.broadcast(qcells), assigned["cell"] == qcells["cid"], "left_semi"
        ).crossJoin(F.broadcast(q))
        ann = _ranked_topk(_cosine(cand), k).select("vec_id")
        row = (
            exact.join(ann, "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("hits"))
            .select(
                F.lit(nprobe).alias("nprobe"),
                F.lit(k).alias("k"),
                "hits",
                F.round(F.col("hits") / k, 6).alias("recall_at_k"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def knn_self_join(
    embeddings: DataFrame, k: int = 3, bits: int | None = None
) -> DataFrame:
    """Every vector's top-k nearest neighbors (the k-NN graph), bucketed
    by the sign-bit coarse quantizer so candidates are per-cell — one
    bucketed self-equi-join, never the N² all-pairs cross product.

    At 100 TB the bucket id is the shuffle (and storage-partition) key:
    each cell's candidate block fits one task, and recall is tuned by
    `bits` (fewer bits → bigger cells → higher recall, more compute) —
    the same trade as IVF nlist. Ranking is a per-vector partitioned
    window (never global): rank on (rounded sim DESC, neighbor id) so
    ties are deterministic cross-engine.
    """
    # norms are per-VECTOR, computed once before the join — inside the
    # pairs relation each norm fold would re-run m-1 times per cell
    # (O(m²·dim) redundant work at scale instead of O(m·dim))
    if bits is None:
        bits = auto_bits(corpus_count_for_auto_bits(embeddings))
    e = (
        # valid_embeddings FIRST: a NaN-element vector folds to a NaN
        # norm, and Spark's NaN ordering makes `NaN > 0` TRUE — the
        # norm filter alone would let non-finite vectors into the
        # graph (caught by the r10 hostile-rows gate)
        valid_embeddings(embeddings)
        .select(
            "vec_id", F.expr(AS_DOUBLE.format(c="embedding")).alias("emb")
        )
        .withColumn("bucket", sign_bucket("emb", bits))
        .withColumn("nrm", F.sqrt(F.expr(DOT.format(a="emb", b="emb"))))
        # invalid vectors (NULL array, zero norm) have no defined
        # cosine to anything — excluded from BOTH graph sides. A NULL
        # nrm fails `> 0` too. Mirrored in the registry oracles.
        .filter(F.col("nrm") > 0)
    )
    from gmall_realtime_flink_spark.operators.spread import spread_to_cores

    # r14 (guide §2.5, §5): lineage-cut `e` (it feeds both join sides,
    # so the scan + validity + norm pipeline executed once per side),
    # then spread the PROBE side to the core count — the per-pair
    # dot-product fold (the operator's dominant cost) runs in the
    # probe side's tasks when the build side broadcasts, and at bench
    # SFs the embeddings scan is one split, so the whole candidate
    # block otherwise computed in ONE task; skipped whenever the scan
    # parallelizes (production), where the bucket-keyed shuffle join
    # spreads the work by itself.
    e = cut_lineage(e)
    a = spread_to_cores(e).select(
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        "bucket",
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") != F.col("vec_b"))
    dot = F.expr(DOT.format(a="emb_a", b="emb_b"))
    scored = pairs.withColumn(
        "cos_sim",
        F.round(F.try_divide(dot, F.col("nrm_a") * F.col("nrm_b")), 6)
        + F.lit(0.0),
    )
    w = Window.partitionBy("vec_a").orderBy(
        F.col("cos_sim").desc(), F.col("vec_b")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("vec_a", "vec_b", "cos_sim", "rk")
    )


def hard_negative_pairs(
    embeddings: DataFrame, k: int = 3, bits: int | None = None
) -> DataFrame:
    """Contrastive hard-negative mining: for every anchor vector, the
    top-k most-similar vectors carrying a DIFFERENT label — the pairs
    a contrastive / metric-learning trainer wants as negatives
    (random negatives are trivially easy; the hard ones live near the
    decision boundary, i.e. high cosine, different class).

    Same scale posture as `knn_self_join`: candidates restricted to
    the sign-bit coarse cell (one bucketed self-equi-join, never the
    N² cross product) — which is exactly the right recall trade here,
    because a different-label vector OUTSIDE the anchor's cell is by
    construction far away and would never be a hard negative. Norms
    fold once per vector before the join; ranking is a per-anchor
    partitioned window on (rounded sim DESC, neighbor id) so ties are
    deterministic cross-engine. At 100 TB the bucket id is the
    shuffle/storage-partition key and `bits` tunes cell size.
    """
    if bits is None:
        bits = auto_bits(corpus_count_for_auto_bits(embeddings))
    e = (
        # valid_embeddings first — see knn_self_join: NaN norms pass a
        # bare `> 0` under Spark's NaN ordering
        valid_embeddings(embeddings)
        .select(
            "vec_id",
            "label",
            F.expr(AS_DOUBLE.format(c="embedding")).alias("emb"),
        )
        .withColumn("bucket", sign_bucket("emb", bits))
        .withColumn("nrm", F.sqrt(F.expr(DOT.format(a="emb", b="emb"))))
        # see knn_self_join: zero-norm / NULL vectors excluded
        .filter(F.col("nrm") > 0)
    )
    # r14: lazy lineage cut + probe-side spread, as in knn_self_join —
    # `e` feeds both join sides (pipeline executed once per side), and
    # the per-pair dot fold otherwise runs in the single scan task at
    # bench SFs
    from gmall_realtime_flink_spark.operators.spread import spread_to_cores

    e = cut_lineage(e)
    a = spread_to_cores(e).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        "bucket",
    )
    b = e.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        "bucket",
    )
    pairs = a.join(b, "bucket").filter(
        F.col("anchor_label") != F.col("neg_label")
    )
    dot = F.expr(DOT.format(a="emb_a", b="emb_b"))
    scored = pairs.withColumn(
        "cos_sim",
        F.round(F.try_divide(dot, F.col("nrm_a") * F.col("nrm_b")), 6)
        + F.lit(0.0),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "anchor_id", "anchor_label", "neg_id", "neg_label",
            "cos_sim", "rk",
        )
    )


def auto_cells(
    n_vectors: int, target_cell: int = 1024, lo: int = 8, hi: int = 4096
) -> int:
    """Coarse-cluster count that SCALES with the corpus: ~n/target_cell
    cells so the per-cell pairwise block stays ~target_cell² regardless
    of corpus size — the kmeans form of `auto_bits` (a FIXED cell count
    is exactly the quadratic cliff auto_bits closed at sf10). Mirrored
    verbatim in the DuckDB oracle:
    greatest(lo, least(hi, ceil(count(*) / 1024.0)::INT))."""
    import math

    return max(lo, min(hi, math.ceil(n_vectors / target_cell)))


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int | None = None,
    iters: int = 2,
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    semantic deduplication — the non-lexical dedup tier. K-means
    clusters the corpus (the coarse quantizer the IVF index already
    trains), pairwise cosine runs ONLY within clusters, and of every
    near-identical group one representative is kept.

    Keep rule (the paper's pruning with a deterministic ordering):
    vector b is dropped iff some SAME-CELL vector a with a LOWER
    vec_id has cosine(a, b) >= threshold — i.e. kept iff
    max_lower_sim < threshold (the paper orders by distance to the
    centroid; vec_id ordering makes the result engine-reproducible,
    the same min-id canonicalization the exact-dedup family uses).

    Output: one verdict row per valid vector —
    (vec_id, cell, max_lower_sim, kept); max_lower_sim is NULL when
    the vector has no lower-id cell-mate (or only zero-norm ones),
    and NULL is kept (both engines agree: max skips NULLs,
    coalesce(NULL < t, TRUE)).

    Scale (100 TB): cluster count auto-scales (`auto_cells`,
    ~n/1024), so the in-cell pair block stays ~1024² per cell and
    total pair work is ~n*512 cosines — linear, never all-pairs.
    The N×K assignment cross is a broadcast of K centroids with a
    map-side max_by partial agg (linear in N·K); `assigned` is
    lazily localCheckpoint'd so its three consumers (both self-join
    sides + the verdict join) share ONE materialization instead of
    recomputing the cross. The N×K expr fold is the ORACLE surface —
    the production path is `semantic_dedup_numpy`, which runs both
    the assignment scan and the in-cell block on batch BLAS (the
    measured-99× `embedding_near_dup_pairs_numpy` split).

    `max_cell` is the HOT-CELL insurance (the embedding-space
    analogue of lsh_candidates' max_bucket): auto_cells targets
    ~1024 vectors/cell, but a boilerplate-dominated corpus piles a
    dominant template cluster into one cell and the in-cell pair
    block goes quadratic there (measured on the skewed-emb corpus:
    the top cell carries >20% of the corpus). With max_cell set,
    cells above it are EXCLUDED from the pair stage — their members
    keep a NULL max_lower_sim / kept=TRUE verdict and are flagged
    `cell_capped=TRUE` (a 5th output column, only in capped mode) so
    downstream can route them to a re-split or a sampled pass instead
    of silently treating them as deduped."""
    if n_cells is None:
        n_cells = auto_cells(corpus_count_for_auto_bits(embeddings))
    cent = kmeans_centroids(
        embeddings, n_cells=n_cells, iters=iters
    ).withColumn(  # K rows — hoisted out of the N×K assignment cross
        "cvec_nrm", F.sqrt(F.expr(DOT.format(a="cvec", b="cvec")))
    )
    e = valid_embeddings(embeddings).select(
        "vec_id", F.expr(AS_DOUBLE.format(c="embedding")).alias("emb")
    ).withColumn(
        "emb_nrm", F.sqrt(F.expr(DOT.format(a="emb", b="emb")))
    )
    # rebalance the compute-bound assignment cross away from scan
    # parallelism (see kmeans_centroids: one row group = one task)
    e = e.repartition(
        int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    )
    assigned = (
        _centroid_sim(e.crossJoin(F.broadcast(cent)), "emb")
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cid", F.struct(F.col("c_sim"), (-F.col("cid")).alias("nc"))
            ).alias("cell"),
            F.first("emb").alias("emb"),
            # per-vector norm rides the checkpoint so the pair stage
            # pays ONE dot fold per pair, not three
            F.first("emb_nrm").alias("nrm"),
        )
        # materialized ONCE (lazily): three consumers (two self-join
        # sides + the verdict join) would otherwise each recompute the
        # N×K assignment cross
        .transform(cut_lineage)
    )
    pair_src = assigned
    if max_cell is not None:
        # per-cell counts are <= K rows (K <= 4096) — broadcastable by
        # construction; only members of small-enough cells enter the
        # quadratic pair stage
        counts = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("cell_n")
        )
        pair_src = assigned.join(
            F.broadcast(
                counts.filter(F.col("cell_n") <= max_cell).select("cell")
            ),
            "cell",
        )
    a = pair_src.select(
        F.col("vec_id").alias("a_id"),
        F.col("cell").alias("a_cell"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = pair_src.select(
        F.col("vec_id").alias("b_id"),
        F.col("cell").alias("b_cell"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = a.join(
        b, (F.col("a_cell") == F.col("b_cell")) & (F.col("a_id") < F.col("b_id"))
    )
    dot = F.expr(DOT.format(a="emb_a", b="emb_b"))
    na = F.col("nrm_a")
    nb = F.col("nrm_b")
    # try_divide: zero-norm pair cosine is NULL in both engines (the
    # oracle divides list_dot_products explicitly — DuckDB's native
    # list_cosine_similarity returns -1.0 on a zero vector, which
    # would poison the max)
    s = F.round(F.try_divide(dot, na * nb), 6) + F.lit(0.0)
    mls = (
        pairs.select(F.col("b_id").alias("vec_id"), s.alias("s"))
        .groupBy("vec_id")
        .agg(F.max("s").alias("max_lower_sim"))
    )
    verdicts = assigned.drop("emb", "nrm").join(mls, "vec_id", "left")
    kept = F.coalesce(
        F.col("max_lower_sim") < F.lit(threshold), F.lit(True)
    ).alias("kept")
    if max_cell is None:
        return verdicts.select("vec_id", "cell", "max_lower_sim", kept)
    return verdicts.join(F.broadcast(counts), "cell").select(
        "vec_id",
        "cell",
        "max_lower_sim",
        kept,
        (F.col("cell_n") > max_cell).alias("cell_capped"),
    )


def _np_assign_cells(pdf, cu, cids):
    """Per-batch nearest-centroid assignment, HALF_UP-6dp rounded sims,
    ties and all-NULL (zero-norm) to the LOWEST cid — the numpy image
    of the expr path's max_by((c_sim, -cid)) with try_divide NULLs."""
    import numpy as np

    m = np.stack(pdf["emb"].to_numpy())
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = np.where(nrm > 0, m / np.where(nrm > 0, nrm, 1.0), np.nan) @ cu.T
    r = _round_half_up6(sims)
    r = np.where(np.isnan(r), -np.inf, r)  # NULL sims sort last
    # cids ascend, argmax returns the FIRST max -> lowest cid on ties
    return cids[np.argmax(r, axis=1)]


def semantic_dedup_numpy(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int | None = None,
    iters: int = 2,
    max_cell: int | None = None,
    block: int = 4096,
) -> DataFrame:
    """The BLAS production twin of `semantic_dedup` (the established
    expr-oracle / numpy-production split of the ANN family): every
    N×K or in-cell N² scan runs as a numpy matmul inside Arrow
    batches instead of a JVM scalar fold per element —
    `embedding_near_dup_pairs_numpy` measured this swap at 99× on the
    same shape at sf100.

    Training stays HYBRID so centroids are bit-identical to the expr
    path: assignment per Lloyd iteration is numpy (mapInPandas,
    broadcast K×d centroid matrix), but the new means are the SAME
    exact-DECIMAL(38,12) posexplode aggregate kmeans_centroids uses
    (order-independent — a float64 mean would drift with partition
    order and flake the parity pin). The per-iteration driver collect
    is the MODEL, K×d doubles (≤4096×dim, a few MB) — the bounded
    broadcast-dim exception, independent of corpus size.

    Parity with semantic_dedup is pytest-pinned: identical kept SETS,
    max_lower_sim within 2e-6 (different float64 summation order,
    same arithmetic).

    `max_cell` mirrors the expr path's hot-cell cap (members of
    oversized cells skip the pair block, kept=TRUE,
    cell_capped=TRUE). Independently of the cap, the in-cell M
    statistic runs BLOCKED (4096-row slabs against the j<i prefix),
    so even an UNCAPPED hot cell of H vectors peaks at ~4096×H
    floats instead of H² — on the skewed-emb corpus's 20%-of-corpus
    template cell the full Gram matrix would not fit an Arrow
    worker."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    if n_cells is None:
        n_cells = auto_cells(corpus_count_for_auto_bits(embeddings))
    e = (
        valid_embeddings(embeddings)
        .select(
            "vec_id", F.expr(AS_DOUBLE.format(c="embedding")).alias("emb")
        )
        # rebalance away from scan parallelism before the checkpoint:
        # the BLAS assignment maps over these partitions, and a
        # single-row-group parquet file would pin it to one task
        # (see kmeans_centroids)
        .repartition(
            int(
                embeddings.sparkSession.conf.get(
                    "spark.sql.shuffle.partitions"
                )
            )
        )
        .transform(cut_lineage)
    )

    out_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.LongType()),
        T.StructField("max_lower_sim", T.DoubleType()),
        T.StructField("kept", T.BooleanType()),
    ])
    if max_cell is not None:
        out_schema = out_schema.add(T.StructField("cell_capped", T.BooleanType()))

    # Driver memory here is K seed rows of dim-D doubles (K·D·8 bytes;
    # K = n_cells ≈ √N, dim 64 → a few MB even at sf100), NOT a data
    # collect — the coarse quantizer's centroid table is driver-sized
    # by construction, same bound as the per-iteration means below.
    seed_rows = (
        e.filter(F.col("vec_id") < n_cells).orderBy("vec_id").collect()
    )
    if not seed_rows:
        # no valid vector with vec_id < n_cells (hostile / empty corpus):
        # the expr twin degrades to an empty result (empty centroid set
        # -> empty assignment); np.stack of [] would raise instead
        return embeddings.sparkSession.createDataFrame([], out_schema)
    cids = np.array([r.vec_id for r in seed_rows], dtype=np.int64)
    cent = np.stack([np.asarray(r.emb, dtype=np.float64) for r in seed_rows])

    assign_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.LongType()),
        T.StructField("emb", T.ArrayType(T.DoubleType())),
    ])

    def assign_with(cent_arr):
        cn = np.linalg.norm(cent_arr, axis=1, keepdims=True)
        cu = np.where(cn > 0, cent_arr / np.where(cn > 0, cn, 1.0), np.nan)

        def batches(it):
            for pdf in it:
                if len(pdf):
                    pdf = pdf.assign(cell=_np_assign_cells(pdf, cu, cids))
                else:
                    pdf = pdf.assign(cell=pd.Series([], dtype="int64"))
                yield pdf[["vec_id", "cell", "emb"]]

        return e.mapInPandas(batches, assign_schema)

    spark = embeddings.sparkSession
    for _ in range(iters):
        assigned = assign_with(cent)
        # exact decimal means (kmeans_centroids' aggregate, verbatim)
        means = (
            assigned.select("cell", F.posexplode("emb").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(38,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("mvec")
            )
            # K centroid rows (K·D·8 bytes) per iteration — bounded
            # driver memory for the coarse quantizer, not a data pull.
            .collect()
        )
        by_cell = {r.cell: np.asarray(r.mvec, dtype=np.float64) for r in means}
        cent = np.stack(
            [by_cell.get(c, cent[i]) for i, c in enumerate(cids)]
        )

    def cell_verdicts(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "vec_id": pd.Series([], dtype="int64"),
            "cell": pd.Series([], dtype="int64"),
            "max_lower_sim": pd.Series([], dtype="float64"),
            "kept": pd.Series([], dtype="bool"),
        }
        if max_cell is not None:
            cols["cell_capped"] = pd.Series([], dtype="bool")
        if not len(pdf):
            return pd.DataFrame(cols)
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        n = len(ids)
        if max_cell is not None and n > max_cell:
            # hot-cell insurance: the quadratic block is skipped, the
            # verdict is honest about it (kept + flagged, not deduped)
            return pd.DataFrame({
                "vec_id": ids,
                "cell": pdf["cell"].to_numpy(),
                "max_lower_sim": np.full(n, np.nan),
                "kept": np.ones(n, dtype=bool),
                "cell_capped": np.ones(n, dtype=bool),
            })
        m = np.stack(pdf["emb"].to_numpy())
        nrm = np.linalg.norm(m, axis=1)
        # ids ascend with row index: M_i = max over j < i (lower ids).
        # Blocked over `block`-row slabs: slab rows [i0:i1) only ever
        # need columns j < i1, so peak memory is ~block×i1 instead of
        # n². Same divisions, same HALF_UP rounding as the full-matrix
        # form — blockwise max of the identical values.
        B = block
        mls = np.full(n, -np.inf)
        for i0 in range(0, n, B):
            i1 = min(i0 + B, n)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (m[i0:i1] @ m[:i1].T) / np.outer(nrm[i0:i1], nrm[:i1])
            r = np.where(
                np.outer(nrm[i0:i1], nrm[:i1]) > 0,
                _round_half_up6(cos),
                -np.inf,
            )
            low = np.where(
                np.arange(i1)[None, :] < np.arange(i0, i1)[:, None],
                r,
                -np.inf,
            )
            mls[i0:i1] = low.max(axis=1)
        has = mls > -np.inf
        out = pd.DataFrame({
            "vec_id": ids,
            "cell": pdf["cell"].to_numpy(),
            "max_lower_sim": np.where(has, mls, np.nan),
            "kept": ~has | (mls < threshold),
        })
        if max_cell is not None:
            out["cell_capped"] = np.zeros(n, dtype=bool)
        return out

    return assign_with(cent).groupBy("cell").applyInPandas(
        cell_verdicts, out_schema
    )


def _semantic_assign(df: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment of `df`'s valid vectors against the
    (broadcast) centroid frame: (vec_id, cell, emb, nrm), lazily
    localCheckpoint'd for its multiple pair-stage consumers. The same
    rebalance-before-the-compute-bound-cross + map-side max_by shape
    as semantic_dedup's inline assignment."""
    e = valid_embeddings(df).select(
        "vec_id", F.expr(AS_DOUBLE.format(c="embedding")).alias("emb")
    ).withColumn(
        "emb_nrm", F.sqrt(F.expr(DOT.format(a="emb", b="emb")))
    )
    sp = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        _centroid_sim(
            e.repartition(sp).crossJoin(F.broadcast(cent)), "emb"
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cid",
                F.struct(F.col("c_sim"), (-F.col("cid")).alias("nc")),
            ).alias("cell"),
            F.first("emb").alias("emb"),
            F.first("emb_nrm").alias("nrm"),
        )
        .transform(cut_lineage)
    )


def _semantic_side(df: DataFrame, tag: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(f"{tag}_id"),
        F.col("cell").alias(f"{tag}_cell"),
        F.col("emb").alias(f"emb_{tag}"),
        F.col("nrm").alias(f"nrm_{tag}"),
    )


def _semantic_pair_sim():
    dot = F.expr(DOT.format(a="emb_a", b="emb_b"))
    return F.round(
        F.try_divide(dot, F.col("nrm_a") * F.col("nrm_b")), 6
    ) + F.lit(0.0)


def semantic_admission_state(
    embeddings: DataFrame,
    threshold: float = 0.4,
    split_frac: float = 0.9,
    iters: int = 2,
) -> tuple[int, DataFrame, DataFrame]:
    """The FROZEN state a SemDeDup admission pipeline holds: centroids
    trained on the corpus prefix (vec_id < ceil(split_frac·n)) and the
    prefix's surviving representatives. Returns (split, cent, surv)
    where cent = (cid, cvec, cvec_nrm) and surv = (vec_id, cell, emb,
    nrm) — production persists both; new batches are admitted against
    them without ever re-verdicting the stored corpus."""
    import math

    n_all = embeddings.count()
    split = int(math.ceil(split_frac * n_all))
    prefix_raw = embeddings.filter(F.col("vec_id") < F.lit(split))
    n_cells = auto_cells(prefix_raw.count())
    cent = kmeans_centroids(
        prefix_raw, n_cells=n_cells, iters=iters
    ).withColumn("cvec_nrm", F.sqrt(F.expr(DOT.format(a="cvec", b="cvec"))))
    # r13 (guide §5 — lineage): the prefix assignment feeds THREE
    # consumers (pair side a, pair side b, the survivor left join), so
    # without a cut the broadcast-assign subtree executes three times
    # per action; lazy localCheckpoint materializes it once inside the
    # first action (production persists exactly this table as the
    # admission state, so the cut mirrors the deployed shape).
    passign = _semantic_assign(prefix_raw, cent).transform(cut_lineage)
    pmls = (
        _semantic_side(passign, "a")
        .join(
            _semantic_side(passign, "b"),
            (F.col("a_cell") == F.col("b_cell"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select(F.col("b_id").alias("vec_id"), _semantic_pair_sim().alias("s"))
        .groupBy("vec_id")
        .agg(F.max("s").alias("mls"))
    )
    surv = (
        passign.join(pmls, "vec_id", "left")
        .filter(F.coalesce(F.col("mls") < F.lit(threshold), F.lit(True)))
        .select("vec_id", "cell", "emb", "nrm")
    )
    return split, cent, surv


def semantic_admit(
    new_df: DataFrame,
    cent: DataFrame,
    surv: DataFrame,
    threshold: float = 0.4,
    own_batch: bool = True,
) -> DataFrame:
    """Admit `new_df`'s vectors against frozen centroids + stored
    survivors: one verdict row per valid new vector (vec_id, cell,
    max_lower_sim, kept). `own_batch=True` additionally compares each
    new vector to LOWER-ID vectors of its own batch (the batch
    incremental semantics); False restricts comparators to the stored
    survivors — the STREAMING admission shape, whose verdicts depend
    only on the vector and the static state, so bounded streaming ==
    batch under any micro-batch slicing."""
    nassign = _semantic_assign(new_df, cent)
    comparators = _semantic_side(surv, "a")
    if own_batch:
        # survivor ids are all < split <= every new id, so ONE
        # lower-id predicate covers both comparator classes
        comparators = comparators.unionByName(_semantic_side(nassign, "a"))
    nmls = (
        comparators.join(
            _semantic_side(nassign, "b"),
            (F.col("a_cell") == F.col("b_cell"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select(
            F.col("b_id").alias("vec_id"),
            _semantic_pair_sim().alias("s"),
        )
        .groupBy("vec_id")
        .agg(F.max("s").alias("max_lower_sim"))
    )
    return nassign.drop("emb", "nrm").join(nmls, "vec_id", "left").select(
        "vec_id",
        "cell",
        "max_lower_sim",
        F.coalesce(
            F.col("max_lower_sim") < F.lit(threshold), F.lit(True)
        ).alias("kept"),
    )


def semantic_dedup_incremental(
    embeddings: DataFrame,
    threshold: float = 0.4,
    split_frac: float = 0.9,
    iters: int = 2,
) -> DataFrame:
    """Admission-time SemDeDup — the incremental form every other
    dedup family already has (exact / MinHash / substring): the corpus
    PREFIX (vec_id < ceil(split_frac·n), the already-ingested 90%) is
    clustered and deduplicated once, and the NEW batch (the top decile
    by vec_id — the dedup_incremental id-split convention) is admitted
    against it. A new vector b is dropped iff some same-cell
    comparator with a lower vec_id has cosine(a, b) >= threshold,
    where comparators are (a) the prefix's SURVIVORS — production
    stores only kept representatives — and (b) lower-id vectors of the
    new batch itself (own-batch dups are rejected too, the
    dedup_substring_incremental convention).

    Centroids are FROZEN: trained on the prefix only (no retrain per
    batch), so a new vector's cell is a pure broadcast-K assignment.

    Scale (100 TB): steady-state ingest cost is |batch|·K for the
    assignment plus the in-cell pairs touching the BATCH — the prefix
    contributes survivors as comparators, never pair rows among
    themselves (they were verdicted at their own admission); linear in
    the batch, like the substring form's gram-count reuse.

    Cites: Abbas et al. 2023 (SemDeDup) §4 over a growing corpus; the
    reference's admit-new-against-stored dim pattern
    (gmall-realtime RT/app/func/DimSinkFunction.java)."""
    split, cent, surv = semantic_admission_state(
        embeddings, threshold=threshold, split_frac=split_frac, iters=iters
    )
    return semantic_admit(
        embeddings.filter(F.col("vec_id") >= F.lit(split)),
        cent,
        surv,
        threshold=threshold,
        own_batch=True,
    )


def semantic_dedup_resplit(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int | None = None,
    iters: int = 2,
    max_cell: int = 2048,
) -> DataFrame:
    """SemDeDup with hot-cell RE-SPLIT (VERDICT r11 item 3): the
    capped form (`semantic_dedup(max_cell=...)`) honestly forgoes
    dedup inside cells above the cap — their members are flagged
    `cell_capped=TRUE`, routable but not yet routed. This operator
    routes them: members of over-cap cells are re-clustered by a
    SECOND deterministic k-means (auto_cells over the hot
    population, seeds = the k lowest vec_ids of that population —
    the vec_id<K seed rule generalized to a scoped subset) and the
    pairwise verdict runs within (cell, subcell) blocks, recovering
    most of the dup drops the cap forwent at linear cost. Sub-blocks
    STILL above the cap stay flagged — the insurance never silently
    goes quadratic, it just gets a second, finer chance first.

    Output: one verdict row per valid vector —
    (vec_id, cell, subcell, max_lower_sim, kept, cell_capped);
    subcell is NULL for members of small (never-capped) cells, whose
    verdicts are bit-identical to the uncapped `semantic_dedup`.
    kept follows the same lower-id rule, applied within cell for
    small cells and within (cell, subcell) for re-split ones.
    NOTE: re-split verdicts are a superset-recall approximation of
    the uncapped form — two hot-cell members that land in different
    sub-cells are never compared — exactly the recall trade the
    lexical capped twins (max_bucket) already document.

    Scale (100 TB): level-1 cost is `semantic_dedup(max_cell)`'s;
    level-2 adds |hot|·K2 assignment work (broadcast cross, K2 <=
    4096) plus in-block pairs bounded by cap² per block. All cap
    joins broadcast per-cell/per-block counts (<= K resp. <= K·K2
    rows with K, K2 <= 4096 — in practice #hot cells is a handful).
    The level-2 training runs over the checkpointed level-1
    assignment, so the corpus is scanned once.

    Cites: Abbas et al. 2023 (SemDeDup) §3 cluster-then-compare; the
    two-level split mirrors IVF's coarse/fine quantizer split
    (Jégou et al. 2011, Product Quantization, §III.A)."""
    if n_cells is None:
        n_cells = auto_cells(corpus_count_for_auto_bits(embeddings))
    cent = kmeans_centroids(
        embeddings, n_cells=n_cells, iters=iters
    ).withColumn("cvec_nrm", F.sqrt(F.expr(DOT.format(a="cvec", b="cvec"))))
    assigned = _semantic_assign(embeddings, cent)
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_n"))

    # ---- level 1: small cells, verdicts identical to the uncapped form
    small_members = assigned.join(
        F.broadcast(
            counts.filter(F.col("cell_n") <= max_cell).select("cell")
        ),
        "cell",
    )
    mls1 = (
        _semantic_side(small_members, "a")
        .join(
            _semantic_side(small_members, "b"),
            (F.col("a_cell") == F.col("b_cell"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select(F.col("b_id").alias("vec_id"), _semantic_pair_sim().alias("s"))
        .groupBy("vec_id")
        .agg(F.max("s").alias("max_lower_sim"))
    )
    kept = F.coalesce(
        F.col("max_lower_sim") < F.lit(threshold), F.lit(True)
    ).alias("kept")
    lvl1 = small_members.drop("emb", "nrm").join(mls1, "vec_id", "left").select(
        "vec_id",
        "cell",
        F.lit(None).cast("long").alias("subcell"),
        "max_lower_sim",
        kept,
        F.lit(False).alias("cell_capped"),
    )

    # ---- level 2: re-cluster the hot population, verdict in sub-blocks
    hot = assigned.join(
        F.broadcast(
            counts.filter(F.col("cell_n") > max_cell).select("cell")
        ),
        "cell",
    )
    # driver-side count (the corpus_count_for_auto_bits convention):
    # K2 must be a literal for the seed limit; materializes the
    # level-1 checkpoint once, which every later consumer reuses
    n2 = auto_cells(hot.count())
    e2 = hot.select("vec_id", "emb", F.col("nrm").alias("emb_nrm"), "cell")
    # rank seeds: the k2 LOWEST vec_ids of the scoped subset — the
    # vec_id < K rule can't apply (hot members' ids are arbitrary)
    seeds2 = (
        e2.orderBy("vec_id")
        .limit(n2)
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cvec"))
    )
    cent2 = _lloyd_iterate(
        e2.select("vec_id", "emb", "emb_nrm"), seeds2, iters
    ).withColumn("cvec_nrm", F.sqrt(F.expr(DOT.format(a="cvec", b="cvec"))))
    assigned2 = (
        _centroid_sim(e2.crossJoin(F.broadcast(cent2)), "emb")
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cid",
                F.struct(F.col("c_sim"), (-F.col("cid")).alias("nc")),
            ).alias("subcell"),
            F.first("cell").alias("cell"),
            F.first("emb").alias("emb"),
            F.first("emb_nrm").alias("nrm"),
        )
        # one materialization for its four consumers (block counts,
        # both pair sides, verdict join) — the level-1 pattern
        .transform(cut_lineage)
    )
    ct2 = assigned2.groupBy("cell", "subcell").agg(
        F.count(F.lit(1)).alias("sub_n")
    )
    small2 = assigned2.join(
        F.broadcast(
            ct2.filter(F.col("sub_n") <= max_cell).select("cell", "subcell")
        ),
        ["cell", "subcell"],
    )

    def _side2(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col("vec_id").alias(f"{tag}_id"),
            F.col("cell").alias(f"{tag}_cell"),
            F.col("subcell").alias(f"{tag}_sub"),
            F.col("emb").alias(f"emb_{tag}"),
            F.col("nrm").alias(f"nrm_{tag}"),
        )

    mls2 = (
        _side2(small2, "a")
        .join(
            _side2(small2, "b"),
            (F.col("a_cell") == F.col("b_cell"))
            & (F.col("a_sub") == F.col("b_sub"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select(F.col("b_id").alias("vec_id"), _semantic_pair_sim().alias("s"))
        .groupBy("vec_id")
        .agg(F.max("s").alias("max_lower_sim"))
    )
    lvl2 = (
        assigned2.drop("emb", "nrm")
        .join(F.broadcast(ct2), ["cell", "subcell"])
        .join(mls2, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "subcell",
            "max_lower_sim",
            kept,
            (F.col("sub_n") > max_cell).alias("cell_capped"),
        )
    )
    return lvl1.unionByName(lvl2)


def _ranked_topk_batch(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k over (q_id, vec_id, cos_sim) in TWO window
    phases: a (q_id, physical-partition) local top-k first, then the
    global per-q_id rank over <= partitions×k survivors. A single
    PARTITION BY q_id window would shuffle every scored row into only
    |queries| reducers — the skew cliff when Q is small and N is 100
    TB; the local phase keys on (q_id, pid) so the big shuffle spreads
    across Q×P groups and the final exact rank touches a bounded set.
    Local pruning is lossless: each group's local winners are a
    superset of its global top-k. Ordering mirrors the oracle's
    row_number exactly: cos_sim DESC NULLS LAST, vec_id ASC."""
    w_local = Window.partitionBy("q_id", "pid").orderBy(
        F.col("cos_sim").desc_nulls_last(), "vec_id"
    )
    w_global = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc_nulls_last(), "vec_id"
    )
    local = (
        scored.withColumn("pid", F.spark_partition_id())
        .withColumn("lrn", F.row_number().over(w_local))
        .filter(F.col("lrn") <= k)
        .drop("pid", "lrn")
    )
    return (
        local.withColumn("rk", F.row_number().over(w_global))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos_sim", "rk")
    )


def _lowest_queries(assigned_like: DataFrame, n_queries: int) -> DataFrame:
    """The n_queries LOWEST valid vec_ids as the deterministic query
    set (q_id, qe, q_nrm) — the rank rule (row_number over vec_id),
    NOT `vec_id < n` (arbitrary id spaces: the adversarial corpus
    shifts ids past fixed windows)."""
    return (
        assigned_like.orderBy("vec_id")
        .limit(n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb").alias("qe"),
            F.col("nrm").alias("q_nrm"),
        )
    )


def cosine_topk_batch(
    embeddings: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Brute-force multi-query exact top-k — the QUERY-BATCH form of
    `cosine_topk` (a training-data pipeline rarely asks one ANN query:
    retrieval evals, hard-negative mining and kNN audits arrive as
    batches). The query set (the n_queries lowest valid vec_ids)
    broadcasts once and ONE fused pass scans the corpus for all of
    them — Q×N cosines in a single stage instead of Q sequential
    scans, the amortization `tools/measure_ivf_breakeven.py` measures.

    Output: (q_id, vec_id, cos_sim, rk), rk <= k per query, self
    excluded. Scale: the scan is embarrassingly parallel; ranking is
    the two-phase per-query top-k (`_ranked_topk_batch`), never a
    Q-reducer global window."""
    e = valid_embeddings(embeddings).select(
        "vec_id", F.expr(AS_DOUBLE.format(c="embedding")).alias("emb")
    ).withColumn("nrm", F.sqrt(F.expr(DOT.format(a="emb", b="emb"))))
    q = _lowest_queries(e, n_queries)
    cand = e.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("q_id")
    )
    dot = F.expr(DOT.format(a="emb", b="qe"))
    sim = F.round(
        F.try_divide(dot, F.col("nrm") * F.col("q_nrm")), 6
    ) + F.lit(0.0)
    scored = cand.select("q_id", "vec_id", sim.alias("cos_sim"))
    return _ranked_topk_batch(scored, k)


def cosine_topk_ivf_batch(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    nprobe: int = 2,
    n_cells: int | None = None,
    iters: int = 2,
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF multi-query top-k with a REUSABLE index: the train-once /
    probe-many form the single-query `cosine_topk_ivf` can't express
    (it retrains per call — fine for a correctness oracle, wrong
    economics for a served index). Pass `centroids` (cid, cvec) and
    `assigned` (vec_id, cell, emb, nrm) to probe a pre-built index;
    omitted, both are built here (auto_cells-scaled dynamic K — the
    same kmeans chain the SemDeDup oracle transliterated).

    Probe: Q×K centroid ranking picks nprobe cells per query, the
    candidate set is assigned ⋈ query-cells — an EQUI-join on cell
    (at 100 TB `cell` is the table's partition key, so this is
    partition pruning), then the fused cosine kernel + two-phase
    per-query top-k. Per-query cost ~ nprobe·(N/K) candidates vs
    brute's N — the break-even `tools/measure_ivf_breakeven.py`
    records."""
    if centroids is None:
        if n_cells is None:
            n_cells = auto_cells(corpus_count_for_auto_bits(embeddings))
        centroids = kmeans_centroids(embeddings, n_cells=n_cells, iters=iters)
    cent = centroids.withColumn(
        "cvec_nrm", F.sqrt(F.expr(DOT.format(a="cvec", b="cvec")))
    )
    if assigned is None:
        assigned = _semantic_assign(embeddings, cent)
    q = _lowest_queries(assigned, n_queries)
    qsim = _centroid_sim(
        q.withColumnRenamed("qe", "emb")
        .withColumnRenamed("q_nrm", "emb_nrm")
        .crossJoin(F.broadcast(cent)),
        "emb",
    )
    w_probe = Window.partitionBy("q_id").orderBy(
        F.col("c_sim").desc_nulls_last(), "cid"
    )
    qcells = (
        qsim.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "cid")
    )
    cand = (
        assigned.join(
            F.broadcast(qcells), assigned["cell"] == qcells["cid"]
        )
        .join(F.broadcast(q), "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    dot = F.expr(DOT.format(a="emb", b="qe"))
    sim = F.round(
        F.try_divide(dot, F.col("nrm") * F.col("q_nrm")), 6
    ) + F.lit(0.0)
    scored = cand.select("q_id", "vec_id", sim.alias("cos_sim"))
    return _ranked_topk_batch(scored, k)
