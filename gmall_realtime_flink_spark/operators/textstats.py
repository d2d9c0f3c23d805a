"""Text-analysis operators (beyond-reference): SimHash fingerprinting,
n-gram-heuristic language ID, and document quality scoring.

All are single-pass JVM-side expressions (plus one shuffle for the
SimHash bit sums); no Python in the hot path. Every float output is
rounded for DuckDB-oracle parity; SimHash bit values derive from md5
hex digits so both engines compute identical fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.operators.dedup import tokenize

SIMHASH_BITS = 16

# small fixed stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "ist", "das", "nicht", "mit", "ein", "auf", "sie"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "pour", "une"],
    "es": ["el", "los", "las", "y", "es", "una", "por", "para", "con", "como"],
}
CJK_PATTERN = "[一-鿿]"


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash fingerprint: for each bit b, sum +1/-1 token votes taken
    from bit b of md5(token); fingerprint bit = 1 iff the sum > 0.

    One explode + one hash shuffle on doc id — the explode output is
    |tokens| rows but each row is (id, `bits` small ints) wide only
    after partial aggregation, so shuffled volume is |docs| rows.

    `bits` <= 60: votes come from md5 hex digits (128 available bits)
    and the fingerprint must fit a signed BIGINT with headroom for the
    sum-of-terms construction. 16 bits saturates past ~100k docs
    (pigeonhole forces >= C(n,2)/2^16 identical-fingerprint pairs);
    48 is the at-scale posture (dedup_simhash_hamming_wide).
    """
    if not 1 <= bits <= 60:
        raise ValueError(f"bits must be in [1, 60], got {bits}")
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok")
    ).withColumn("m", F.md5("tok"))
    sums = []
    for b in range(bits):
        digit, bit = b // 4, b % 4
        nibble = F.conv(F.substring("m", digit + 1, 1), 16, 10).cast("int")
        vote = F.when(
            F.shiftright(nibble, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)
        sums.append(F.sum(vote).alias(f"s{b}"))
    agg = toks.groupBy(id_col).agg(*sums)
    fp: Column = F.lit(0)
    for b in range(bits):
        fp = fp + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return agg.select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def simhash_near_pairs(
    fps: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = SIMHASH_BITS,
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup candidate pairs WITHOUT all-pairs: split each
    fingerprint into `bands` contiguous bit bands; two fingerprints at
    hamming distance <= bands-1 must agree on at least one whole band
    (pigeonhole), so candidates come from a self-equi-join on
    (band_index, band_value) — one shuffle keyed by band bits, output
    |colliding pairs| — then the exact hamming filter
    bit_count(a ^ b) <= max_hamming runs on candidates only (the same
    band-then-verify shape as MinHash-LSH, ops/dedup.py).

    Requires max_hamming <= bands - 1 for the pigeonhole guarantee.

    `max_bucket` is the production guard against degenerate corpora —
    the same cap as `lsh_candidates` (ops/dedup.py): a band bucket of
    k fingerprints emits k(k-1)/2 join rows, so pair volume is
    quadratic in bucket size. Fingerprint ENTROPY comes from token
    content: the synthetic 31-word corpus collapses 5M docs onto few
    distinct fingerprints, and the uncapped band join spilled >50 GB
    of shuffle at sf100 (signature pass itself: 46 s / 0.3 GB — the
    docstring's |docs|-rows claim held; the JOIN OUTPUT is what
    explodes). Hot buckets at that density are near-identical
    boilerplate, not pairs worth emitting; buckets larger than
    `max_bucket` are dropped before the join, reusing the banding
    exchange (no extra shuffle). None (default) keeps oracle-exact
    behavior.
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"pigeonhole needs max_hamming <= bands-1, got "
            f"{max_hamming} > {bands - 1}"
        )
    if bits % bands != 0:
        raise ValueError(
            f"bands must cover the fingerprint exactly (pigeonhole), "
            f"got bits={bits} % bands={bands} != 0"
        )
    width = bits // bands
    mask = (1 << width) - 1
    banded = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .cast("long")
                    for i in range(bands)
                ]
            )
        ).alias("band", "bv"),
    )
    banded = banded.repartition("band", "bv")
    if max_bucket is not None:
        small = (
            banded.groupBy("band", "bv")
            .count()
            .filter(F.col("count") <= max_bucket)
            .drop("count")
        )
        banded = banded.join(small, ["band", "bv"])
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sh_a"),
        "band",
        "bv",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
        "band",
        "bv",
    )
    pairs = (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# PII scrub patterns — portable between Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround
EMAIL_PAT = r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}"
PHONE_PAT = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,}"


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrub (the redaction pass of a training-data pipeline):
    replace emails/phone numbers with typed placeholders, emit per-doc
    match counts and the fingerprint of the redacted text. Pure
    JVM-side regex — order matters (emails first, so the phone pass
    can't eat an address digit run).
    """
    text = F.lower(F.col(text_col))
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_PAT), 0))
    after_email = F.regexp_replace(text, EMAIL_PAT, "<EMAIL>")
    n_phones = F.size(
        F.regexp_extract_all(after_email, F.lit(PHONE_PAT), 0)
    )
    redacted = F.regexp_replace(after_email, PHONE_PAT, "<PHONE>")
    return docs.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


def _score(toks: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), words))


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Language ID: CJK-script check, else stopword-overlap argmax
    (fixed en→de→fr→es tie order)."""
    toks = tokenize(F.col(text_col))
    scores = {lang: _score(toks, lang) for lang in STOPWORDS}
    mx = F.greatest(*scores.values())
    pred = (
        F.when(F.col(text_col).rlike(CJK_PATTERN), "zh")
        .when(scores["en"] == mx, "en")
        .when(scores["de"] == mx, "de")
        .when(scores["fr"] == mx, "fr")
        .otherwise("es")
    )
    return docs.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        mx.alias("stopword_hits"),
    )


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality metrics + composite score (all rounded)."""
    text = F.col(text_col)
    toks = tokenize(text)
    n_tokens = F.size(toks)
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ct = F.size(
        F.filter(toks, lambda t: F.array_contains(en, t))
    )
    punct_ct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    digit_ct = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    # try_divide: an empty document (0 tokens / 0 chars) has undefined
    # ratios -> NULL, matching DuckDB's NULL-on-/0; a plain `/` is an
    # ANSI ArithmeticException. The composite score goes NULL with
    # them (NULL arithmetic propagates identically in both engines).
    stop_ratio = F.round(F.try_divide(stop_ct, n_tokens), 6)
    punct_ratio = F.round(F.try_divide(punct_ct, F.length(text)), 6)
    digit_ratio = F.round(F.try_divide(digit_ct, F.length(text)), 6)
    score = F.round(
        0.4 * stop_ratio
        + 0.3 * (F.least(n_tokens, F.lit(100)) / 100.0)
        + 0.3 * (1.0 - punct_ratio),
        6,
    )
    return docs.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality_score"),
    )


def bpe_train_merges(words: DataFrame, n_merges: int = 5) -> DataFrame:
    """Iterative BPE merge training (Sennrich et al. 2016, the
    `learn_bpe` loop; reference analogue: the tokenizer-prep surface
    behind RT/utils/KeywordUtil.java's segmentation, generalized to
    subword training). `words` is the DISTINCT-WORD frequency table
    (columns `w`, `f`) — the classic scaling trick: the corpus
    collapses to the vocabulary once, and every training iteration is
    O(vocabulary), so a 100 TB corpus with a 1M-word vocab pays the
    same per-merge cost as a 1 GB one.

    Each iteration: (1) adjacent-symbol pair counts weighted by word
    frequency (vocab-sized groupBy, map-side combined); (2) argmax
    pair with the deterministic (count DESC, pair ASC) tie-break —
    ONE row collected to the driver per iteration, bounded by
    construction; (3) greedy left-to-right re-segmentation of every
    word via a JVM-side `aggregate` fold over the symbol array — a
    narrow projection, no shuffle, and overlap-correct (a run of k
    identical symbols merges floor(k/2) pairs, like the reference
    implementation's non-overlapping regex scan).

    Returns the learned merge table: (step, lhs, rhs, merged,
    pair_count) — n_merges rows (fewer if the vocabulary runs out of
    adjacent pairs first).
    """
    return _bpe_learn(words, n_merges)[0]


def _bpe_learn(
    words: DataFrame, n_merges: int
) -> "tuple[DataFrame, DataFrame]":
    """Shared BPE loop: returns (merge table, final segmentation
    (w, f, syms)) — bpe_train_merges keeps the rules,
    bpe_segment_words keeps the applied tokenizer output."""
    from pyspark.sql import types as T

    spark = words.sparkSession
    out_schema = T.StructType([
        T.StructField("step", T.IntegerType()),
        T.StructField("lhs", T.StringType()),
        T.StructField("rhs", T.StringType()),
        T.StructField("merged", T.StringType()),
        T.StructField("pair_count", T.LongType()),
    ])

    # Materialize the vocab table once so the corpus-scale word count
    # is not recomputed by every iteration's argmax action (at 100 TB
    # this would be a staging table write; localCheckpoint is the
    # single-JVM analogue). The vocab table is small by construction.
    seg = words.select(
        "w", "f", F.split(F.col("w"), "").alias("syms")
    ).localCheckpoint(eager=False)

    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        pair_counts = (
            seg.filter(F.size("syms") >= 2)
            .select(
                "f",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS pa, syms[i] AS pb))"
                    )
                ).alias("p"),
            )
            .groupBy("p.pa", "p.pb")
            .agg(F.sum("f").alias("c"))
        )
        # argmax: ONE row to the driver (bounded — not a data collect)
        best = (
            pair_counts.orderBy(F.desc("c"), F.asc("pa"), F.asc("pb"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0].pa, best[0].pb, best[0].c
        merges.append((step, a, b, a + b, int(c)))
        # greedy left-to-right merge: fold the symbol array; a just-
        # merged token (a||b) can never equal `a`, so the fold never
        # re-merges its own output within one step — exactly the
        # reference scan that restarts AFTER a consumed pair
        merged_syms = F.aggregate(
            F.col("syms"),
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(a + b)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        # checkpoint each level: keeps the fold chain shallow and the
        # per-iteration cost O(vocab), independent of the step number
        seg = seg.withColumn("syms", merged_syms).localCheckpoint(
            eager=False
        )

    return spark.createDataFrame(merges, out_schema), seg


MODEL_DIM = 64
MODEL_THRESHOLD_MICRO = 500_000  # keep iff mean hashed-bucket weight > 0.5


def frozen_model_weights(dim: int = MODEL_DIM) -> list[int]:
    """Deterministic stand-in for TRAINED classifier weights (micro
    units, 0..1e6): a fixed LCG so both engines and every session see
    the same parameter vector. In production these are the learned
    weights of a fastText-style quality model, shipped to executors
    as a broadcast; freezing them keeps the operator DuckDB-oracle-
    able (the Spark plumbing — hashing trick, broadcast lookup,
    integer-exact mean — is what is under test, not the training)."""
    w, x = [], 1234567
    for _ in range(dim):
        x = (1103515245 * x + 12345) % (1 << 31)
        w.append(x % 1_000_001)
    return w


def quality_model_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = MODEL_DIM,
    threshold_micro: int = MODEL_THRESHOLD_MICRO,
) -> DataFrame:
    """Classifier-based quality filtering (the model-inference step a
    real curation pipeline runs between heuristics and training —
    fastText-style): hash every token into `dim` buckets (hashing
    trick, md5 so both engines agree), look up the frozen linear
    weight per bucket, and score each document by the integer
    HALF-UP mean weight — a linear model over hashed bag-of-words
    features, monotone in the logistic probability (the sigmoid is
    omitted so the score stays cross-engine integer-exact; the keep
    threshold is equivalent either side of the monotone map).

    Plan: one explode + one hash shuffle on doc id with map-side
    partial aggregation (shuffled volume is |docs| rows); the weight
    vector is a plan literal — the broadcast-variable analogue. No
    Python in the hot path. 0-token documents have no score (no
    feature evidence) and drop out, same as the oracle's unnest."""
    weights = frozen_model_weights(dim)
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok")
    ).withColumn("m", F.md5("tok"))
    h1 = F.conv(F.substring("m", 1, 1), 16, 10).cast("int")
    h2 = F.conv(F.substring("m", 2, 1), 16, 10).cast("int")
    bucket = (h1 * 16 + h2) % dim  # 256 % dim == 0 -> uniform
    warr = F.array(*[F.lit(v) for v in weights])
    scored = toks.select(
        F.col(id_col),
        F.element_at(warr, bucket + 1).cast("long").alias("wv"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("wv").alias("s"),
    )
    micro = F.expr("(2 * s + n_tokens) DIV (2 * n_tokens)")
    return agg.select(
        F.col(id_col),
        F.col("n_tokens"),
        (micro.cast("double") / F.lit(1_000_000.0)).alias("model_score"),
        (micro > F.lit(threshold_micro)).alias("keep"),
    )


def bpe_segment_words(words: DataFrame, n_merges: int = 5) -> DataFrame:
    """Apply BPE training end-to-end and return the SEGMENTED
    vocabulary: the same argmax/re-segment loop as bpe_train_merges,
    but the product is the final (w, f, syms) table — the tokenizer
    a trained merge list defines, applied to the corpus it was
    trained on. Same scaling shape: everything after the one corpus
    shuffle is O(vocabulary)."""
    return _bpe_learn(words, n_merges)[1]
