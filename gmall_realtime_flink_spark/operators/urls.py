"""URL canonicalization + domain-grain curation (beyond-reference:
the RefinedWeb/C4-style step between exact dedup and corpus mixing).

Everything is JVM-side string/regex expressions — no Python in the
hot path, no UDFs. The registered-domain extraction is the two-label
suffix (a public-suffix list lookup is the production swap point; the
Spark plumbing — canonical key, per-domain window — is identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DOMAIN_BUDGET_DEFAULT = 15


def canonical_url_parts(url: Column) -> dict[str, Column]:
    """Decompose + canonicalize a URL with pure regex expressions:
    lowercase scheme and host, strip a leading ``www.``, drop the
    fragment, drop ``utm_*`` tracking params, sort the remaining
    query params. Returns {canonical_url, domain} columns."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"://([^/?#]+)", 1))
    host_nw = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(url, r"://[^/?#]+([^?#]*)", 1)
    # anchor: the ? must precede any # — a ? inside the fragment is
    # fragment content (RFC 3986), not a query
    query = F.regexp_extract(url, r"^[^#]*\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.startswith("utm_"),
        )
    )
    canon_q = F.array_join(params, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host_nw,
        path,
        F.when(F.length(canon_q) > 0, F.concat(F.lit("?"), canon_q)).otherwise(
            F.lit("")
        ),
    )
    domain = F.regexp_extract(host_nw, r"([^.]+\.[^.]+)$", 1)
    return {"canonical_url": canonical, "domain": domain}


def domain_budget(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    budget: int = DOMAIN_BUDGET_DEFAULT,
) -> DataFrame:
    """URL-grain dedup + per-domain budget cap, the crawl-curation
    combo: (1) canonicalize every URL; (2) keep one doc per canonical
    URL (lowest id — refetches of the same page differ only in
    tracking params / casing / fragments, which canonicalization
    collapses); (3) cap each registered domain at ``budget`` docs
    (lowest ids win — deterministic), so boilerplate-heavy domains
    can't dominate the training mix.

    Plan: one window pass over (domain, is_canonical) after a
    min-over-url window — two shuffles total, both keyed by
    canonical strings (uniform unless one domain truly dominates the
    crawl; mega-domain skew is AQE territory, or pre-aggregate counts
    per domain and broadcast the cut). Output is a doc-grain audit
    table: every input doc gets a verdict.
    """
    parts = canonical_url_parts(F.col(url_col))
    canon = docs.select(
        F.col(id_col),
        parts["canonical_url"].alias("canonical_url"),
        parts["domain"].alias("domain"),
    )
    w_url = Window.partitionBy("canonical_url")
    flagged = canon.withColumn(
        "is_canonical", F.col(id_col) == F.min(id_col).over(w_url)
    )
    w_dom = Window.partitionBy("domain", "is_canonical").orderBy(id_col)
    ranked = flagged.withColumn(
        "domain_rank",
        # 0 (not NULL) for URL-dup rows: NULL ints go float64 in both
        # engines' pandas bridges and stringify differently
        F.when(F.col("is_canonical"), F.row_number().over(w_dom)).otherwise(
            F.lit(0)
        ),
    )
    return ranked.select(
        F.col(id_col),
        "canonical_url",
        "domain",
        "is_canonical",
        "domain_rank",
        (F.col("is_canonical") & (F.col("domain_rank") <= budget)).alias(
            "kept"
        ),
    )
