"""Cross-engine numeric parity helpers.

Money semantics follow the reference's BigDecimal usage
(RT/bean/OrderInfo.java:21-25, ProductStats BigDecimal adds at
RT/app/dws/ProductStatsApp.java:281-292): aggregate in EXACT decimal,
never float. This is also what makes the DuckDB oracle hash-match:

- `dec_sum`: sum in DECIMAL(28,4) (inputs have ≤4 decimal digits, so
  the cast is exact and the sum is order-independent), round HALF_UP
  (both engines agree on decimals), cast back to double for output.
  Oracle mirror: ``round(sum(CAST(x AS DECIMAL(28,4))), n)::DOUBLE``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MONEY = T.DecimalType(28, 4)


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(MONEY)), scale).cast("double")


def cents_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact money sum in integer cents for NON-NEGATIVE 2dp-valued
    double columns (X9 at scale — the pricing_summary pattern,
    sf10-proven): per-row `(x*100 + 0.5) -> long` is a pure-codegen
    half-up round (identical to the DECIMAL cast for non-negative
    inputs whose values carry <= 2 decimal digits — representation
    error ~1e-9 cents, nowhere near the .5 boundary). Each cents
    value is then cast to DECIMAL(18,0) BEFORE the sum, so Spark
    accumulates in a DECIMAL(28,0) buffer (long-backed compact form
    until a value actually exceeds 18 digits) — the total is exact
    to 1e28 cents and over-limit groups raise under ANSI instead of
    wrapping. ~2x cheaper than dec_sum's three-allocation per-row
    BigDecimal path; semantics are bit-identical on every oracle-gated
    money column (verified hash-green at sf0.001-sf10 on
    pricing_summary/product_stats).

    PRECONDITION (caller-enforced): non-negative values with <= 2
    decimal digits. Negative inputs would round half-DOWN (the long
    cast truncates toward zero) and >2dp inputs are quantized to
    cents. Use dec_sum for signed or >2dp inputs. Set
    SPARK_GRAFT_DEBUG_ASSERTS=1 to inject a per-row raise_error check
    of both preconditions (debug only — it adds a branch + a 2dp
    re-round per row to an otherwise pure-codegen path).
    """
    import os as _os

    c = F.col(col) if isinstance(col, str) else col
    if _os.environ.get("SPARK_GRAFT_DEBUG_ASSERTS") == "1":
        # isnan/inf explicitly: NaN evades BOTH other predicates
        # (Spark's NaN ordering makes NaN < 0 false, and its SQL
        # equality treats NaN = NaN as true so round(NaN,2) != NaN is
        # false too) — yet (NaN*100+0.5) cast long is silently 0.
        # Money columns are finite BY CONTRACT (free-form measures are
        # quarantined at the scan instead — catalog.load); the debug
        # assert is where a contract breach surfaces loudly.
        bad = (
            (c < 0)
            | (F.round(c, 2) != c)
            | F.isnan(c)
            | (F.abs(c) == F.lit(float("inf")))
        )
        c = F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("cents_sum precondition violated "
                          "(negative or >2dp value): "),
                    c.cast("string"),
                )
            ).cast("double"),
        ).otherwise(c)
    c2 = (c * 100 + F.lit(0.5)).cast("long").cast("decimal(18,0)")
    return F.round(F.sum(c2) / 100, scale).cast("double")


def dec_round(col: Column | str, scale: int = 2) -> Column:
    """Row-level exact-decimal rounding of a ≤4dp double expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast(MONEY), scale).cast("double")


def snake_to_camel(name: str) -> str:
    """X8: snake_case -> camelCase column rename (the Guava CaseFormat
    conversion in the reference's MySQLUtil.java:63-66)."""
    head, *rest = name.split("_")
    return head + "".join(w.capitalize() for w in rest)


def rename_snake_to_camel(df):
    """Rename every column of `df` snake_case -> camelCase."""
    return df.toDF(*[snake_to_camel(c) for c in df.columns])
