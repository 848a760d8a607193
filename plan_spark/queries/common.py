"""Shared expression helpers for oracle-exact aggregation.

The driver's correctness gate hashes values order-insensitively, so every
aggregate must be *bit-identical* between the Spark plan and the DuckDB
oracle regardless of shuffle/evaluation order. Discipline:

- Money columns (stored as DOUBLE in the fixtures) are cast to
  DECIMAL(18,2) before any arithmetic: double->decimal(2) is deterministic
  rounding of an exact binary value, identical in both engines, and decimal
  sums are associative — partition order can never change the result.
  (The reference keeps all money in DECIMAL(15,2) end-to-end,
  /root/reference/cases/tpch/query/ddl.sql.)
- Derived products keep enough precision that no intermediate rounding ever
  occurs (scales add, precision stays <= 38).
- Ratios/averages are DOUBLE computed from exact decimal sums with the same
  expression shape on both sides; IEEE ops on identical inputs are
  deterministic.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: str) -> Column:
    """Exact money: DOUBLE column -> DECIMAL(18,2)."""
    return F.col(col).cast(DEC)


def dlit(s: str) -> Column:
    """Exact decimal literal."""
    return F.lit(Decimal(s))


def ts(s: str) -> Column:
    """Timestamp literal (fixture date columns are TIMESTAMP)."""
    return F.lit(s).cast("timestamp")


def verbatim_text(qfile: str, embedded: str) -> str:
    """Pin a verbatim spec text to its EMBEDDED copy.

    The DuckDB oracle of every verbatim driver row is written against the
    embedded text, so the embedded text is ALWAYS what runs. The
    reference's own ``.sql`` file, when present, is only a cross-check:
    a whitespace-normalized mismatch raises loudly instead of silently
    feeding unpinned external SQL through the front door while the oracle
    answers a different query (r10 advice)."""
    import os as _o
    import re as _re

    if _o.path.exists(qfile):
        ref = open(qfile).read()
        if _re.sub(r"\s+", " ", ref).strip() != _re.sub(
            r"\s+", " ", embedded
        ).strip():
            raise ValueError(
                f"reference spec file {qfile} diverged from the embedded "
                "verbatim copy this row's oracle is pinned to — refusing "
                "to run unpinned external SQL"
            )
    return embedded


def one_minus_disc() -> Column:
    """(1 - l_discount) as DECIMAL(8,2) — exact, no rounding."""
    return (F.lit(1) - dec("l_discount")).cast("decimal(8,2)")


def one_plus_tax() -> Column:
    """(1 + l_tax) as DECIMAL(8,2) — exact."""
    return (F.lit(1) + dec("l_tax")).cast("decimal(8,2)")


def rev_col() -> Column:
    """Per-row revenue l_extendedprice*(1-l_discount): DECIMAL(27,4), exact."""
    return dec("l_extendedprice") * one_minus_disc()


def rev_tenthc() -> Column:
    """Per-row revenue in exact 1e-4-dollar integer units: rev_col() carries
    exactly 4 decimals, so *10000 is integral and the long cast never
    rounds. SQL mirror: CAST(REV_SQL * 10000 AS BIGINT)."""
    return (rev_col() * 10000).cast("long")


def sum_rev(alias: str = "revenue") -> Column:
    """SUM(revenue): exact decimal sum (order-independent), emitted as DOUBLE.

    Output columns are DOUBLE rather than DECIMAL so both engines and every
    pandas/Arrow conversion agree on the physical type; the decimal->double
    cast of an identical exact value is deterministic IEEE rounding.
    """
    return F.sum(rev_col()).cast("double").alias(alias)


def avg_dbl(x: Column, alias: str) -> Column:
    """AVG as DOUBLE = CAST(SUM(decimal) AS DOUBLE) / COUNT(*) — deterministic."""
    return (F.sum(x).cast("double") / F.count(F.lit(1))).alias(alias)


def cents(col: str) -> Column:
    """Exact integer money: DOUBLE -> DECIMAL(18,2) -> hundredths as BIGINT.

    Same per-row value as ``dec(col) * 100`` (the decimal cast does the
    rounding; x100 and the long cast are exact), but downstream arithmetic
    and accumulation run on primitive longs — measurably faster than wide
    decimal accumulators in the single-pass aggregate hot path. Long sums
    can overflow at full-table cardinality, so cents aggregation must go
    through a two-phase sum: long partials per shuffle partition (bounded:
    <= ~1e10/row x ~1e8 rows/partition << 2^63), decimal final over the
    tiny partial set. See q1 for the pattern.
    """
    return (F.col(col).cast(DEC) * 100).cast("long")


# --- matching DuckDB SQL fragments (identical math, identical aliases) ---

DEC_SQL = "DECIMAL(18,2)"
REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(8,2))"
)
SUM_REV_SQL = f"CAST(SUM({REV_SQL}) AS DOUBLE)"


def avg_dbl_sql(inner: str, alias: str) -> str:
    return f"CAST(SUM({inner}) AS DOUBLE) / COUNT(*) AS {alias}"
